"""Engine configuration.

The reference has no config surface at all (no CLI, no env vars — SURVEY §5;
its only knob is the Futhark compile target hardcoded in ``setup.sh:12``).
Here a small dataclass carries every tunable: dtype policy, capacity bucketing
for static-shape outputs, kernel tile sizes, mesh shape, and skew handling.
Env-var overrides (``HARKDB_*``) exist for benchmark sweeps.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


def _env(name: str, cast, default):
    raw = os.environ.get(f"HARKDB_{name}")
    if raw is None:
        return default
    if cast is bool:
        return raw.lower() in ("1", "true", "yes", "on")
    return cast(raw)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """All engine tunables. Immutable; pass a replaced copy to change."""

    # ---- dtype policy -------------------------------------------------------
    # Reference kernels use i32 for select (select.fut:23) and u32 for groupby
    # (groupby.fut:51); we normalize to int32 + float32 with explicit casts.
    int_dtype: str = "int32"
    float_dtype: str = "float32"

    # ---- static-shape management -------------------------------------------
    # Row counts are padded up to a multiple of `row_align` so blocks tile
    # cleanly onto (8,128) VPU lanes. Data-dependent output sizes (join) are
    # bucketed to powers of two to bound the jit cache.
    row_align: int = 1024
    # Initial join output capacity = expansion_factor * max(|L|, |R|), grown by
    # doubling on overflow (exact size known from the count phase).
    join_expansion_factor: float = 1.0

    # ---- kernel tuning ------------------------------------------------------
    # Pallas block sizes (rows per grid step) for streaming kernels.
    filter_block_rows: int = 8 * 1024
    sort_bits_per_pass: int = 8          # multi-bit radix passes (vs ref's 1, groupby.fut:22)
    agg_table_slots: int = 8 * 1024      # VMEM hash-aggregate table slots per block
    join_table_slots: int = 16 * 1024    # VMEM hash-join build table slots
    use_pallas: bool = True              # fall back to pure-XLA ops when False

    # ---- distribution -------------------------------------------------------
    # Mesh axis name for data (row) partitioning; single axis "shards".
    mesh_axis: str = "shards"
    # Number of devices to use; None = all visible devices.
    num_shards: Optional[int] = None
    # Skew handling: keys holding more than `skew_threshold` fraction of a
    # sampled partition trigger salted repartitioning with `skew_salt` splits.
    skew_threshold: float = 0.25
    skew_salt: int = 8
    # Salted repartitioning for distributed joins (parallel/skew.py).
    skew_salted_join: bool = True

    # ---- observability / safety ---------------------------------------------
    collect_metrics: bool = True
    log_level: str = "WARNING"
    # Validate engine invariants (ColumnBatch capacity/n_valid) at operator
    # boundaries — jax.debug callbacks inside jit (utils/checks.py).
    debug_checks: bool = False
    # Re-execute a query once from resident tables on a transient device
    # failure (queries are pure — SURVEY §5 failure-detection slot).
    retry_on_failure: bool = True

    @staticmethod
    def from_env() -> "EngineConfig":
        base = EngineConfig()
        return dataclasses.replace(
            base,
            int_dtype=_env("INT_DTYPE", str, base.int_dtype),
            float_dtype=_env("FLOAT_DTYPE", str, base.float_dtype),
            row_align=_env("ROW_ALIGN", int, base.row_align),
            filter_block_rows=_env("FILTER_BLOCK_ROWS", int, base.filter_block_rows),
            sort_bits_per_pass=_env("SORT_BITS", int, base.sort_bits_per_pass),
            use_pallas=_env("USE_PALLAS", bool, base.use_pallas),
            num_shards=_env("NUM_SHARDS", int, base.num_shards),
            log_level=_env("LOG_LEVEL", str, base.log_level),
        )

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = EngineConfig.from_env()
