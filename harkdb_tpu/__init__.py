"""hark-tpu: a TPU-native vectorized SQL query-execution engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of philass/HarkDB
(reference: a Futhark-based GPU SQL engine, see /root/reference). This is not a
port — only the observable contract is kept:

  * BlazingSQL-style Context API (``create_table`` / ``drop_table`` / ``sql``),
    mirroring reference ``FutharkContext.py:38-71``.
  * The full advertised SQL surface (reference ``README.md:8-15``): SELECT,
    FROM, WHERE, GROUP BY (sum/prod/max/min), HAVING, ORDER BY (SORT BY), JOIN —
    including the pieces the reference only sketches (WHERE is commented out at
    ``select.fut:18``; JOIN is never exported by ``main.fut``).
  * Output semantics: group-by results one row per distinct key, ascending key
    order (reference ``groupby.fut:21-22`` radix-sort consequence), projection
    preserving row order and duplicate columns (``select.fut:17-20``).

Underneath, everything is re-architected TPU-first around measured v5e cost
ratios (sorting is ~20x cheaper per byte than random gather/scatter — see
CLAUDE.md/BASELINE.md): resident columnar device arrays, static-shape padded
batches with valid counts, payload-carrying sorts for all data movement,
batched segment reductions, Pallas/MXU kernels where they beat XLA (one-hot
matmul aggregation for dense keys, streaming compaction for WHERE), and
multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` with all-to-all
repartitioning and skew-salted shuffles.
"""

from harkdb_tpu.config import EngineConfig
from harkdb_tpu.columnar.table import Table
from harkdb_tpu.api import Context

# BlazingSQL/HarkDB-compatible alias (reference FutharkContext.py:38).
FutharkContext = Context

__version__ = "0.1.0"

__all__ = ["Context", "FutharkContext", "Table", "EngineConfig", "__version__"]
