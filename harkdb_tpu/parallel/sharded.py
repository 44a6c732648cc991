"""ShardedBatch — the distributed analog of ColumnBatch.

A set of named 1-D columns of global shape ``(D * C,)`` sharded row-wise over
the mesh (each device holds a contiguous ``C``-row block) plus per-shard valid
counts ``shard_counts`` of shape ``(D,)`` (sharded likewise, so each device
sees its own count as a length-1 block under ``shard_map``).

Global row order convention: live rows of shard i are rows
``[i*C, i*C + counts[i])``; concatenating shards in order yields the table's
original row order (ingest splits rows into balanced contiguous chunks). This
is what lets distributed WHERE preserve the reference's row-order semantics
(SURVEY §3.3) without any cross-shard exchange.

This replaces the "analog of sequence parallelism" slot in SURVEY §5: the
long dimension (rows) is partitioned so no host materializes a full table.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from harkdb_tpu.columnar.batch import ColumnBatch, align_capacity
from harkdb_tpu.config import EngineConfig, DEFAULT_CONFIG


@jax.tree_util.register_pytree_node_class
class ShardedBatch:
    def __init__(self, columns: Dict[str, jax.Array], shard_counts: jax.Array):
        self.columns = dict(columns)
        self.shard_counts = shard_counts

    def tree_flatten(self):
        names = tuple(self.columns.keys())
        children = tuple(self.columns[n] for n in names) + (self.shard_counts,)
        return children, names

    @classmethod
    def tree_unflatten(cls, names, children):
        *cols, counts = children
        return cls(dict(zip(names, cols)), counts)

    @property
    def n_shards(self) -> int:
        return self.shard_counts.shape[0]

    @property
    def global_capacity(self) -> int:
        return next(iter(self.columns.values())).shape[0]

    @property
    def local_capacity(self) -> int:
        return self.global_capacity // self.n_shards

    @property
    def names(self) -> List[str]:
        return list(self.columns.keys())

    def total_rows(self) -> jax.Array:
        return jnp.sum(self.shard_counts).astype(jnp.int32)

    def to_batch_device(self, mesh, axis: str) -> ColumnBatch:
        """Gather to a packed (replicated) ColumnBatch entirely on device:
        one all_gather per column + one payload-carrying-sort compaction of
        the inter-shard gaps — no host sync or per-shard python loop.
        Preserves shard order (= original row order)."""
        import jax
        from jax.sharding import PartitionSpec as P

        D, C = self.n_shards, self.local_capacity
        names = self.names

        def body(cols, counts):
            g = {
                n: jax.lax.all_gather(c, axis, axis=0, tiled=True)
                for n, c in cols.items()
            }
            gc = jax.lax.all_gather(counts, axis, axis=0, tiled=True)
            idx = jnp.arange(D * C, dtype=jnp.int32)
            live = (idx % C) < gc[idx // C]
            total = jnp.sum(live).astype(jnp.int32)
            dropped = jnp.logical_not(live).astype(jnp.int32)
            out = jax.lax.sort(
                [dropped] + [g[n] for n in names], num_keys=1, is_stable=True
            )
            packed = {
                n: jnp.where(idx < total, col, 0)
                for n, col in zip(names, out[1:])
            }
            return packed, total.reshape(1)

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=({n: P(axis) for n in names}, P(axis)),
            out_specs=({n: P() for n in names}, P()),
            check_vma=False,
        ))
        cols, total = f(self.columns, self.shard_counts)
        return ColumnBatch(cols, total[0])

    def to_batch(self) -> ColumnBatch:
        """Gather to a single packed ColumnBatch (host-driven compaction of
        the inter-shard gaps; preserves shard order = original row order)."""
        D, C = self.n_shards, self.local_capacity
        counts = np.asarray(self.shard_counts)
        keep = np.zeros(D * C, dtype=bool)
        for i in range(D):
            keep[i * C: i * C + int(counts[i])] = True
        n = int(keep.sum())
        cap = align_capacity(n, C) if n else C
        cols = {}
        for name, col in self.columns.items():
            host = np.asarray(col)[keep]
            if cap > n:
                host = np.concatenate(
                    [host, np.zeros(cap - n, dtype=host.dtype)]
                )
            cols[name] = jnp.asarray(host)
        return ColumnBatch(cols, jnp.int32(n))


def shard_batch(
    host_cols: Dict[str, np.ndarray],
    n_rows: int,
    mesh: Mesh,
    config: EngineConfig = DEFAULT_CONFIG,
    min_local_capacity: Optional[int] = None,
) -> ShardedBatch:
    """Split host columns into D balanced contiguous row chunks, pad each to a
    common local capacity, and place on the mesh."""
    D = mesh.devices.size
    per = -(-n_rows // D) if n_rows else 0           # ceil
    local_align = max(config.row_align // D, 128)
    C = align_capacity(per, local_align)
    if min_local_capacity:
        C = max(C, min_local_capacity)
    counts = np.clip(n_rows - per * np.arange(D), 0, per).astype(np.int32)
    sharding = NamedSharding(mesh, P(config.mesh_axis))

    def _put(buf: np.ndarray):
        # Multi-process meshes: every process holds the same global host
        # buffer; make_array_from_callback places only the locally
        # addressable shards (device_put to a non-addressable sharding is
        # version-dependent).
        if jax.process_count() > 1:
            return jax.make_array_from_callback(
                buf.shape, sharding, lambda idx: buf[idx]
            )
        return jax.device_put(buf, sharding)

    cols = {}
    for name, a in host_cols.items():
        a = np.asarray(a)[:n_rows]
        buf = np.zeros((D * C,), dtype=a.dtype)
        for i in range(D):
            c = int(counts[i])
            buf[i * C: i * C + c] = a[i * per: i * per + c]
        cols[name] = _put(buf)
    shard_counts = _put(counts)
    return ShardedBatch(cols, shard_counts)
