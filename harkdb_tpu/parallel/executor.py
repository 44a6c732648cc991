"""Distributed query execution over a device mesh.

Drives a planned query (``harkdb_tpu.plan.planner.QueryPlan``) across
row-sharded tables: joins and group-bys run under ``shard_map`` with
all-to-all shuffles (``dist_ops``); the small post-aggregation tail (HAVING /
projection / ORDER BY / LIMIT) runs on the gathered result via the plan's own
``run_tail`` — one code path for semantics, two for placement.

Ordering parity with the single-chip path (and hence the reference):

  * WHERE-only queries: shard blocks are contiguous original row ranges and
    local compaction is stable, so gather order == original row order
    (SURVEY §3.3).
  * GROUP BY: shards hold disjoint hash-partitioned key sets; one small sort
    of the gathered groups restores global ascending-key order (§3.4).
  * JOIN: hidden per-table row-id columns ride through the shuffle; the
    gathered result is sorted by (join keys, newest-first, then row ids in
    binding order), which reproduces the single-chip sorted-stable order
    exactly (§3.5).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from harkdb_tpu.columnar.batch import ColumnBatch
from harkdb_tpu.columnar.table import Table
from harkdb_tpu.config import EngineConfig, DEFAULT_CONFIG
from harkdb_tpu.ops.sort import sort_batch
from harkdb_tpu.parallel.dist_ops import dist_filter, dist_groupby, dist_join
from harkdb_tpu.parallel.sharded import ShardedBatch, shard_batch
from harkdb_tpu.plan.expr import eval_expr
from harkdb_tpu.plan.planner import QueryPlan


class DistExecutor:
    def __init__(self, plan: QueryPlan, mesh: Mesh,
                 config: EngineConfig = DEFAULT_CONFIG, shard_cache=None):
        self.plan = plan
        self.mesh = mesh
        self.config = config
        # (table name, binding) → resident ShardedBatch. Owned by the Context
        # so tables transfer to the mesh ONCE, not per query (the reference
        # re-ships the whole matrix across its FFI on every sql() call,
        # FutharkContext.py:65,70 — the flaw this engine exists to fix).
        self._shard_cache = shard_cache if shard_cache is not None else {}

    # -- table sharding -------------------------------------------------------
    def _shard_table(self, tables: Dict[str, Table], binding_idx: int) -> ShardedBatch:
        b, tname, cols = self.plan.bindings[binding_idx]
        key = (tname, b)
        cached = self._shard_cache.get(key)
        if cached is not None:
            return cached
        t = tables[tname]
        host = {f"{b}.{c}": t.host_columns[c] for c in cols}
        host[f"#rid.{b}"] = np.arange(t.n_rows, dtype=np.int32)
        sb = shard_batch(host, t.n_rows, self.mesh, self.config)
        self._shard_cache[key] = sb
        return sb

    # -- execution ------------------------------------------------------------
    def _pushdown(self, sb: ShardedBatch, binding: str) -> ShardedBatch:
        expr = self.plan.pushdown.get(binding)
        if expr is None:
            return sb
        return dist_filter(
            sb, lambda cols, cap: eval_expr(expr, cols, cap, self.config),
            self.mesh, self.config,
        )

    def execute(self, tables: Dict[str, Table]) -> ColumnBatch:
        plan = self.plan
        work = self._pushdown(self._shard_table(tables, 0),
                              plan.bindings[0][0])
        join_keys_newest_first: List[str] = []
        for step_idx, (rb, lk, rk, kind) in enumerate(plan.join_steps):
            right = self._pushdown(
                self._shard_table(tables, 1 + step_idx), rb
            )
            work = dist_join(work, right, lk, rk, self.mesh, self.config,
                             kind=kind)
            join_keys_newest_first.insert(0, lk)

        if plan.where_residual is not None:
            expr = plan.where_residual
            work = dist_filter(
                work, lambda cols, cap: eval_expr(expr, cols, cap,
                                                  self.config),
                self.mesh, self.config,
            )

        if plan.grouped:
            keys = list(plan.group_keys) or ["#const"]
            agg_specs = list(plan.agg_specs)
            arg_cols = list(plan.agg_arg_cols)
            need_ones = any(src == "#ones" for src, _, _ in agg_specs)
            need_const = not plan.group_keys
            cfg = self.config

            def pre_fn(cols, cap):
                extra = {}
                for internal, e in arg_cols:
                    extra[internal] = eval_expr(e, cols, cap, cfg)
                if need_ones:
                    extra["#ones"] = jnp.ones((cap,), jnp.int32)
                if need_const:
                    extra["#const"] = jnp.zeros((cap,), jnp.int32)
                return extra

            # MXU fast path distributed: the planner's statically-proven gate
            # (single small-span int key from no-join table stats, sum/count
            # only — plan.fast_agg) engages the one-hot matmul aggregation in
            # every shard's local pre-aggregate; partials shuffle as usual.
            fast = None
            if plan.fast_agg is not None and not plan.join_steps:
                _key, key_min, span_p = plan.fast_agg
                fast = (key_min, span_p)
            plan.last_fast_span = fast[1] if fast is not None else None

            work = dist_groupby(
                work, keys, agg_specs, self.mesh, self.config, pre_fn,
                fast=fast,
            )
            gathered = work.to_batch_device(self.mesh, self.config.mesh_axis)
            # Disjoint key sets per shard → one global sort restores the
            # ascending-key output contract (u32 bit order under the
            # reference-compat flag — ops/groupby.py).
            if self.config.compat_u32_key_order:
                from harkdb_tpu.ops.groupby import u32_order_key

                gathered = sort_batch(
                    gathered, [],
                    key_arrays=[u32_order_key(gathered.column(k))
                                for k in keys],
                )
            else:
                gathered = sort_batch(gathered, keys)
        else:
            gathered = work.to_batch_device(self.mesh, self.config.mesh_axis)
            if join_keys_newest_first:
                rid_cols = [
                    n for n in gathered.names if n.startswith("#rid.")
                ]
                sort_keys = [
                    k for k in join_keys_newest_first if k in gathered.columns
                ] + rid_cols
                gathered = sort_batch(gathered, sort_keys)

        return plan.run_tail(gathered)
