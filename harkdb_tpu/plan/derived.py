"""Derived tables — ``FROM (SELECT ...) alias`` (engine extension; the
reference grammar is single-named-table only, ``parse.py:29-33``).

A derived table is an inner ``QueryPlan`` wrapped in a Table-compatible
source: the OUTER plan resolves names against the inner plan's output
schema at plan time, and the inner result materializes lazily at first
execution (cached on the plan — tables are immutable while a plan is
cached, the same contract subqueries rely on). String outputs carry their
dictionaries through, so LIKE / comparisons / joins on derived string
columns work unchanged.

Limits (documented in README): the MXU fast-path gate stays off for
derived columns (no host stats), hidden LEFT-JOIN NULL flags do not
propagate OUT of a derived table (unmatched rows surface as the 0-fill),
and in distributed contexts the inner query executes through the full
distributed path but its result materializes to the host once before
resharding (the derived output is usually far smaller than its inputs).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from harkdb_tpu.columnar.batch import ColumnBatch
from harkdb_tpu.plan.errors import PlanError


class DerivedSource:
    """Table-surface adapter over an inner QueryPlan (the subset the
    planner and the distributed executor actually touch)."""

    #: planner stat probes (fast-path gates, dtype sniffing) see no host
    #: columns and correctly fall back to the general paths.
    host_columns: Dict[str, np.ndarray] = {}

    def __init__(self, plan):
        self.plan = plan
        names = list(plan.output_names)
        if len(set(names)) != len(names):
            raise PlanError(
                "Derived table output column names must be unique; "
                "alias duplicated expressions"
            )
        self._schema = names
        self._batch: Optional[ColumnBatch] = None
        self._host: Optional[Tuple[Dict[str, np.ndarray], int]] = None
        self._shards: Dict[str, object] = {}   # per outer binding (a CTE
        #                                        source may back several)

    # -- planner surface ------------------------------------------------------
    def get_schema(self) -> List[str]:
        return list(self._schema)

    def column_dict(self, name: str):
        try:
            i = self._schema.index(name)
        except ValueError:
            return None
        return self.plan.output_dicts[i]

    def column_range(self, _name: str):
        return None                     # no host stats → no MXU fast path

    # -- materialization ------------------------------------------------------
    def _out_internal(self, b: ColumnBatch) -> List[str]:
        return [n for n in b.names if not n.startswith("#nullflag")]

    def batch(self, tables) -> ColumnBatch:
        """Single-chip materialization, columns renamed to the schema."""
        if self._batch is None:
            b = self.plan.execute(tables)
            outs = self._out_internal(b)
            self._batch = ColumnBatch(
                {nm: b.columns[oi] for nm, oi in zip(self._schema, outs)},
                b.n_valid,
            )
        return self._batch

    def materialize_host(self, tables, mesh=None, config=None,
                         shard_cache=None):
        """(host column dict, n_rows) for mesh resharding: the inner query
        runs through the distributed executor when a mesh is given."""
        if self._host is None:
            from harkdb_tpu.plan.union_plan import UnionPlan

            if isinstance(self.plan, UnionPlan):
                # UnionPlan drives its own arms (distributed or not)
                b = self.plan.execute(
                    tables, mesh=mesh, shard_cache=shard_cache
                )
            elif mesh is not None and mesh.devices.size > 1:
                from harkdb_tpu.parallel.executor import DistExecutor

                b = DistExecutor(
                    self.plan, mesh, config, shard_cache=shard_cache
                ).execute(tables)
            else:
                b = self.plan.execute(tables)
            n = int(b.n_valid)
            outs = self._out_internal(b)
            cols = {
                nm: np.asarray(b.columns[oi])[:n]
                for nm, oi in zip(self._schema, outs)
            }
            self._host = (cols, n)
        return self._host

    def sharded(self, tables, mesh, config, shard_cache, binding: str,
                remaps: Dict[str, np.ndarray]):
        """Row-sharded materialization (cached HERE, not in the Context's
        shard cache — that cache is keyed by table NAME, and two plans may
        use the same alias for different inner queries). ``remaps`` are the
        outer plan's merged-dictionary code LUTs, applied host-side like
        the executor does for base tables."""
        if binding not in self._shards:
            from harkdb_tpu.parallel.sharded import shard_batch

            host, n = self.materialize_host(
                tables, mesh, config, shard_cache
            )
            cols = {}
            for c, a in host.items():
                internal = f"{binding}.{c}"
                lut = remaps.get(internal)
                cols[internal] = lut[a] if lut is not None else a
            cols[f"#rid.{binding}"] = np.arange(n, dtype=np.int32)
            self._shards[binding] = shard_batch(cols, n, mesh, config)
        return self._shards[binding]
