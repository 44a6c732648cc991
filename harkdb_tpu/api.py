"""Context — the BlazingSQL-style public API (reference FutharkContext.py:38-71).

Surface parity:
  * ``create_table(name, source)``   — FutharkContext.py:44-50
  * ``drop_table(name)``             — FutharkContext.py:52-53
  * ``sql(statement)`` → numpy 2-D matrix (the reference returns the
    ``from_futhark``-marshalled matrix, FutharkContext.py:66,71)

Extensions: ``sql_df`` (DataFrame with column names), ``explain``, plan
caching (repeated queries skip parse/plan/trace entirely), and optional
mesh sharding (see ``harkdb_tpu.parallel``).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from harkdb_tpu.config import EngineConfig, DEFAULT_CONFIG
from harkdb_tpu.columnar.table import Table
from harkdb_tpu.columnar.batch import ColumnBatch


class Context:
    def __init__(self, config: EngineConfig = DEFAULT_CONFIG, mesh=None):
        """``mesh``: a ``jax.sharding.Mesh`` (see
        ``harkdb_tpu.parallel.make_engine_mesh``). When given, tables are
        row-sharded across it and queries run distributed (shard_map +
        all_to_all shuffles); when None, the single-chip path is used."""
        self.config = config
        self.mesh = mesh
        self.tables: Dict[str, Table] = {}
        self.views: Dict[str, str] = {}
        self._plan_cache: Dict[tuple, object] = {}
        self._shard_cache: Dict[tuple, object] = {}
        self.last_metrics = None

    # -- tables (reference surface) -------------------------------------------
    def create_table(self, table_name: str, source, col_names=None) -> None:
        self.tables[table_name] = Table(
            table_name, source, self.config, col_names=col_names
        )
        self._plan_cache.clear()
        self._shard_cache = {
            k: v for k, v in self._shard_cache.items() if k[0] != table_name
        }

    def drop_table(self, table_name: str) -> None:
        del self.tables[table_name]
        self._plan_cache.clear()
        self._shard_cache = {
            k: v for k, v in self._shard_cache.items() if k[0] != table_name
        }

    # -- views (engine extension: persistent CTEs) -----------------------------
    def create_view(self, name: str, sql_statement: str) -> None:
        """Register a named SELECT as a view. Views substitute at parse
        time exactly like CTEs (``WITH name AS (...)``) — a reference
        plans the body as a derived table with one materialization per
        query. A view may reference earlier-created views; a table of the
        same name shadows nothing (views resolve only where no real
        table matches the name... the substitution applies to any
        matching FROM reference, so avoid name collisions)."""
        if name in self.tables:
            raise ValueError(f"{name!r} is already a table")
        from harkdb_tpu.sql.parser import parse_sql

        parse_sql(sql_statement, views=self.views)   # syntax-check now
        self.views[name] = sql_statement
        self._plan_cache.clear()

    def drop_view(self, name: str) -> None:
        del self.views[name]
        self._plan_cache.clear()

    # -- queries --------------------------------------------------------------
    def _plan(self, sql_statement: str):
        from harkdb_tpu.plan.planner import plan_query

        key = (sql_statement, self._table_signature())
        plan = self._plan_cache.get(key)
        if plan is None:
            plan = plan_query(self.tables, sql_statement, self.config,
                              views=self.views)
            self._plan_cache[key] = plan
        return plan

    def _table_signature(self) -> tuple:
        return tuple(
            (name, t.capacity, tuple(t.get_schema()),
             tuple(str(c.dtype) for c in t.columns.values()))
            for name, t in sorted(self.tables.items())
        ) + tuple(sorted(self.views.items()))

    def sql_batch(self, sql_statement: str) -> Tuple[ColumnBatch, List[str]]:
        """Run a query; return the device-resident result batch + headers."""
        from harkdb_tpu.utils.metrics import QueryMetrics, StageTimer

        m = QueryMetrics(sql=sql_statement)
        key = (sql_statement, self._table_signature())
        m.cached_plan = key in self._plan_cache
        with StageTimer() as t:
            plan = self._plan(sql_statement)
        m.plan_ms = t.ms
        distributed = self.mesh is not None and self.mesh.devices.size > 1
        m.distributed = distributed

        def _run():
            from harkdb_tpu.plan.union_plan import UnionPlan

            if isinstance(plan, UnionPlan):
                # UnionPlan drives its own arms (distributed or not) and
                # unions the gathered results device-locally.
                return plan.execute(
                    self.tables,
                    mesh=self.mesh if distributed else None,
                    shard_cache=self._shard_cache,
                )
            if distributed:
                from harkdb_tpu.parallel.executor import DistExecutor

                return DistExecutor(
                    plan, self.mesh, self.config,
                    shard_cache=self._shard_cache,
                ).execute(self.tables)
            return plan.execute(self.tables)

        with StageTimer() as t:
            try:
                out = _run()
            except (RuntimeError, OSError):
                # RuntimeError covers jax.errors.JaxRuntimeError /
                # XlaRuntimeError; OSError covers a dropped device transport.
                # Queries are pure over resident tables — one re-execution
                # covers transient device failures (SURVEY §5).
                if not self.config.retry_on_failure:
                    raise
                out = _run()
        m.execute_ms = t.ms
        if self.config.collect_metrics:
            m.rows_out = int(out.n_valid)
        self.last_metrics = m
        self._last_plan = plan          # sql_df reads output_dicts from here
        m.log()
        return out, plan.output_names

    # -- persistence (SURVEY §5 checkpoint slot) ------------------------------
    def save(self, directory: str) -> None:
        """Persist every registered table as an npz checkpoint."""
        from harkdb_tpu.utils.persist import save_tables

        save_tables(self.tables, directory)

    def load(self, directory: str) -> None:
        """Re-register tables previously saved with :meth:`save`."""
        from harkdb_tpu.utils.persist import load_tables

        load_tables(self, directory)

    def sql(self, sql_statement: str) -> np.ndarray:
        """Run a query, returning a dense row-major numpy matrix (reference
        output shape, ``FutharkContext.py:66,71``). Hidden NULL-indicator
        columns (LEFT-JOIN matched flags) are dropped — the raw matrix shows
        the 0-fill; use :meth:`sql_df` for None/NaN decoding."""
        batch, _names = self.sql_batch(sql_statement)
        keep = [n for n in batch.names if not n.startswith("#nullflag")]
        return batch.select(keep).to_numpy()[0]

    def sql_df(self, sql_statement: str):
        """Run a query, returning a pandas DataFrame with output headers.

        String outputs (dictionary-encoded columns, or MIN/MAX over them)
        decode host-side here — the device result holds int32 codes; ``sql``
        returns the raw code matrix. Outputs over LEFT-JOIN nullable columns
        decode unmatched rows to None (strings) / NaN (numeric) through the
        hidden per-output NULL-indicator columns."""
        import pandas as pd

        batch, names = self.sql_batch(sql_statement)
        dicts = getattr(self._last_plan, "output_dicts", None) or [None] * len(
            names
        )
        n = int(batch.n_valid)
        out_internal = [
            nm for nm in batch.names if not nm.startswith("#nullflag")
        ]
        data = {}
        for j, ((display, internal), d) in enumerate(zip(
            zip(names, out_internal), dicts
        )):
            col = np.asarray(batch.columns[internal])[:n]
            flag = batch.columns.get(f"#nullflag{j}")
            nulls = None
            if flag is not None:
                nulls = np.asarray(flag)[:n] == 0
                if not nulls.any():
                    nulls = None
            if d is not None:
                col = d[np.clip(col, 0, len(d) - 1)]
                if nulls is not None:
                    col = col.astype(object)
                    col[nulls] = None
            elif nulls is not None:
                col = col.astype(np.float64)
                col[nulls] = np.nan
            # duplicate display names get pandas-style disambiguation
            key = display
            i = 1
            while key in data:
                key = f"{display}.{i}"
                i += 1
            data[key] = col
        return pd.DataFrame(data)

    def explain(self, sql_statement: str) -> str:
        return self._plan(sql_statement).explain()

    def profile(self, sql_statement: str,
                trace_dir: str = "/tmp/harkdb_trace") -> np.ndarray:
        """Run a query under ``jax.profiler.trace`` (SURVEY §5 tracing slot).

        Writes an XProf/TensorBoard trace with per-operator device timelines
        to ``trace_dir``; inspect with ``tensorboard --logdir`` or xprof.
        Returns the query result.
        """
        import jax

        with jax.profiler.trace(trace_dir):
            out = self.sql(sql_statement)
        return out
