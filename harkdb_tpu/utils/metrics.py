"""Per-query metrics and structured logging.

Fills the observability slot from SURVEY §5 — the reference's entire
observability story is one stray debug print (``parse.py:57``). Metrics are
host-side stage timings (parse+plan, execute, host transfer) plus row counts;
per-operator on-device timing is available via ``jax.profiler`` traces (see
``Context.profile``).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time

logger = logging.getLogger("harkdb_tpu")


@dataclasses.dataclass
class QueryMetrics:
    sql: str = ""
    plan_ms: float = 0.0            # parse + resolve + lower (cache miss only)
    execute_ms: float = 0.0         # device execution incl. dispatch
    rows_out: int = -1
    cached_plan: bool = False
    distributed: bool = False

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    def log(self, level: int = logging.INFO) -> None:
        logger.log(level, "query %s", self.to_json())


class StageTimer:
    """Context-manager stopwatch: ``with StageTimer() as t: ...; t.ms``."""

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self._t0) * 1e3
        return False
