"""Context — the BlazingSQL-style public API (reference FutharkContext.py:38-71).

Placeholder while lower layers land; full implementation follows the planner.
"""

from __future__ import annotations

from typing import Dict, Optional

from harkdb_tpu.config import EngineConfig, DEFAULT_CONFIG
from harkdb_tpu.columnar.table import Table


class Context:
    def __init__(self, config: EngineConfig = DEFAULT_CONFIG):
        self.config = config
        self.tables: Dict[str, Table] = {}

    def create_table(self, table_name: str, source, col_names=None) -> None:
        self.tables[table_name] = Table(
            table_name, source, self.config, col_names=col_names
        )

    def drop_table(self, table_name: str) -> None:
        del self.tables[table_name]

    def sql(self, sql_statement: str):
        raise NotImplementedError
