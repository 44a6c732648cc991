from harkdb_tpu.columnar.batch import ColumnBatch
from harkdb_tpu.columnar.table import Table
from harkdb_tpu.columnar.ingest import load_table

__all__ = ["ColumnBatch", "Table", "load_table"]
