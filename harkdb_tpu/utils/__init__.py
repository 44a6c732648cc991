from harkdb_tpu.utils.metrics import QueryMetrics

__all__ = ["QueryMetrics"]
