from harkdb_tpu.ops.sort import sort_permutation, sort_batch
from harkdb_tpu.ops.groupby import groupby_aggregate, AGG_FUNCS
from harkdb_tpu.ops.join import (
    inner_join_indices, join_indices, join_batches, join_match_count,
)

__all__ = [
    "sort_permutation",
    "sort_batch",
    "groupby_aggregate",
    "AGG_FUNCS",
    "inner_join_indices",
    "join_indices",
    "join_match_count",
    "join_batches",
]
