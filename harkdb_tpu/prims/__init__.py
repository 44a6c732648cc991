from harkdb_tpu.prims.segmented import (
    segmented_scan,
    segmented_reduce,
    replicated_iota,
    segmented_iota,
    expand,
    expand_reduce,
    expand_outer_reduce,
)
from harkdb_tpu.prims.compaction import (
    compact_indices,
    compact,
    compact_batch,
)

__all__ = [
    "segmented_scan",
    "segmented_reduce",
    "replicated_iota",
    "segmented_iota",
    "expand",
    "expand_reduce",
    "expand_outer_reduce",
    "compact_indices",
    "compact",
    "compact_batch",
]
