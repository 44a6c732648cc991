from harkdb_tpu.prims.segmented import (
    segmented_scan,
    segmented_reduce,
    replicated_iota,
    segmented_iota,
    expand,
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
    "compact_indices",
    "compact",
    "compact_batch",
]
