from harkdb_tpu.parallel.mesh import make_engine_mesh, row_spec, row_sharding
from harkdb_tpu.parallel.sharded import ShardedBatch, shard_batch
from harkdb_tpu.parallel.shuffle import repartition_by_key, hash_to_bucket

__all__ = [
    "make_engine_mesh", "row_spec", "row_sharding",
    "ShardedBatch", "shard_batch",
    "repartition_by_key", "hash_to_bucket",
]
