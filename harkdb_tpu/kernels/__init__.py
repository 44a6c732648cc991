from harkdb_tpu.kernels.matmul_agg import (
    onehot_groupby_sums, matmul_agg_applicable,
)

__all__ = ["onehot_groupby_sums", "matmul_agg_applicable"]
