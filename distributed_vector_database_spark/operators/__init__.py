from distributed_vector_database_spark.operators.topk import topk, batch_topk
from distributed_vector_database_spark.operators.ivf import IVFIndex, assign_shards

__all__ = ["topk", "batch_topk", "IVFIndex", "assign_shards"]
