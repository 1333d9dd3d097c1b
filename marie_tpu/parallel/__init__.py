from marie_tpu.parallel.mesh import create_mesh, default_mesh
from marie_tpu.parallel.sharding import infer_param_sharding, shard_batch
from marie_tpu.parallel.train import make_train_step

__all__ = [
    "create_mesh",
    "default_mesh",
    "infer_param_sharding",
    "shard_batch",
    "make_train_step",
]
