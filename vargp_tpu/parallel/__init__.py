"""Device-mesh parallelism (no reference counterpart — the reference is
strictly single-device; SURVEY.md §2.3).

Design: a 2-D ("data", "model") mesh.  The ELBO's NLL is a sum over the
batch -> pure data parallelism over "data" (gradient psum handled by
GSPMD); the class axis out_size shards over "model" because every class's
M x M system is independent — the only cross-class communication is the
softmax's all-gather of per-class f samples, which XLA inserts where
needed.  Scale-out across slices (DCN) is plain DP over "data".
"""

from vargp_tpu.parallel.mesh import (
    make_mesh,
    infer_param_shardings,
    batch_shardings,
    shard_params,
    shard_batch,
    replicate,
    unshard_to_host,
)
from vargp_tpu.parallel.train_step import (
    make_sharded_update_fn,
    make_sharded_device_train_fn,
    make_sharded_predict_fn,
)

__all__ = [
    "make_mesh",
    "infer_param_shardings",
    "batch_shardings",
    "shard_params",
    "shard_batch",
    "replicate",
    "unshard_to_host",
    "make_sharded_update_fn",
    "make_sharded_device_train_fn",
    "make_sharded_predict_fn",
]
