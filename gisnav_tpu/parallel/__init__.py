"""Device-mesh utilities: multi-stream batching + tensor-parallel shardings."""
from gisnav_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_params_tp,
)
