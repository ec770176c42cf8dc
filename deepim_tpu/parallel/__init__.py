from deepim_tpu.parallel.dp import jit_refine_dp, jit_train_step_dp  # noqa: F401
from deepim_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    batch_specs_like,
    initialize_distributed,
    make_mesh,
    replicate_pytree,
    replicated,
    replicated_specs_like,
    shard_pytree_batch,
)
