from deepim_tpu.engine.losses import (  # noqa: F401
    flow_loss,
    mask_loss,
    point_matching_loss,
    se3_dist_loss,
    smooth_l1,
)
from deepim_tpu.engine.lr_schedule import lr_steps_from_config, warmup_multifactor_schedule  # noqa: F401
from deepim_tpu.engine.refine import (  # noqa: F401
    EngineConfig,
    LightParams,
    MeshBuffers,
    Observation,
    refine,
    refine_step,
    render_at_pose,
)
from deepim_tpu.engine.tracker import make_tracker, track_video_sharded  # noqa: F401
from deepim_tpu.engine.train import (  # noqa: F401
    TrainBatch,
    TrainState,
    compute_losses,
    make_optimizer,
    make_train_step,
)
