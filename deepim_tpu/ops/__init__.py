from deepim_tpu.ops.flow import flow_from_depth, flow_from_depth_kt  # noqa: F401
from deepim_tpu.ops.pointmatch import transform3d  # noqa: F401
from deepim_tpu.ops.sampler import ZoomFactor, affine_sample, invert_zoom_factor  # noqa: F401
from deepim_tpu.ops.zoom import (  # noqa: F401
    mask_bbox,
    zoom_depths,
    zoom_factor_from_images,
    zoom_factor_from_masks,
    zoom_flow,
    zoom_images,
    zoom_mask,
    zoom_masks,
    zoom_trans,
)
