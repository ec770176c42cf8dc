from deepim_tpu.geometry import pose_metrics, projection, rotations, se3  # noqa: F401
from deepim_tpu.geometry.rotations import (  # noqa: F401
    euler2mat,
    mat2euler,
    mat2quat,
    qmult,
    quat2mat,
    quat_angle_deg,
    quat_inverse,
    quat_normalize,
    rot_geodesic_deg,
)
from deepim_tpu.geometry.se3 import (  # noqa: F401
    R_inv_transform,
    R_transform,
    RT_transform,
    T_inv_transform,
    T_transform,
    calc_RT_delta,
    make_pose,
    se3_inverse,
    se3_mul,
)
