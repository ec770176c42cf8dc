"""Flow -> pose via PnP RANSAC (diagnostic / alternative pose recovery).

Re-implements lib/pair_matching/flow2se3.py:13-54: backproject the rendered
depth, displace pixels by the predicted flow, and solve PnP RANSAC from the
3D-2D correspondences.  Host-side (cv2), used for analysis — the production
pose path is the network's direct SE(3) head.
"""
from __future__ import annotations

import cv2
import numpy as np


def flow2se3(depth_object: np.ndarray, flow: np.ndarray, mask_image: np.ndarray, k: np.ndarray):
    """depth_object: (H, W) rendered depth; flow: (H, W, 2) in (dw, dh)
    standard order; mask_image: (H, W) observed-object mask; k: (3, 3).
    Returns (converged, se3_q (7,): quaternion wxyz + translation)."""
    h, w = depth_object.shape
    valid_obj = (depth_object != 0).flatten()
    # Backproject: X = K^-1 (x, y, 1) * d.
    k_inv = np.linalg.inv(k)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    ones = np.ones_like(xs)
    pix = np.stack([xs.ravel(), ys.ravel(), ones.ravel()])
    pts3 = (k_inv @ pix) * depth_object.reshape(1, -1)

    tgt_x = (xs + flow[:, :, 0]).flatten()
    tgt_y = (ys + flow[:, :, 1]).flatten()
    valid_img = (mask_image != 0).flatten()
    valid = np.where(valid_obj & valid_img)[0]

    se3_q = np.zeros(7)
    if len(valid) < 6:
        se3_q[0] = 1.0
        return False, se3_q
    object_points = pts3[:, valid].T.astype(np.float64)
    image_points = np.stack([tgt_x[valid], tgt_y[valid]], axis=1).astype(np.float64)
    ok, rvec, tvec, _ = cv2.solvePnPRansac(object_points, image_points, k.astype(np.float64), np.zeros(4))
    if ok:
        r, _ = cv2.Rodrigues(rvec)
        # rotation matrix -> quaternion (w, x, y, z), w >= 0
        from scipy.spatial.transform import Rotation as R

        q = R.from_matrix(r).as_quat()  # x, y, z, w
        q = np.array([q[3], q[0], q[1], q[2]])
        if q[0] < 0:
            q = -q
        se3_q[:4] = q
        se3_q[4:] = tvec.flatten()
        return True, se3_q
    se3_q[0] = 1.0
    return False, se3_q
