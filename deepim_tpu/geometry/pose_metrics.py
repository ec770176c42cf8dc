"""Pose-error metrics: ADD, ADI, rotation/translation error, reprojection-2D.

Batched JAX re-implementation of lib/utils/pose_error.py (Hodan et al.,
"On Evaluation of 6D Object Pose Estimation"): add (:72-86), adi (:89-108),
re (:127-132), te (:135-145), arp_2d (:55-69).  The reference computes these
per sample on host numpy (with a cKDTree for ADI); here everything is batched
array code so the whole LINEMOD test set can be scored on-device
(cKDTree -> chunked pairwise-distance min, exact for the ~3k-point models).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.rotations import rot_geodesic_deg


def transform_pts(pts: jax.Array, r: jax.Array, t: jax.Array) -> jax.Array:
    """pts: (..., N, 3), r: (..., 3, 3), t: (..., 3) -> (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", r, pts) + t[..., None, :]


def add(r_est, t_est, r_gt, t_gt, pts) -> jax.Array:
    """Average distance of model points (pose_error.py:72-86). -> (...,)"""
    pe = transform_pts(pts, r_est, t_est)
    pg = transform_pts(pts, r_gt, t_gt)
    return jnp.mean(jnp.linalg.norm(pe - pg, axis=-1), axis=-1)


def adi(r_est, t_est, r_gt, t_gt, pts, *, chunk: int = 512) -> jax.Array:
    """ADD for symmetric objects: mean over gt points of the distance to the
    nearest estimated point (pose_error.py:89-108).

    Exact nearest neighbor via chunked pairwise distances (replaces cKDTree);
    memory is O(chunk * N) per batch element.
    """
    pe = transform_pts(pts, r_est, t_est)  # (..., N, 3)
    pg = transform_pts(pts, r_gt, t_gt)
    n = pg.shape[-2]
    pad = (-n) % chunk
    pg_pad = jnp.pad(pg, [(0, 0)] * (pg.ndim - 2) + [(0, pad), (0, 0)])
    n_chunks = pg_pad.shape[-2] // chunk
    pg_chunks = pg_pad.reshape(pg.shape[:-2] + (n_chunks, chunk, 3))
    pg_chunks = jnp.moveaxis(pg_chunks, -3, 0)  # (n_chunks, ..., chunk, 3)

    def one_chunk(g):
        # g: (..., chunk, 3) vs pe: (..., N, 3)
        d2 = jnp.sum((g[..., :, None, :] - pe[..., None, :, :]) ** 2, axis=-1)
        return jnp.min(d2, axis=-1)  # (..., chunk)

    min_d2 = jax.lax.map(one_chunk, pg_chunks)  # (n_chunks, ..., chunk)
    min_d2 = jnp.moveaxis(min_d2, 0, -2).reshape(pg.shape[:-2] + (n_chunks * chunk,))
    min_d = jnp.sqrt(min_d2[..., :n])
    return jnp.mean(min_d, axis=-1)


def re(r_est, r_gt) -> jax.Array:
    """Rotation geodesic error in degrees (pose_error.py:127-132; the
    reference's logm Frobenius form equals the arccos trace form)."""
    return rot_geodesic_deg(r_est, r_gt)


def te(t_est, t_gt) -> jax.Array:
    """Translation L2 error (pose_error.py:135-145)."""
    return jnp.linalg.norm(t_gt - t_est, axis=-1)


def arp_2d(r_est, t_est, r_gt, t_gt, pts, k) -> jax.Array:
    """Average 2D reprojection error in pixels (pose_error.py:55-69)."""
    pe = transform_pts(pts, r_est, t_est)
    pg = transform_pts(pts, r_gt, t_gt)
    pe2 = jnp.einsum("ij,...nj->...ni", k, pe)
    pg2 = jnp.einsum("ij,...nj->...ni", k, pg)
    pe2 = pe2[..., :2] / pe2[..., 2:3]
    pg2 = pg2[..., :2] / pg2[..., 2:3]
    return jnp.mean(jnp.linalg.norm(pe2 - pg2, axis=-1), axis=-1)
