"""Batched rotation representations and conversions (pure JAX).

Re-implements (batched, differentiable, branchless) the rotation-math suite
the reference keeps as scalar numpy in lib/pair_matching/RT_transform.py:
quat2mat (:383-429), mat2quat (:432-509), euler2mat/mat2euler for the 'sxyz'
convention (:240-373), qmult (:609-631), quat_inverse (:376-380).

All functions accept arbitrary leading batch dimensions.  Quaternions are
(w, x, y, z), matching the reference convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) to unit norm. q: (..., 4)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat2mat(q: jax.Array) -> jax.Array:
    """Quaternion(s) -> rotation matrix/matrices.

    Accepts un-normalized quaternions, matching the reference semantics
    (RT_transform.py:383-429: scales by 2/Nq).  q: (..., 4) -> (..., 3, 3).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    nq = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.maximum(nq, _EPS)
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    xx, xy, xz = x * x * s, x * y * s, x * z * s
    yy, yz, zz = y * y * s, y * z * s, z * z * s
    m = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    ).reshape(q.shape[:-1] + (3, 3))
    # Degenerate all-zero quaternion -> identity (reference returns eye(3)).
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), m.shape)
    return jnp.where((nq < _EPS)[..., None, None], eye, m)


def mat2quat(m: jax.Array) -> jax.Array:
    """Rotation matrix/matrices -> unit quaternion(s) with w >= 0.

    Branchless Shepperd-style extraction: computes all four candidate
    quaternions and selects the numerically largest pivot, replacing the
    reference's eigenvector method (RT_transform.py:432-509) which has no
    efficient batched XLA analog.  m: (..., 3, 3) -> (..., 4).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*|q_i|^2 pivots.
    tw = 1.0 + tr
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    sw = safe_sqrt(tw) * 2.0  # 4w
    qw_w = 0.25 * sw
    qx_w = (m21 - m12) / sw
    qy_w = (m02 - m20) / sw
    qz_w = (m10 - m01) / sw

    sx = safe_sqrt(tx) * 2.0  # 4x
    qw_x = (m21 - m12) / sx
    qx_x = 0.25 * sx
    qy_x = (m01 + m10) / sx
    qz_x = (m02 + m20) / sx

    sy = safe_sqrt(ty) * 2.0  # 4y
    qw_y = (m02 - m20) / sy
    qx_y = (m01 + m10) / sy
    qy_y = 0.25 * sy
    qz_y = (m12 + m21) / sy

    sz = safe_sqrt(tz) * 2.0  # 4z
    qw_z = (m10 - m01) / sz
    qx_z = (m02 + m20) / sz
    qy_z = (m12 + m21) / sz
    qz_z = 0.25 * sz

    cands = jnp.stack(
        [
            jnp.stack([qw_w, qx_w, qy_w, qz_w], axis=-1),
            jnp.stack([qw_x, qx_x, qy_x, qz_x], axis=-1),
            jnp.stack([qw_y, qx_y, qy_y, qz_y], axis=-1),
            jnp.stack([qw_z, qx_z, qy_z, qz_z], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    pivots = jnp.stack([tw, tx, ty, tz], axis=-1)  # (..., 4)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    q = quat_normalize(q)
    # Prefer w >= 0 (reference RT_transform.py:505-508).
    return jnp.where(q[..., :1] < 0, -q, q)


def qmult(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product, result sign-normalized to w >= 0 (RT_transform.py:609-631)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    q = jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ],
        axis=-1,
    )
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_inverse(q: jax.Array) -> jax.Array:
    """Quaternion inverse (RT_transform.py:376-380)."""
    nq = jnp.sum(q * q, axis=-1, keepdims=True)
    conj = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return conj / jnp.maximum(nq, _EPS)


def euler2mat(ai: jax.Array, aj: jax.Array, ak: jax.Array) -> jax.Array:
    """Euler 'sxyz' angles -> rotation matrix (RT_transform.py:240-307, sxyz path).

    R = Rz(ak) @ Ry(aj) @ Rx(ai) for the static-xyz convention.
    Broadcasts over leading dims; returns (..., 3, 3).
    """
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    return jnp.stack(
        [
            cj * ck, sj * sc - cs, sj * cc + ss,
            cj * sk, sj * ss + cc, sj * cs - sc,
            -sj, cj * si, cj * ci,
        ],
        axis=-1,
    ).reshape(jnp.shape(si) + (3, 3))


def mat2euler(m: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Rotation matrix -> Euler 'sxyz' angles (RT_transform.py:310-373, sxyz path).

    Branchless: at the gimbal-lock singularity (cy ~ 0) falls back to the
    reference's degenerate formulas via jnp.where.
    """
    cy = jnp.sqrt(m[..., 0, 0] ** 2 + m[..., 1, 0] ** 2)
    eps4 = jnp.asarray(4.0 * jnp.finfo(m.dtype).eps, m.dtype)
    regular = cy > eps4
    ax = jnp.where(
        regular,
        jnp.arctan2(m[..., 2, 1], m[..., 2, 2]),
        jnp.arctan2(-m[..., 1, 2], m[..., 1, 1]),
    )
    ay = jnp.arctan2(-m[..., 2, 0], cy)
    az = jnp.where(regular, jnp.arctan2(m[..., 1, 0], m[..., 0, 0]), 0.0)
    return ax, ay, az


def rot_geodesic_deg(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Geodesic angle between rotations in degrees.

    Stable arccos((tr(R1^T R2) - 1)/2) form, equivalent to the reference's
    ||logm(R1^T R2)||_F / sqrt(2) (RT_transform.py:162-173) without logm
    (which has no JAX analog).  (..., 3, 3) x (..., 3, 3) -> (...,).
    """
    rel = jnp.einsum("...ji,...jk->...ik", r1, r2)
    tr = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def quat_angle_deg(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Angle between two unit quaternions, degrees (RT_transform.py:154-159)."""
    d = jnp.sum(q1 * q2, axis=-1)
    cos = jnp.clip(2.0 * d * d - 1.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))
