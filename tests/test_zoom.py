"""Tests for the zoom op family against a direct numpy re-derivation of the
MXNet GridGenerator+BilinearSampler semantics, plus the reference's own
self-test invariants (zoom -> inverse-zoom round trip, zoom_trans round trip
from operator_py/zoom_trans.py:106-154)."""
import numpy as np

import jax
import jax.numpy as jnp

from deepim_tpu.ops import (
    ZoomFactor,
    affine_sample,
    invert_zoom_factor,
    mask_bbox,
    zoom_factor_from_masks,
    zoom_flow,
    zoom_images,
    zoom_masks,
    zoom_trans,
)


def np_bilinear_sample(img, wx, wy, tx, ty):
    """Direct numpy port of the GridGenerator('affine') + BilinearSampler
    semantics: target grid in [-1,1] (align-corners), zero padding."""
    b, c, h, w = img.shape
    out = np.zeros_like(img)
    gy = np.linspace(-1, 1, h)
    gx = np.linspace(-1, 1, w)
    for bi in range(b):
        sx = (wx[bi] * gx + tx[bi] + 1) * (w - 1) / 2  # (W,)
        sy = (wy[bi] * gy + ty[bi] + 1) * (h - 1) / 2  # (H,)
        for i in range(h):
            y = sy[i]
            y0 = int(np.floor(y))
            fy = y - y0
            for j in range(w):
                x = sx[j]
                x0 = int(np.floor(x))
                fx = x - x0
                acc = np.zeros(c)
                for dy, wy_ in ((0, 1 - fy), (1, fy)):
                    for dx, wx_ in ((0, 1 - fx), (1, fx)):
                        yy, xx = y0 + dy, x0 + dx
                        if 0 <= yy < h and 0 <= xx < w:
                            acc += wy_ * wx_ * img[bi, :, yy, xx]
                out[bi, :, i, j] = acc
    return out


def test_affine_sample_matches_numpy(rng):
    img = rng.rand(2, 3, 24, 32).astype(np.float32)
    wx = np.array([0.5, 1.3], np.float32)
    wy = np.array([0.5, 1.3], np.float32)
    tx = np.array([0.1, -0.4], np.float32)
    ty = np.array([-0.2, 0.3], np.float32)
    zf = ZoomFactor(*map(jnp.asarray, (wx, wy, tx, ty)))
    got = np.asarray(affine_sample(jnp.asarray(img), zf))
    want = np_bilinear_sample(img, wx, wy, tx, ty)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_affine_identity(rng):
    img = rng.rand(1, 2, 16, 16).astype(np.float32)
    zf = ZoomFactor.identity(1)
    np.testing.assert_allclose(np.asarray(affine_sample(jnp.asarray(img), zf)), img, atol=1e-5)


def test_zoom_then_inverse_roundtrip(rng):
    """Zoom in then inverse-zoom restores the central region (the reference's
    zoom_trans/zoom_flow self-test invariant)."""
    h, w = 48, 64
    # Linear ramp: bilinear interpolation is exact on affine images, so the
    # zoom -> inverse-zoom round trip is an identity away from the boundary.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (0.3 * xx + 0.7 * yy)[None, None] / (h + w)
    zf = ZoomFactor(*map(jnp.asarray, ([0.5], [0.5], [0.1], [-0.05])))
    zoomed = affine_sample(jnp.asarray(img), zf)
    inv = invert_zoom_factor(zf, h, w)
    back = np.asarray(affine_sample(zoomed, inv))
    # Compare interior of the crop region (boundary pixels lose bilinear support).
    cx = int((0.1 + 1) / 2 * (w - 1))
    cy = int((-0.05 + 1) / 2 * (h - 1))
    ys = slice(cy - 8, cy + 8)
    xs = slice(cx - 10, cx + 10)
    np.testing.assert_allclose(back[0, 0, ys, xs], img[0, 0, ys, xs], atol=0.05)


def test_mask_bbox(rng):
    m = np.zeros((2, 20, 30), np.float32)
    m[0, 5:11, 7:20] = 1.0
    x0, x1, y0, y1, valid = map(np.asarray, mask_bbox(jnp.asarray(m)))
    assert (x0[0], x1[0], y0[0], y1[0]) == (7, 19, 5, 10)
    assert valid[0] and not valid[1]


def test_zoom_factor_from_masks_matches_reference_math(rng):
    """Re-derive the scalar zoom-factor math of zoom_mask.py:47-103 in numpy
    and compare with the batched branchless version."""
    h, w = 48, 64
    k = np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1]], np.float32)
    mask_obs = np.zeros((2, 1, h, w), np.float32)
    mask_gt = np.zeros((2, 1, h, w), np.float32)
    mask_rend = np.zeros((2, 1, h, w), np.float32)
    mask_gt[0, 0, 10:20, 12:30] = 1
    mask_rend[0, 0, 14:26, 18:36] = 1
    mask_gt[1, 0, 4:14, 40:60] = 1
    mask_rend[1, 0, 8:18, 30:50] = 1
    mask_obs[:] = mask_gt
    pose = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    pose[:, :, 3] = [[0.05, 0.02, 1.0], [-0.1, 0.08, 1.2]]

    zf = zoom_factor_from_masks(
        jnp.asarray(mask_obs), jnp.asarray(mask_gt), jnp.asarray(mask_rend),
        jnp.asarray(pose), jnp.asarray(k),
    )

    for bi in range(2):
        def bbox(m):
            ys, xs = np.nonzero(m[bi, 0])
            return xs.min(), xs.max(), ys.min(), ys.max()

        rx0, rx1, ry0, ry1 = bbox(mask_gt)
        sx0, sx1, sy0, sy1 = bbox(mask_rend)
        c = k @ pose[bi, :, 3]
        cx, cy = c[0] / c[2], c[1] / c[2]
        left = max(cx - sx0, cx - rx0)
        right = max(sx1 - cx, rx1 - cx)
        up = max(cy - sy0, cy - ry0)
        down = max(ry1 - cy, sy1 - cy)
        crop_h = max(0.75 * right, 0.75 * left, up, down) * 1.4 * 2
        np.testing.assert_allclose(float(zf.wx[bi]), crop_h / h, rtol=1e-5)
        np.testing.assert_allclose(float(zf.tx[bi]), cx / w * 2 - 1, rtol=1e-5)
        np.testing.assert_allclose(float(zf.ty[bi]), cy / h * 2 - 1, rtol=1e-5)


def test_zoom_factor_empty_rendered_falls_back(rng):
    h, w = 32, 32
    k = np.eye(3, dtype=np.float32)
    mask_gt = np.zeros((1, 1, h, w), np.float32)
    mask_gt[0, 0, 8:16, 8:16] = 1
    empty = np.zeros_like(mask_gt)
    pose = np.tile(np.eye(3, 4, dtype=np.float32), (1, 1, 1))
    pose[0, 2, 3] = 1.0
    zf = zoom_factor_from_masks(
        jnp.asarray(mask_gt), jnp.asarray(mask_gt), jnp.asarray(empty),
        jnp.asarray(pose), jnp.asarray(k),
    )
    # Fallback center = observed bbox center (zoom_mask.py:70-77).
    cx = (8 + 15) / 2
    np.testing.assert_allclose(float(zf.tx[0]), cx / w * 2 - 1, atol=1e-5)
    assert np.isfinite(np.asarray(zf.as_array())).all()


def test_zoom_images_padding_is_black(rng):
    img = rng.rand(1, 3, 16, 16).astype(np.float32) * 255
    means = np.array([123.68, 116.779, 103.939], np.float32)
    img_norm = img - means.reshape(1, 3, 1, 1)
    # Zoom out 2x => borders sample outside the frame.
    zf = ZoomFactor(*map(jnp.asarray, ([2.0], [2.0], [0.0], [0.0])))
    obs, rend = zoom_images(jnp.asarray(img_norm), jnp.asarray(img_norm), zf, jnp.asarray(means))
    corner = np.asarray(obs)[0, :, 0, 0]
    np.testing.assert_allclose(corner, -means, atol=1e-3)


def test_zoom_trans_roundtrip_and_grad(rng):
    trans = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    zf_arr = jnp.asarray(
        np.stack(
            [np.full(4, 0.37, np.float32), np.full(4, 0.37, np.float32),
             np.zeros(4, np.float32), np.zeros(4, np.float32)], axis=1
        )
    )
    z = zoom_trans(trans, zf_arr, False, False)
    back = zoom_trans(z, zf_arr, True, False)
    np.testing.assert_allclose(np.asarray(back), np.asarray(trans), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z)[:, 2], np.asarray(trans)[:, 2])

    # b_zoom_grad=False: gradient passes through unscaled (zoom_trans.py:66-68).
    g = jax.grad(lambda t: jnp.sum(zoom_trans(t, zf_arr, False, False)))(trans)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
    # b_zoom_grad=True: gradient scaled like the forward.
    g2 = jax.grad(lambda t: jnp.sum(zoom_trans(t, zf_arr, False, True)))(trans)
    np.testing.assert_allclose(np.asarray(g2)[:, :2], 1.0 / 0.37, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2)[:, 2], 1.0, atol=1e-6)


def test_zoom_masks_rounds(rng):
    h, w = 32, 32
    m = np.zeros((1, 1, h, w), np.float32)
    m[0, 0, 10:20, 10:20] = 1
    zf = ZoomFactor(*map(jnp.asarray, ([0.6], [0.6], [-0.05], [-0.05])))
    obs, gt, rend = zoom_masks(jnp.asarray(m), jnp.asarray(m), jnp.asarray(m * 0.9), zf)
    for out in (obs, gt, rend):
        vals = np.unique(np.asarray(out))
        assert set(vals.tolist()) <= {0.0, 1.0}


def test_zoom_flow_scaling(rng):
    h, w = 24, 24
    flow = np.ones((1, 2, h, w), np.float32) * 4.0
    weights = np.ones((1, 2, h, w), np.float32)
    zf = ZoomFactor(*map(jnp.asarray, ([0.5], [0.5], [0.0], [0.0])))
    zf_flow, zf_w = zoom_flow(jnp.asarray(flow), zf, jnp.asarray(weights))
    # Flow values divide by wx on zoom-in (zoom_flow.py:62).
    np.testing.assert_allclose(np.asarray(zf_flow)[0, :, 12, 12], 8.0, atol=1e-4)
    inv = zoom_flow(zf_flow, zf, inverse=True)
    np.testing.assert_allclose(np.asarray(inv)[0, :, 12, 12], 4.0, atol=1e-4)
