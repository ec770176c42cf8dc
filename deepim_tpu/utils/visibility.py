"""Visibility-mask estimation (Hodan pysixd; lib/utils/visibility.py:7-33),
batched jnp/numpy-agnostic."""
from __future__ import annotations

import jax.numpy as jnp


def estimate_visib_mask(d_test, d_model, delta):
    """Model pixels visible in the test depth: rendered depth within `delta`
    in front of the measured depth."""
    valid = (d_test > 0) & (d_model > 0)
    return ((d_model.astype(jnp.float32) - d_test.astype(jnp.float32)) <= delta) & valid


def estimate_visib_mask_gt(d_test, d_gt, delta):
    return estimate_visib_mask(d_test, d_gt, delta)


def estimate_visib_mask_est(d_test, d_est, visib_gt, delta):
    visib_est = estimate_visib_mask(d_test, d_est, delta)
    return visib_est | (visib_gt & (d_est > 0))
