"""Per-sample channel-group selection for class-conditioned regressor heads.

Re-implements deepim/operator_py/group_picker.py:16-86 (the `GroupPicker`
custom op): with `REGRESSOR_NUM = num_classes`, the SE(3) head emits
`num_groups * group_ch` channels and each sample keeps only the channel group
of its object class.  The reference hand-writes the scatter backward
(group_picker.py:43-56); here plain `jnp.take_along_axis` gets the same
gradient from autodiff (grads flow to the picked group, zero elsewhere).

Note the shipped reference configs use a single shared regressor
(`REGRESSOR_NUM: 1`) and its test symbol raises NOT_IMPLEMENTED for more
(deepIM_flownet.py:745-749); here the multi-head path works for train and
test.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def group_pick(x: jax.Array, class_index: jax.Array, num_groups: int) -> jax.Array:
    """Pick each sample's channel group.

    x: (B, num_groups * C) grouped channels; class_index: (B,) int, 1-based
    class ids as in the pair records (mask_idx = class2idx, 1..num_classes) or
    0-based group ids — values >= num_groups are interpreted 1-based.
    Returns (B, C)."""
    b, total = x.shape
    assert total % num_groups == 0, (total, num_groups)
    ch = total // num_groups
    idx = jnp.asarray(class_index, jnp.int32)
    # Accept 1-based ids (the pairdb convention) without a host branch.
    idx = jnp.where(idx >= num_groups, idx - 1, idx)
    grouped = x.reshape(b, num_groups, ch)
    return jnp.take_along_axis(grouped, idx[:, None, None], axis=1)[:, 0]
