"""Warmup + multi-factor LR schedule (lib/utils/lr_scheduler.py:27-67):
constant warmup_lr for the first warmup_step updates, then base lr multiplied
by `factor` at each step in `steps`."""
from __future__ import annotations

import jax.numpy as jnp


def warmup_multifactor_schedule(
    base_lr: float,
    steps: tuple[int, ...],
    factor: float = 0.1,
    warmup: bool = False,
    warmup_lr: float = 0.0,
    warmup_step: int = 0,
):
    steps_arr = jnp.asarray(steps or (2**31 - 1,), jnp.int32)

    def schedule(count):
        n_passed = jnp.sum(count >= steps_arr)
        lr = base_lr * (factor ** n_passed.astype(jnp.float32))
        if warmup:
            lr = jnp.where(count < warmup_step, warmup_lr, lr)
        return lr

    return schedule


def lr_steps_from_config(lr_step: str, epoch_size: int, begin_epoch: int = 0) -> tuple[int, ...]:
    """Parse the '4, 6' epoch list into global update steps
    (deepim/train.py:243-254 equivalent)."""
    epochs = [float(s) for s in lr_step.replace(" ", "").split(",") if s]
    return tuple(int(e * epoch_size) for e in epochs if e > begin_epoch)
