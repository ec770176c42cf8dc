"""Per-layer timing of the FlowNet encoder on the real chip (batch 64
@480x640, bf16).  Development diagnostic."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_varied(fn, params, xs):
    """Time fn(params, x) over a list of DISTINCT inputs: the axon tunnel
    caches execution results for byte-identical dispatches."""
    import jax

    jax.block_until_ready(fn(params, xs[-1]))
    t0 = time.time()
    outs = [fn(params, x) for x in xs[:-1]]
    jax.block_until_ready(outs)
    return (time.time() - t0) / (len(xs) - 1)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import flax.linen as nn

    b, h, w = 64, 480, 640
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    specs = [
        ("conv1", 64, 7, 2, 8),
        ("conv2", 128, 5, 2, 64),
        ("conv3", 256, 5, 2, 128),
        ("conv3_1", 256, 3, 1, 256),
        ("conv4", 512, 3, 2, 256),
        ("conv4_1", 512, 3, 1, 512),
        ("conv5", 512, 3, 2, 512),
        ("conv5_1", 512, 3, 1, 512),
        ("conv6", 1024, 3, 2, 512),
        ("conv6_1", 1024, 3, 1, 1024),
    ]
    hw = (h, w)
    total = 0.0
    for name, cout, kk, s, cin in specs:
        hh, ww = hw
        xs = [
            jax.random.normal(jax.random.PRNGKey(i), (b, hh, ww, cin), dt)
            for i in range(6)
        ]
        conv = nn.Conv(cout, (kk, kk), strides=(s, s), padding=kk // 2, dtype=dt)
        params = conv.init(rng, xs[0][:1])
        f = jax.jit(lambda p, x: conv.apply(p, x))
        t = timeit_varied(f, params, xs)
        oh, ow = hh // s, ww // s
        gmacs = oh * ow * cout * kk * kk * cin * b / 1e9
        tflops = 2 * gmacs / t / 1e3
        print(f"{name:9s} {hh}x{ww}x{cin:4d} -> {oh}x{ow}x{cout:4d} k{kk}s{s}: "
              f"{t*1e3:7.2f} ms  {gmacs:7.1f} GMAC  {tflops:6.1f} TF/s")
        total += t
        hw = (oh, ow)
    print(f"encoder conv total: {total*1e3:.2f} ms")


if __name__ == "__main__":
    main()
