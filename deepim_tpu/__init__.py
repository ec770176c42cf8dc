"""deepim_tpu — a TPU-native render-and-compare 6D pose refinement engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of DeepIM
("Deep Iterative Matching for 6D Pose Estimation", ECCV 2018; reference
implementation: liyi14/mx-DeepIM).  The entire render -> zoom -> match ->
untangled-SE(3)-update refinement loop is expressed as jitted, batched array
code (`jax.lax.scan` over refinement iterations) so it never leaves the chip,
replacing the reference's host round-trips through OpenGL, CUDA and per-sample
numpy (reference: deepim/core/module.py:1131-1137,
lib/pair_matching/batch_updater_py_multi.py:91-328).

Subpackages
-----------
geometry   SE(3)/rotation math, the untangled delta-pose representation,
           projection, pose-error metrics.
render     Batched TPU rasterizer (XLA + Pallas tile kernels) producing
           RGB + depth + mask from meshes, replacing lib/render_glumpy.
ops        Zoom (crop-and-resize) ops, flow-from-depth, point matching.
models     FlowNetS-style matching network (flax.linen).
engine     Refinement scan, losses, train/test steps, LR schedule, checkpoints.
data       LM6d-layout pair database, preprocessing, host loader.
parallel   Device-mesh/sharding helpers for DP training & sharded eval.
eval       ADD(-S)/reprojection-2D/5cm-5deg evaluation protocol.
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (set DEEPIM_TPU_COMPILE_CACHE=0 to
    disable, or point it at a directory).  Every CLI invocation is a fresh
    process; without this each one pays the full multi-minute TPU compile of
    the rasterizer/engine jits."""
    import os

    val = os.environ.get("DEEPIM_TPU_COMPILE_CACHE", "1")
    if val == "0":
        return
    cache_dir = val if val not in ("", "1") else os.path.expanduser("~/.cache/deepim_tpu/xla")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
