"""Convert reference MXNet checkpoints to/from this framework.

Import (deepim/train.py:165-195 load_param + init path):

    python -m deepim_tpu.tools.convert_mxnet_checkpoint import \
        --params /path/to/flownet-0000.params --out /ckpts/flownet_init \
        [--height 480 --width 640] [--input-depth] [--input-mask] \
        [--no-flow] [--no-mask-head] [--keep-bgr]

writes a .npz with the flax parameter tree (loadable with
load_npz_params below and usable as the `params` of a TrainState).

Export:

    python -m deepim_tpu.tools.convert_mxnet_checkpoint export \
        --npz /ckpts/trained.npz --out /path/deepim-0008.params

writes a reference-format .params file (mx.nd.save layout) so models
trained here can be loaded by the reference stack (lib/utils/
load_model.py:10-37).
"""
from __future__ import annotations

import argparse

import numpy as np


def save_npz_params(path: str, variables) -> None:
    import jax

    flat = {}
    for kpath, leaf in jax.tree_util.tree_leaves_with_path(variables):
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in kpath
        )
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_npz_params(path: str):
    flat = dict(np.load(path))
    tree: dict = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    imp = sub.add_parser("import")
    imp.add_argument("--params", required=True, help="MXNet .params path")
    imp.add_argument("--out", required=True, help="output .npz path")
    imp.add_argument("--height", type=int, default=480)
    imp.add_argument("--width", type=int, default=640)
    imp.add_argument("--input-depth", action="store_true")
    imp.add_argument("--input-mask", action="store_true")
    imp.add_argument("--no-flow", action="store_true")
    imp.add_argument("--no-mask-head", action="store_true")
    imp.add_argument("--keep-bgr", action="store_true")
    imp.add_argument("--lenient", action="store_true",
                     help="leave layers missing from the checkpoint at init")
    exp = sub.add_parser("export")
    exp.add_argument("--npz", required=True)
    exp.add_argument("--out", required=True)
    exp.add_argument("--height", type=int, default=480)
    exp.add_argument("--width", type=int, default=640)
    exp.add_argument("--keep-rgb", action="store_true")
    args = ap.parse_args(argv)

    from deepim_tpu.utils.mxnet_io import load_mxnet_params, save_mxnet_params

    if args.cmd == "import":
        import jax
        import jax.numpy as jnp

        from deepim_tpu.models import FlowNetDeepIM
        from deepim_tpu.models.import_mxnet import flax_from_mxnet

        channels = 6 + 2 * args.input_depth + 2 * args.input_mask
        model = FlowNetDeepIM(
            pred_flow=not args.no_flow, pred_mask=not args.no_mask_head
        )
        # Real init (not eval_shape): layers absent from the checkpoint
        # (fc6/fc7/rot/trans/mask heads of a raw pretrained-FlowNet file)
        # keep this model's reference-style initialization, mirroring
        # init_weights (deepIM_flownet.py:782-821).
        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.height, args.width, channels)),
        )
        mx_params = load_mxnet_params(args.params)
        variables = flax_from_mxnet(
            mx_params,
            template,
            input_hw=(args.height, args.width),
            bgr_to_rgb=not args.keep_bgr,
            strict=not args.lenient,
        )
        save_npz_params(args.out, variables)
        print(f"wrote {args.out} ({len(mx_params)} source arrays)")
    else:
        from deepim_tpu.models.import_mxnet import mxnet_from_flax

        variables = load_npz_params(args.npz)
        mx_params = mxnet_from_flax(
            variables,
            input_hw=(args.height, args.width),
            rgb_to_bgr=not args.keep_rgb,
        )
        save_mxnet_params(args.out, mx_params)
        print(f"wrote {args.out} ({len(mx_params)} arrays)")


if __name__ == "__main__":
    main()
