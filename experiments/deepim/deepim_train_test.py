"""CLI entry point: train then test, mirroring
experiments/deepim/deepim_train_test.py of the reference
(`--cfg <yaml>`; device selection is automatic on TPU — the reference's
`--gpus 0,1,2,3` maps to the full device mesh)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from deepim_tpu.config import load_config  # noqa: E402
from deepim_tpu.parallel import initialize_distributed  # noqa: E402
from deepim_tpu.tools.test_net import test_deepim  # noqa: E402
from deepim_tpu.tools.train_net import train_net  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description="Train and test DeepIM-TPU")
    ap.add_argument("--cfg", required=True, help="experiment yaml")
    ap.add_argument("--n-devices", type=int, default=None)
    ap.add_argument("--test-only", action="store_true")
    args = ap.parse_args()
    initialize_distributed()  # no-op outside a multi-host launch
    cfg = load_config(args.cfg)
    if not args.test_only:
        state = train_net(cfg, n_devices=args.n_devices)
        test_deepim(cfg, params=state.params)
    else:
        test_deepim(cfg)


if __name__ == "__main__":
    main()
