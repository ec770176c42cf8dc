"""CLI entry point: test only (reference experiments/deepim/deepim_test.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from deepim_tpu.config import load_config  # noqa: E402
from deepim_tpu.tools.test_net import test_deepim  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description="Test DeepIM-TPU")
    ap.add_argument("--cfg", required=True)
    args = ap.parse_args()
    test_deepim(load_config(args.cfg))


if __name__ == "__main__":
    main()
