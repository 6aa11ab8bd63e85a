"""Shared helpers for the example cases."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def example_main(run):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--quick", action="store_true", help="tiny grid / few steps"
    )
    parser.add_argument("--outdir", default=None)
    args = parser.parse_args()
    out = run(quick=args.quick, outdir=args.outdir)
    print("done:", {k: v for k, v in (out or {}).items() if not hasattr(v, "shape")})
    return out
