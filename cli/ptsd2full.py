#!/usr/bin/env python3
"""Convert a training checkpoint into a standalone 'full model' bundle
(reference: utils/ptsd2full.py): reconstructs the model from checkpoint
metadata and re-saves weights + geometry in one file, printing the summary."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        description="Rebuild a full model from a checkpoint and re-save it",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("infile", help="checkpoint .tar file")
    parser.add_argument("outfile", nargs="?", default=None,
                        help="output file (default: <infile>_full.tar)")
    args = parser.parse_args()

    from signaltrain_tpu.models.st_model import param_count
    from signaltrain_tpu.training import checkpoint as ckpt
    from signaltrain_tpu.utils.load_model import load_model

    model, params, rv = load_model(args.infile)
    print("checkpoint keys -> run values:", sorted(rv.keys()))
    print("model spec:", model.spec)
    print("parameters:", param_count(params))

    class _Eff:  # re-wrap the checkpoint's effect metadata
        name = rv.get("effect_name", "unknown")
        knob_names = rv["knob_names"]
        knob_ranges = rv["knob_ranges"]

    out = args.outfile or args.infile.replace(".tar", "_full.tar")
    ckpt.save_checkpoint(out, params, model.spec, _Eff, rv.get("epoch", 0) - 1)
    print(f"\nSaved full model to {out}")


if __name__ == "__main__":
    main()
