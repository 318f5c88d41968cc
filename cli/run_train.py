#!/usr/bin/env python3
"""Training CLI — flag surface mirrors the reference's run_train.py:32-47.

Example:
    python cli/run_train.py --epochs 10 -n 2000 -b 100 --effect comp_4c
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        description="Trains neural network to reproduce input-output transformations.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    # --apex kept for CLI compatibility; TPU mixed precision is native bf16
    parser.add_argument("--apex", help="(compat) ignored; use --dtype", default="O0")
    parser.add_argument("-b", "--batch", type=int, help="batch size", default=200)
    parser.add_argument(
        "--checkpoint", help="Name of model checkpoint .tar file",
        default="modelcheckpoint.tar",
    )
    parser.add_argument(
        "-c", "--compand", help="Turn on to use companded/decompanded audio",
        action="store_true",
    )
    parser.add_argument(
        "--effect",
        help='Name of effect to use. ("files" = search for "target_" and '
        "effect_info.ini files in path)",
        default="comp_4c",
    )
    parser.add_argument("--epochs", type=int, help="Number of epochs to run", default=1000)
    parser.add_argument("--lrmax", type=float, help="max learning rate", default=1e-4)
    parser.add_argument(
        "-n", "--num", type=int,
        help='Number of "data points" (audio clips) per epoch', default=200000,
    )
    parser.add_argument(
        "--path",
        help="Directory to pull input (and maybe target) data from "
        "(default: None, means only synthesized-on-the-fly data)",
        default=None,
    )
    parser.add_argument("--sr", type=int, help="Sampling rate", default=44100)
    parser.add_argument(
        "--scale", type=float, help="Scale factor (of input size & whole model)",
        default=1.0,
    )
    parser.add_argument(
        "--shrink", type=int,
        help="Shink output chunk relative to input by this divisor", default=4,
    )
    parser.add_argument(
        "-t", "--target", help="type of target: chunk or stream", default="stream"
    )
    # TPU-native extras
    parser.add_argument(
        "--dtype", help="compute dtype: bfloat16 or float32", default="bfloat16"
    )
    parser.add_argument(
        "--nmodel", type=int, default=1,
        help="model-axis size for front-end tensor parallelism",
    )
    parser.add_argument("--seed", type=int, default=218)
    parser.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax profiler trace of the run into DIR",
    )
    parser.add_argument(
        "--out-checkpoint", default=None, metavar="FILE",
        help="where to save checkpoints (default: same as --checkpoint; the "
        "reference hardcodes modelcheckpoint.tar, train.py:274)",
    )
    args = parser.parse_args()

    print("Command line: ", " ".join(sys.argv[:]))

    from signaltrain_tpu.config import RunConfig, train_from_config
    from signaltrain_tpu.dsp import effects as fx
    from signaltrain_tpu.utils.cache import enable_compilation_cache

    try:
        effect = fx.make_effect(args.effect, path=args.path, sr=args.sr)
    except (ValueError, FileNotFoundError) as e:
        print(f"Error: {e}")
        sys.exit(1)
    if "VST" in args.effect:
        print("VST plugins not integrated yet.")
        sys.exit(1)

    if args.target not in ["chunk", "stream"]:
        print(f"Error, invalid target type: {args.target}")
        sys.exit(1)
    if args.effect == "files" and (
        not glob.glob(args.path + "/Train/input*")
        or not glob.glob(args.path + "/Val/input*")
    ):
        print(f"Error: no input files under {args.path}/Train and {args.path}/Val")
        sys.exit(1)

    from signaltrain_tpu import __version__
    from signaltrain_tpu.utils.banner import print_choochoo

    print_choochoo(__version__)  # ascii art is the hallmark of professionalism
    print("Running with args =", args)
    enable_compilation_cache()

    cfg = RunConfig.from_args(args)

    import contextlib

    from signaltrain_tpu.utils import profiling

    ctx = profiling.trace(args.profile) if args.profile else contextlib.nullcontext()
    with ctx:
        train_from_config(cfg, effect=effect)
    print("run_train.py: Execution completed.")


if __name__ == "__main__":
    main()
