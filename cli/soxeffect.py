#!/usr/bin/env python3
"""Apply a sox effect with (optionally) randomly-sampled parameter ranges to
a list of input files (reference: utils/soxeffect.py).

Comma-separated number pairs in the settings string are min,max ranges: each
file gets a uniform draw, truncated to 3 decimals and burned into the target
filename ('target_<i>__p1__p2.wav'). Emits an effect_info.ini stanza to
stdout. Parallel over all CPUs.

Usage:
  ./soxeffect.py chorus '0.7,0.9 0.5,0.9 40.0,60.0 0.2,0.5 0.1,.4 1.0,3.0 -s' input*.wav
"""

import argparse
import multiprocessing as mp
import os
import subprocess
from functools import partial

import numpy as np


def is_number(string: str) -> bool:
    try:
        float(string)
        return True
    except ValueError:
        return False


def ranges_to_vals(s: str):
    """Replace 'min,max' pairs with uniform draws (soxeffect.py:46-62).
    Returns (settings_string, value_strings, ranges)."""
    out_str = ""
    pvals, pranges = [], []
    for p in s.split(" "):
        mm = p.split(",")
        valstr = mm[0]
        if is_number(valstr) and len(mm) > 1:
            minval, maxval = float(valstr), float(mm[1])
            pranges.append([minval, maxval])
            val = minval + np.random.rand() * (maxval - minval)
            valstr = f"{val:.3f}"
            pvals.append(valstr)
        out_str += f"{valstr} "
    return out_str, pvals, pranges


def process_one_file(inputs, effect, params, i):
    in_file = inputs[i]
    paramstr, pvals, pranges = ranges_to_vals(params)
    out_file = "target" + in_file.replace("input", "")
    pvalstr = "".join(f"__{p}" for p in pvals) if pvals else "_1"
    out_file = out_file.replace("_.wav", f"{pvalstr}.wav")
    cmd = f"sox --multi-threaded {in_file} {out_file} {effect} {paramstr}"
    print("  execstr = ", cmd)
    subprocess.run(cmd, shell=True, check=False)
    return pranges


def main():
    parser = argparse.ArgumentParser(
        description="Applies a sox audio effect to lots of files",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("effect", help="Name of effect class for generating target")
    parser.add_argument("params", help="String of control settings")
    parser.add_argument("inputs", nargs="+", help="List of input files")
    args = parser.parse_args()
    print("args =", args)

    wrapper = partial(process_one_file, args.inputs, args.effect, args.params)
    with mp.Pool(mp.cpu_count()) as pool:
        results = pool.map(wrapper, range(len(args.inputs)))
    pranges = results[-1] if results else []

    print("\n\nCopy & paste the following to use as effect_info.ini file:\n")
    n_ranges = args.params.count(",")
    if n_ranges > 1:
        knob_names = [f"p{n}" for n in range(n_ranges)]
        knob_ranges = pranges
    else:
        knob_names = "['p1']"
        knob_ranges = "[[.999, 1.001]]"
    print(f"[effect]\nname = sox_{args.effect}\nknob_names = {knob_names}\n"
          f"knob_ranges = {knob_ranges}")


if __name__ == "__main__":
    main()
