#!/usr/bin/env python3
"""Long-audio inference CLI — mirrors utils/predict_long.py:101-243.

Loads a checkpoint (ours or a PyTorch reference .tar), runs streaming chunked
inference on a wav file, optionally generates streamed + chunked targets for
comparison, and writes pl_input/pl_pred/pl_st/pl_ct __knob-tagged wavs with
the prediction zero-padded at the head for alignment.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser(
        description="Runs NN inference on long audio clip",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("checkpoint", help="Name of model checkpoint .tar file")
    parser.add_argument("audiofile", help="Name of audio file to read")
    parser.add_argument(
        "-e", "--effect", help="Name of effect class for generating target", default=""
    )
    parser.add_argument("--knobs", help="String of knob/control settings", default="")
    parser.add_argument(
        "-c", "--compand", help="Turn on to use companded/decompanded audio",
        action="store_true",
    )
    parser.add_argument(
        "--pcm16",
        help="write 16-bit PCM output wavs; the prediction is converted on "
        "device and delivered as int16 — half the bytes over the host link, "
        "which bounds end-to-end latency on slow links",
        action="store_true",
    )
    args = parser.parse_args()
    print("args =", args)

    import jax
    import jax.numpy as jnp

    from signaltrain_tpu.data import audio_io
    from signaltrain_tpu.dsp import effects as fx
    from signaltrain_tpu.dsp.compressors import mu_decompand
    from signaltrain_tpu.inference import predict_long as pl
    from signaltrain_tpu.models.st_model import st_model
    from signaltrain_tpu.training import checkpoint as ckpt
    from signaltrain_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    print("Looking for checkpoint at", args.checkpoint)
    params, rv = ckpt.load_checkpoint(args.checkpoint, fatal=True)
    knob_names, knob_ranges = rv["knob_names"], np.asarray(rv["knob_ranges"])
    num_knobs = len(knob_names)
    sr = rv["sr"]
    print(f"Effect name = {rv.get('effect_name', '?')}")
    print(f"knob_names = {knob_names}")
    print(f"knob_ranges = {knob_ranges}")

    model = st_model(
        scale_factor=rv["scale_factor"],
        shrink_factor=rv["shrink_factor"],
        num_knobs=num_knobs,
        sr=sr,
    )
    chunk_size = model.spec.in_chunk_size
    out_chunk_size = model.spec.out_chunk_size
    print("out_chunk_size = ", out_chunk_size)

    infile = args.audiofile
    print("reading input file ", infile)
    signal, sr = audio_io.read_audio_file(infile, sr=sr)
    print("signal.shape = ", signal.shape)
    y_ct = None

    kr = knob_ranges
    if args.knobs == "":
        knobs_nn = np.zeros(num_knobs, np.float32)
        knobs_wc = np.array([(kr[i, 0] + kr[i, 1]) / 2 for i in range(num_knobs)])
    else:
        knobs_wc = np.fromstring(args.knobs, dtype=np.float32, sep=",")
        knobs_nn = (knobs_wc - kr[:, 0]) / (kr[:, 1] - kr[:, 0]) - 0.5
    print("knobs_wc  =", knobs_wc)
    print("knobs_nn  =", knobs_nn)

    do_target = args.effect != ""
    y_st = None
    if do_target:
        if args.effect == "files":
            target_file = infile.replace("input", "target").replace(".wav", "")
            target_file = glob.glob(target_file + "*")[0]
            print(" Reading target_file = ", target_file)
            y_st, _ = audio_io.read_audio_file(target_file)
            subs = target_file.replace(".wav", "").split("__")
            knobs_wc = np.array([float(x) for x in subs[1:]])
            print("inferred knobs_wc = ", knobs_wc)
        else:
            try:
                effect = fx.make_effect(args.effect, sr=sr)
            except ValueError:
                print("WARNING: That effect not implemented yet. Skipping target generation.")
                do_target = False
        if "comp" in args.effect:
            y_st, _ = effect.go_wc(
                jnp.asarray(signal), jnp.asarray(knobs_wc), key=jax.random.PRNGKey(0)
            )
            y_st = np.asarray(y_st)
            y_ct = pl.calc_ct(signal, effect, knobs_wc, out_chunk_size, chunk_size)

    # Dispatch the prediction ASYNC (device-resident result): the forward
    # pass and the device->host transfer then overlap the input/target wav
    # writing below, instead of serializing ahead of it. With --pcm16 (and
    # no compand post-processing) the result is converted to int16 on
    # device — half the bytes over the link, which is a hard ~35 MB/s pipe
    # on slow hosts (docs/PERF_PROFILE.md "Delivery").
    pull_int16 = args.pcm16 and not args.compand
    print("\nCalling predict_long()...")
    y_pred_dev = pl.predict_long(
        signal, knobs_nn, model, params, chunk_size, out_chunk_size, sr=sr,
        compand=args.compand, return_device=True,
        out_dtype="int16" if pull_int16 else None,
    )

    def maybe_pcm16(a):
        if not args.pcm16 or a.dtype == np.int16:
            return a
        return audio_io.to_pcm16(a)

    tagstr = "".join("__" + str(k) for k in knobs_wc)

    def write_artifacts(sig):
        # the input/streamed-target/chunked-target wavs (not the prediction)
        audio_io.write_audio_file(
            "pl_input" + tagstr + ".wav", maybe_pcm16(sig), sr=44100)
        if do_target and y_st is not None:
            audio_io.write_audio_file(
                "pl_st" + tagstr + ".wav", maybe_pcm16(y_st), sr=44100)
            if y_ct is not None:
                audio_io.write_audio_file(
                    "pl_ct" + tagstr + ".wav", maybe_pcm16(y_ct), sr=44100)

    if not args.compand:
        # input/targets don't depend on the prediction: write them while the
        # device computes and the prediction transfers (compand defers them —
        # decompanding is device math that would queue behind the forward)
        write_artifacts(signal)

    y_pred = np.asarray(y_pred_dev)  # the only blocking pull
    print("\n...Back. Output: y_pred.shape = ", y_pred.shape)

    if do_target and y_st is not None:
        print("y_st.shape = ", y_st.shape)
        print("diff in lengths = ", len(y_st) - len(y_pred))

    # zero-pad head to align with input & target (predict_long.py:221-223)
    y_out = np.zeros(len(signal), dtype=y_pred.dtype)
    y_out[-len(y_pred):] = y_pred

    if args.compand:
        print("De-companding outputs")
        signal = np.asarray(mu_decompand(signal))
        y_out = np.asarray(mu_decompand(y_out))
        write_artifacts(signal)

    audio_io.write_audio_file(
        "pl_pred" + tagstr + ".wav", maybe_pcm16(y_out), sr=44100)
    print("Finished.")


if __name__ == "__main__":
    main()
