#!/usr/bin/env python3
"""Model internals visualization (reference: utils/viz.py).

The reference scoped an oscilloscope on live mic input (soundcard) and drew
every activation and weight matrix with OpenCV trackbar knobs. This
environment has no audio device, so input comes from a wav file or a synth
signal; the renderer is the same idea: run the model with return_acts=True
and tile every 1-D/2-D activation plus the four front-end weight matrices
into one image. With --interactive (and a display), OpenCV trackbars act as
knobs; otherwise a PNG is written per invocation.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _norm_img(a):
    a = np.asarray(a, np.float32)
    lo, hi = np.percentile(a, 1), np.percentile(a, 99)
    return np.clip((a - lo) / max(hi - lo, 1e-9), 0, 1)


def render_acts(acts, params, width=1600):
    """Tile activations + weights into one uint8 image (viz.py:108-193)."""
    import cv2

    tiles = []
    for a in acts:
        a = np.asarray(a)
        if a.ndim == 3:
            a = a[0]
        if a.ndim == 1:
            a = a[None, :]
        img = (_norm_img(a.T if a.shape[0] > a.shape[1] else a) * 255).astype(np.uint8)
        img = cv2.applyColorMap(img, cv2.COLORMAP_VIRIDIS)
        h = max(24, min(160, img.shape[0]))
        img = cv2.resize(img, (width, h))
        tiles.append(img)
        tiles.append(np.full((2, width, 3), 255, np.uint8))
    p = params["params"]
    for side in ("dft_analysis", "dft_synthesis"):
        for part in ("w_real", "w_imag"):
            img = (_norm_img(np.asarray(p[side][part])) * 255).astype(np.uint8)
            img = cv2.applyColorMap(img, cv2.COLORMAP_MAGMA)
            img = cv2.resize(img, (width, 160))
            tiles.append(img)
            tiles.append(np.full((2, width, 3), 255, np.uint8))
    return np.concatenate(tiles, axis=0)


def main():
    parser = argparse.ArgumentParser(
        description="Visualize model activations & weights",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("checkpoint", help="model checkpoint .tar")
    parser.add_argument("--audiofile", default=None,
                        help="input wav (default: synth box signal)")
    parser.add_argument("--knobs", default="",
                        help="comma-separated normalized knobs in [-0.5, 0.5]")
    parser.add_argument("--out", default="viz.png")
    parser.add_argument("--interactive", action="store_true",
                        help="OpenCV window with trackbar knobs (needs a display)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from signaltrain_tpu.data import audio_io
    from signaltrain_tpu.dsp import synths
    from signaltrain_tpu.utils.load_model import load_model

    model, params, rv = load_model(args.checkpoint)
    nk = len(rv["knob_names"])
    chunk = model.spec.in_chunk_size

    if args.audiofile:
        sig, _ = audio_io.read_audio_file(args.audiofile, sr=model.spec.sr)
        x = jnp.asarray(sig[:chunk])
        if x.shape[0] < chunk:
            x = jnp.pad(x, (0, chunk - x.shape[0]))
    else:
        t = jnp.arange(chunk, dtype=jnp.float32) / model.spec.sr
        x = synths.synth_input_sample(jax.random.PRNGKey(0), t, 4, t0_fac=0.3)

    knobs = (
        np.zeros(nk, np.float32)
        if args.knobs == ""
        else np.fromstring(args.knobs, dtype=np.float32, sep=",")
    )

    fwd = jax.jit(
        lambda p, xb, kb: model.module.apply(p, xb, kb, return_acts=True)
    )

    def frame(knobs_nn):
        y, mag, mag_hat, acts = fwd(
            params, x[None], jnp.asarray(knobs_nn, jnp.float32)[None]
        )
        return render_acts([x, *acts, y], params)

    if args.interactive:
        import cv2

        win = "signaltrain-tpu viz"
        cv2.namedWindow(win, cv2.WINDOW_NORMAL)
        for i, name in enumerate(rv["knob_names"]):
            cv2.createTrackbar(name, win, 50, 100, lambda v: None)
        while True:
            kn = np.array(
                [cv2.getTrackbarPos(n, win) / 100.0 - 0.5 for n in rv["knob_names"]],
                np.float32,
            )
            cv2.imshow(win, frame(kn))
            if cv2.waitKey(50) & 0xFF in (27, ord("q")):
                break
        cv2.destroyAllWindows()
    else:
        import cv2

        img = frame(knobs)
        cv2.imwrite(args.out, img)
        print(f"wrote {args.out} ({img.shape[1]}x{img.shape[0]})")


if __name__ == "__main__":
    main()
