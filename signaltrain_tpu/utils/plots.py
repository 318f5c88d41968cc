"""Training observability plots (reference: io_methods.py:397-498).

Same artifacts, same filenames: val_data_<i>.png triptychs (input / target /
target-vs-predicted with world-coordinate knob values in the title), mag.png /
mag_hat.png spectrogram images, and the four learned front-end weight-matrix
images conv_{anal,synth}_{real,imag}.png.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _savefig(filename):
    plt.savefig(filename)
    plt.close(plt.gcf())


def plot_valdata(
    x_val,
    knobs_val,
    y_val,
    y_val_hat,
    effect,
    epoch: int,
    loss_val: float,
    file_prefix: str = "val_data",
    num_plots: int = 50,
    target_size: int | None = None,
):
    """Input/target/predicted triptychs for the first num_plots val examples
    (io_methods.py:429-467)."""
    x_val = np.asarray(x_val)
    y_val = np.asarray(y_val)
    y_val_hat = np.asarray(y_val_hat)
    knobs_val = np.asarray(knobs_val)
    num_plots = min(num_plots, x_val.shape[0])

    x_size = x_val.shape[1]
    y_size = y_val.shape[1] if target_size is None else target_size
    t_small = range(x_size - y_size, x_size)
    for plot_i in range(num_plots):
        knobs_w = np.asarray(effect.knobs_wc(knobs_val[plot_i, :]))
        plt.figure(figsize=(6, 8))
        titlestr = f"{effect.name} Val data, epoch {epoch + 1}, loss_val = {float(loss_val):.3e}\n"
        titlestr += ", ".join(
            f"{name} = {knobs_w[i]:.2f}" for i, name in enumerate(effect.knob_names)
        )
        plt.suptitle(titlestr)
        plt.subplot(3, 1, 1)
        plt.plot(x_val[plot_i, :], "b", label="Input")
        plt.ylim(-1, 1)
        plt.xlim(0, x_size)
        plt.legend()
        plt.subplot(3, 1, 2)
        plt.plot(t_small, y_val[plot_i, -y_size:], "r", label="Target")
        plt.xlim(0, x_size)
        plt.ylim(-1, 1)
        plt.legend()
        plt.subplot(3, 1, 3)
        plt.plot(t_small, y_val[plot_i, -y_size:], "r", label="Target")
        plt.plot(
            t_small, y_val_hat[plot_i, -y_size:], c=(0, 0.5, 0, 0.85), label="Predicted"
        )
        plt.ylim(-1, 1)
        plt.xlim(0, x_size)
        plt.legend()
        _savefig(f"{file_prefix}_{plot_i}.png")


def plot_spectrograms(params, mag_val, mag_val_hat):
    """Magnitude spectrograms + learned front-end weights
    (io_methods.py:470-497)."""
    mag_val = np.asarray(mag_val)
    mag_val_hat = np.asarray(mag_val_hat)

    plt.figure()
    plt.imshow(mag_val[0].T, aspect="auto", origin="lower")
    plt.title("Initial magnitude")
    _savefig("mag.png")
    plt.figure()
    plt.imshow(mag_val_hat[0].T, aspect="auto", origin="lower")
    plt.title("Processed magnitude")
    _savefig("mag_hat.png")

    p = params["params"]
    for side, tag, title, offset in (
        ("dft_analysis", "anal_real", "Conv-Analysis Real", 1.0),
        ("dft_analysis", "anal_imag", "Conv-Analysis Imag", 0.0),
        ("dft_synthesis", "synth_real", "Conv-Synthesis Real", 0.0),
        ("dft_synthesis", "synth_imag", "Conv-Synthesis Imag", 0.0),
    ):
        part = "w_real" if "real" in tag else "w_imag"
        plt.matshow(np.asarray(p[side][part], dtype=float) + offset)
        plt.title(title)
        _savefig(f"conv_{tag}.png")
