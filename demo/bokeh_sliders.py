"""Interactive knob-slider demo (reference: demo/bokeh_sliders.py).

Run with:  bokeh serve demo/bokeh_sliders.py
(requires bokeh; in environments without it, use demo/knob_sweep.py for the
headless equivalent).

An effect dropdown picks a checkpoint (comp_4c / denoise, reference
bokeh_sliders.py:93-99), an input dropdown picks a synthetic test signal, and
one slider per knob re-runs BOTH the true effect and the model on every
change, plotting input / target / predicted.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from signaltrain_tpu.dsp import effects as fx, synths
from signaltrain_tpu.utils.load_model import load_model

# checkpoint files per effect (reference keeps these in demo/)
EFFECT_CHECKPOINTS = {
    "comp_4c": os.environ.get("ST_DEMO_COMP4C", "model_comp4c_4k.tar"),
    "denoise": os.environ.get("ST_DEMO_DENOISE", "modelcheckpoint_denoise.tar"),
}
SIGNAL_CHOICES = {
    "sine": 0, "noisy sine": 1, "pluck": 2, "triangle": 3, "box": 4,
    "spikes": 5, "noisy box": 6, "noisy pluck": 7, "amp steps": 8, "sweep": 9,
}


class DemoState:
    def __init__(self, effect_name: str):
        self.effect_name = effect_name
        self.effect = fx.make_effect(effect_name)
        ckpt = EFFECT_CHECKPOINTS[effect_name]
        if not os.path.isabs(ckpt):  # relative names live next to this script
            here = os.path.join(os.path.dirname(os.path.abspath(__file__)), ckpt)
            ckpt = here if os.path.exists(here) else ckpt
        self.model, self.params, self.rv = load_model(ckpt)
        self.chunk = self.model.spec.in_chunk_size
        self.out_chunk = self.model.spec.out_chunk_size
        self.t = jnp.arange(self.chunk, dtype=jnp.float32) / self.model.spec.sr
        self.fwd = jax.jit(
            lambda p, x, k: self.model.module.apply(p, x, k)[0]
        )
        self.key = jax.random.PRNGKey(0)
        self.new_input("sine")

    def new_input(self, signal_name: str):
        self.key, sub = jax.random.split(self.key)
        chooser = SIGNAL_CHOICES[signal_name]
        self.x = synths.synth_input_sample(sub, self.t, chooser)

    def run(self, knobs_wc):
        knobs_wc = jnp.asarray(knobs_wc, jnp.float32)
        kr = jnp.asarray(self.effect.knob_ranges)
        knobs_nn = (knobs_wc - kr[:, 0]) / (kr[:, 1] - kr[:, 0]) - 0.5
        self.key, sub = jax.random.split(self.key)
        y_target, x_in = self.effect.go_wc(self.x, knobs_wc, key=sub)
        y_pred = self.fwd(self.params, x_in[None, :], knobs_nn[None, :])[0]
        return np.asarray(x_in), np.asarray(y_target), np.asarray(y_pred)


def main_bokeh():
    from bokeh.io import curdoc
    from bokeh.layouts import column, row
    from bokeh.models import ColumnDataSource, Select, Slider
    from bokeh.plotting import figure

    state = DemoState("comp_4c")

    src_in = ColumnDataSource(data=dict(x=[], y=[]))
    src_tg = ColumnDataSource(data=dict(x=[], y=[]))
    src_pr = ColumnDataSource(data=dict(x=[], y=[]))
    fig = figure(height=420, width=900, y_range=(-1, 1), title="signaltrain-tpu demo")
    fig.line("x", "y", source=src_in, color="blue", legend_label="Input")
    fig.line("x", "y", source=src_tg, color="red", legend_label="Target")
    fig.line("x", "y", source=src_pr, color="green", legend_label="Predicted")

    sliders = []

    def update_data(attr=None, old=None, new=None):
        knobs_wc = [s.value for s in sliders]
        x, y_t, y_p = state.run(knobs_wc)
        n = len(x)
        t_out = np.arange(n - len(y_p), n)
        src_in.data = dict(x=np.arange(n), y=x)
        src_tg.data = dict(x=np.arange(n), y=y_t)
        src_pr.data = dict(x=t_out, y=y_p)

    def build_sliders():
        sliders.clear()
        for name, (lo, hi) in zip(state.effect.knob_names, state.effect.knob_ranges):
            s = Slider(start=float(lo), end=float(hi),
                       value=float((lo + hi) / 2),
                       step=float((hi - lo) / 100), title=name)
            s.on_change("value", update_data)
            sliders.append(s)

    effect_select = Select(title="Effect", value="comp_4c",
                           options=list(EFFECT_CHECKPOINTS))
    signal_select = Select(title="Input signal", value="sine",
                           options=list(SIGNAL_CHOICES))

    def update_effect(attr, old, new):
        nonlocal state
        state = DemoState(new)
        build_sliders()
        relayout()
        update_data()

    def update_input(attr, old, new):
        state.new_input(new)
        update_data()

    effect_select.on_change("value", update_effect)
    signal_select.on_change("value", update_input)

    def relayout():
        curdoc().clear()
        curdoc().add_root(
            column(row(effect_select, signal_select), column(*sliders), fig)
        )

    build_sliders()
    relayout()
    update_data()


try:
    import bokeh  # noqa: F401

    main_bokeh()
except ImportError:
    if __name__ == "__main__":
        print("bokeh is not installed; run demo/knob_sweep.py for the "
              "headless demo, or pip install bokeh and use `bokeh serve`." )
