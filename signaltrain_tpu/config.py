"""One typed, frozen configuration for a training run.

The reference threads ~15 loose values CLI -> train() kwargs -> st_model ->
checkpoint metadata (run_train.py:32-47 -> train.py:167-215 -> misc.py:28-34).
RunConfig is the single source of truth for that chain here: the CLI parses
into it, train_from_config() runs it, and its geometry fields are exactly the
ones compute_spec()/save_checkpoint() persist — so a new knob added in one
place cannot silently drift from the others (SURVEY.md §5 config note;
VERDICT r1 item 10).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from .models.st_model import ModelSpec, compute_spec


@dataclasses.dataclass(frozen=True)
class RunConfig:
    # effect / data
    effect_name: str = "comp_4c"
    datapath: str | None = None
    target_type: str = "stream"  # 'stream' or 'chunk' (run_train.py:44-46)
    compand: bool = False
    # schedule / optimization (reference defaults, run_train.py:35-41)
    epochs: int = 1000
    n_data_points: int = 200_000
    batch_size: int = 200
    lr_max: float = 1e-4
    # geometry (nn_proc.py:357-376)
    sr: int = 44100
    scale_factor: float = 1.0
    shrink_factor: float = 4.0
    # numerics / parallelism
    dtype: str = "bfloat16"
    seed: int = 218
    n_model: int = 1
    # checkpoints / observability
    in_checkpointname: str = "modelcheckpoint.tar"
    out_checkpointname: str = "modelcheckpoint.tar"
    cp_every: int = 25
    plot_every: int = 10
    status_every: int = 10
    make_plots: bool = True

    # ------------------------------------------------------------ derived

    def model_spec(self, num_knobs: int) -> ModelSpec:
        return compute_spec(
            scale_factor=self.scale_factor,
            shrink_factor=self.shrink_factor,
            num_knobs=num_knobs,
            sr=self.sr,
        )

    def compute_dtype(self) -> Any:
        import jax.numpy as jnp

        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.dtype]

    @classmethod
    def from_args(cls, args) -> "RunConfig":
        """argparse namespace (run_train.py's flag surface) -> RunConfig."""
        return cls(
            effect_name=args.effect,
            datapath=args.path,
            target_type=args.target,
            compand=args.compand,
            epochs=args.epochs,
            n_data_points=args.num,
            batch_size=args.batch,
            lr_max=args.lrmax,
            sr=args.sr,
            scale_factor=args.scale,
            shrink_factor=args.shrink,
            dtype=args.dtype,
            seed=args.seed,
            n_model=args.nmodel,
            in_checkpointname=args.checkpoint,
            out_checkpointname=getattr(args, "out_checkpoint", None)
            or args.checkpoint,
        )

    def replace(self, **kw) -> "RunConfig":
        return dataclasses.replace(self, **kw)


def train_from_config(cfg: RunConfig, effect=None):
    """Build the effect and run training from one RunConfig."""
    from .dsp import effects as fx
    from .training import train as trainlib

    if effect is None:
        effect = fx.make_effect(cfg.effect_name, path=cfg.datapath, sr=cfg.sr)
    return trainlib.train(
        effect,
        epochs=cfg.epochs,
        n_data_points=cfg.n_data_points,
        batch_size=cfg.batch_size,
        plot_every=cfg.plot_every,
        cp_every=cfg.cp_every,
        sr=cfg.sr,
        datapath=cfg.datapath,
        scale_factor=cfg.scale_factor,
        shrink_factor=cfg.shrink_factor,
        target_type=cfg.target_type,
        lr_max=cfg.lr_max,
        in_checkpointname=cfg.in_checkpointname,
        out_checkpointname=cfg.out_checkpointname,
        compand=cfg.compand,
        compute_dtype=cfg.compute_dtype(),
        seed=cfg.seed,
        n_model=cfg.n_model,
        status_every=cfg.status_every,
        make_plots=cfg.make_plots,
    )
