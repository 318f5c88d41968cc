"""Reference-API facade for signaltrain.train."""

from .training.train import (  # noqa: F401
    make_eval_scan, make_eval_step, make_optimizer, make_train_multi_step,
    make_train_step, train,
)
