"""Reference-API facade for signaltrain.misc (misc.py): checkpoint
save/load and the console banner."""

from .training.checkpoint import (  # noqa: F401
    load_checkpoint, save_checkpoint, params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from .utils.banner import print_choochoo  # noqa: F401
