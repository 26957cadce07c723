from .config import SEGANConfig, load_train_opts, dump_train_opts  # noqa: F401
from .checkpoint import Saver, save_pytree, load_pytree, load_torch_generator  # noqa: F401
