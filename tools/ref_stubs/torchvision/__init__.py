"""torchvision stub: model.py imports torchvision.utils; only sample-plot
helpers (disabled via --no_train_gen) would call it."""
from . import utils  # noqa: F401
