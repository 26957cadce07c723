from .composite import (  # noqa: F401
    SSNR,
    wss,
    llr,
    lpcoeff,
    CompositeEval,
    eval_composite,
    composite_helper,
)
from .pesq import PESQ  # noqa: F401
from .stoi import stoi  # noqa: F401
from .f0 import F0Evaluator, KLD, compute_MAE, compute_accuracy  # noqa: F401
