from .modules import (  # noqa: F401
    PReLU,
    BatchNorm1d,
    Conv1d,
    ConvTranspose1d,
    Linear,
    LayerNorm,
    GConv1DBlock,
    GDeconv1DBlock,
    SincConv,
    ResBlock1D,
    ResARModule,
    CombFilter,
    PostProcessingCombNet,
    Conv1DResBlock,
    pos_code,
)
from .generator import Generator, GSkip  # noqa: F401
from .generator1d import Generator1D, GBlock1D  # noqa: F401
from .discriminator import Discriminator  # noqa: F401
from .segan import SEGAN  # noqa: F401
from .wsegan import WSEGAN, AEWSEGAN  # noqa: F401
