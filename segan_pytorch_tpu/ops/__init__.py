from .conv import conv1d, conv_transpose1d, reflect_pad_1d  # noqa: F401
from .signal import (  # noqa: F401
    normalize_wave_minmax,
    denormalize_wave_minmax,
    pre_emphasize,
    de_emphasize,
    de_emphasize_np,
    pre_emphasize_np,
    make_div_n,
    slice_signal_indices,
)
from .stft import stft_mag, power_spectrum_db  # noqa: F401
from . import initializers  # noqa: F401
