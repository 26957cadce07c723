"""Functional librosa stub: the reference only calls librosa.load(path, sr)
on 16 kHz PCM wavs (se_dataset.py:72,288, utils.py:408). Reproduces librosa's
float32 [-1,1) scaling for integer PCM via scipy; refuses silently-resampling
inputs instead of mis-scoring them."""
import numpy as np
from scipy.io import wavfile


def load(path, sr=22050, **kwargs):
    rate, data = wavfile.read(path)
    if sr is not None and rate != sr:
        raise ValueError(
            f"librosa stub cannot resample {path}: file rate {rate} != requested {sr}")
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:  # librosa returns mono by default
        data = data.mean(axis=1)
    return data, rate
