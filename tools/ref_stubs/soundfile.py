"""soundfile stub: module import + sf.write only (reference clean.py --soundfile)."""
import numpy as np
from scipy.io import wavfile


def write(path, data, samplerate, **kwargs):
    data = np.asarray(data)
    if data.dtype.kind == "f":
        data = (np.clip(data, -1.0, 1.0) * 32767.0).astype(np.int16)
    wavfile.write(path, samplerate, data)


def read(path, **kwargs):
    rate, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    return data, rate
