"""Voice-conversion one-to-one paired dataset (ref segan/datasets/vc_dataset.py:12-69)."""
from __future__ import annotations

import glob
import os
from typing import List

import numpy as np

from .wav_io import read_wav_raw
from ..ops.signal import normalize_wave_minmax, pre_emphasize_np


def varlen_wav_collate(batch):
    """Zero-pad-to-max collate (ref vc_dataset.py:12-35)."""
    srcs = []
    trgs = []
    for sample in batch:
        if len(sample) == 3:
            _, src, trg = sample
        else:
            src, trg = sample
        srcs.append(np.asarray(src, np.float32))
        trgs.append(np.asarray(trg, np.float32))
    src_max = max(s.shape[0] for s in srcs)
    trg_max = max(t.shape[0] for t in trgs)
    src_b = np.zeros((len(batch), src_max), np.float32)
    trg_b = np.zeros((len(batch), trg_max), np.float32)
    for i, (s, t) in enumerate(zip(srcs, trgs)):
        src_b[i, : s.shape[0]] = s
        trg_b[i, : t.shape[0]] = t
    return "", src_b, trg_b


class VCDataset:
    """One-to-one speaker mapping (ref vc_dataset.py:37-69)."""

    def __init__(self, src_path: str, trg_path: str, preemph: float = 0):
        self.preemph = preemph
        self.src_files: List[str] = sorted(glob.glob(os.path.join(src_path, "*.wav")))
        self.trg_files: List[str] = []
        for src_file in self.src_files:
            bname = os.path.basename(src_file)
            trg_file = os.path.join(trg_path, bname)
            assert os.path.exists(trg_file), trg_file
            self.trg_files.append(trg_file)

    def read_wav_file(self, path: str):
        rate, wav = read_wav_raw(path)
        wav = np.asarray(normalize_wave_minmax(np.asarray(wav)))
        return rate, pre_emphasize_np(wav, self.preemph)

    def __getitem__(self, index: int):
        src = self.read_wav_file(self.src_files[index])[1]
        trg = self.read_wav_file(self.trg_files[index])[1]
        return src, trg

    def __len__(self):
        return len(self.src_files)
