"""F0 (pitch) evaluation for the WSEGAN dewhispering research path.

Reference: segan/models/ops.py:51-260 (KLD, compute_MAE, compute_accuracy, F0Evaluator).
The reference extracts F0 by shelling out to the external `ahocoder` vocoder through temp
files (ops.py:86-103); here wav→lf0 goes through data/aco.py:wav2lf0, which uses ahocoder
when present and a built-in autocorrelation tracker otherwise.
"""
from __future__ import annotations

import multiprocessing as mp
from typing import Optional, Tuple

import numpy as np

from ..data.aco import wav2lf0, read_aco_file, interpolation


def KLD(mean_p, std_p, mean_g, std_g):
    """KL divergence of two normals (ref ops.py:51-63)."""
    var_p = std_p**2
    var_g = std_g**2
    num = var_p + (mean_p - mean_g) ** 2
    return np.log(std_g / std_p + 1e-22) + (num / (2 * var_g + 1e-22)) - 0.5


def compute_MAE(v_lf0: np.ndarray, v_ref_lf0: np.ndarray, mask: np.ndarray):
    """Masked mean-abs error in linear F0 (ref ops.py:65-79)."""
    v_lf0 = np.atleast_2d(v_lf0)
    v_ref_lf0 = np.atleast_2d(v_ref_lf0)
    mask = np.atleast_2d(mask)
    L = min(mask.shape[1], v_lf0.shape[1], v_ref_lf0.shape[1])
    v_lf0, v_ref_lf0, mask = v_lf0[:, :L], v_ref_lf0[:, :L], mask[:, :L]
    abs_dif = np.abs(np.exp(v_lf0) - np.exp(v_ref_lf0)) * mask
    return np.sum(abs_dif, axis=1) / np.maximum(np.sum(mask, axis=1), 1e-12)


def compute_accuracy(uv: np.ndarray, ref_uv: np.ndarray):
    """Voicing-decision accuracy (ref ops.py:81-84)."""
    uv = np.atleast_2d(uv)
    ref_uv = np.atleast_2d(ref_uv)
    L = min(uv.shape[1], ref_uv.shape[1])
    return np.mean((uv[:, :L] == ref_uv[:, :L]).astype(np.float32), axis=1)


def _wav2lf0_job(wav):
    return wav2lf0(np.asarray(wav, np.float32))


class F0Evaluator:
    """Batch F0 eval: KLD of voiced-lf0 distributions + MAE + U/V accuracy
    (ref ops.py:115-260)."""

    def __init__(self, f0_gtruth_dir: Optional[str] = None, num_proc: int = 4):
        if f0_gtruth_dir is not None:
            # the reference raises NotImplementedError here too (ops.py:123)
            raise NotImplementedError(
                "preloaded F0 ground-truth dirs are not supported (as in the ref)")
        self.num_proc = num_proc
        self.pool: Optional[mp.pool.Pool] = None

    def _extract(self, wavs: np.ndarray):
        if self.num_proc > 1:
            if self.pool is None:
                self.pool = mp.Pool(self.num_proc)
            return self.pool.map(_wav2lf0_job, list(wavs))
        return [_wav2lf0_job(w) for w in wavs]

    def compute_KLD(self, v_lf0: np.ndarray, v_ref_lf0: np.ndarray):
        """Per-utterance distribution KLD (ref ops.py:141-167)."""
        mean_p = v_lf0.mean(axis=1)
        std_p = v_lf0.std(axis=1, ddof=1)
        mean_g = v_ref_lf0.mean(axis=1)
        std_g = v_ref_lf0.std(axis=1, ddof=1)
        return KLD(mean_p, std_p, mean_g, std_g), (std_p, std_g)

    def __call__(self, wavs: np.ndarray, ref_wavs: np.ndarray = None,
                 seqlens=None) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        assert ref_wavs is not None  # as in the ref (ops.py:192)
        wavs = np.asarray(wavs)
        ref_wavs = np.asarray(ref_wavs)
        assert wavs.ndim == 2, wavs.shape
        assert wavs.shape == ref_wavs.shape, ref_wavs.shape
        res = self._extract(wavs)
        ref_res = self._extract(ref_wavs)
        ilf0s = np.stack([r[0] for r in res])
        uvs = np.stack([r[1] for r in res])
        ref_ilf0s = np.stack([r[0] for r in ref_res])
        ref_uvs = np.stack([r[1] for r in ref_res])
        mask = ref_uvs  # (ref ops.py:238)
        kld, (std_p, _) = self.compute_KLD(ilf0s, ref_ilf0s)
        mae = compute_MAE(ilf0s, ref_ilf0s, mask)
        acc = compute_accuracy(uvs, ref_uvs)
        kld = kld[std_p > 0]  # filter zero-std predictions (ref ops.py:251-253)
        return kld, mae, acc
