"""Speech-enhancement datasets (layer L4).

Host-side pipeline producing fixed-shape float32 arrays for the statically-shaped jitted
TPU step.  Mirrors the reference's capability surface:

- SEDataset: paired clean/noisy wav dirs, 16384-sample slices at fractional stride, with a
  persistent slice-index cache (ref se_dataset.py:128-371).  The reference pickles per-file
  slice dicts (se_dataset.py:174-182); we store one compact JSON+NPZ index instead.
- SEH5Dataset: pre-chunked {split}.h5 with 'data'/'label' datasets (ref se_dataset.py:527-568).
- RandomChunkSEDataset: one random window per utterance per epoch (ref se_dataset.py:373-448).
"""
from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import random as _random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .wav_io import read_wav_16k, read_wav_raw, wav_num_samples_16k
from ..ops.signal import (
    normalize_wave_minmax,
    pre_emphasize_np,
    slice_signal_indices,
)


def _slice_index_job(args) -> List[Tuple[int, int]]:
    path, window_size, stride = args
    # slice indexing needs only the 16 kHz sample COUNT: a RIFF-header read
    # makes the cold cache build a metadata pass (no decode); fall back to the
    # full decode for non-16k / non-PCM files that read_wav_16k would resample
    n = wav_num_samples_16k(path)
    if n is None:
        wav, _ = read_wav_16k(path, 16000)
        n = wav.shape[0]
    return slice_signal_indices(n, window_size, stride)


def collate_batch(samples: Sequence[dict]) -> dict:
    """Stack a list of per-slice dicts into a batch dict of numpy arrays.

    Equivalent to the reference collate_fn keeping the uttname list alongside default
    tensor collation (ref se_dataset.py:21-29).
    """
    out = {
        "uttname": [s["uttname"] for s in samples],
        "clean": np.stack([s["clean"] for s in samples]).astype(np.float32),
        "noisy": np.stack([s["noisy"] for s in samples]).astype(np.float32),
        "slice_idx": np.asarray([s["slice_idx"] for s in samples], np.int32),
    }
    if samples and samples[0].get("pesq") is not None:
        out["pesq"] = np.asarray([s["pesq"] for s in samples], np.float32)
    if samples and samples[0].get("ssnr") is not None:
        out["ssnr"] = np.asarray([s["ssnr"] for s in samples], np.float32)
    return out


class SEDataset:
    """Paired clean/noisy slicing dataset (ref se_dataset.py:128-371)."""

    def __init__(
        self,
        clean_dir: str,
        noisy_dir: str,
        preemph: float,
        cache_dir: str = ".",
        split: str = "train",
        slice_size: int = 2**14,
        stride: float = 0.5,
        max_samples: Optional[int] = None,
        verbose: bool = False,
        slice_workers: int = 2,
        preemph_norm: bool = False,
        random_scale: Sequence[float] = (1,),
        transform=None,
        io_threads: int = 0,
    ):
        """transform: optional augmentor called as transform(clean_slice) -> noisy
        slice on the NORMALIZED (pre-pre-emphasis) clean signal; when set, the
        noisy input is regenerated from clean on the fly (data/augment.py
        Additive) and both sides are pre-emphasized afterwards. Augmented items
        get an '_additive'-suffixed uttname so WSEGAN's additive-L1 mask (ref
        model.py:657-665) engages automatically. Incompatible with preemph_norm
        (which pre-emphasizes before normalizing)."""
        if transform is not None and preemph_norm:
            raise ValueError(
                "transform (additive augmentation) operates on the normalized "
                "pre-pre-emphasis signal; preemph_norm inverts that order and is "
                "not supported together")
        self.transform = transform
        self.clean_names = sorted(glob.glob(os.path.join(clean_dir, "*.wav")))
        self.noisy_names = sorted(glob.glob(os.path.join(noisy_dir, "*.wav")))
        if verbose:
            print(
                f"Found {len(self.clean_names)} clean names and "
                f"{len(self.noisy_names)} noisy names"
            )
        if len(self.clean_names) != len(self.noisy_names) or len(self.clean_names) == 0:
            raise ValueError("No wav data found! Check your data path please")
        if max_samples is not None:
            self.clean_names = self.clean_names[:max_samples]
            self.noisy_names = self.noisy_names[:max_samples]
        self.cache_dir = cache_dir
        self.slice_size = slice_size
        self.stride = stride
        self.split = split
        self.preemph = preemph
        self.preemph_norm = preemph_norm
        self.random_scale = list(random_scale)
        self.slice_workers = slice_workers
        # native gather thread-pool size; 0 = hardware_concurrency (segan_io.cpp)
        self.io_threads = int(io_threads)
        self._wav_cache: Dict[str, np.ndarray] = {}

        os.makedirs(cache_dir, exist_ok=True)
        index_path = os.path.join(cache_dir, f"{split}_idx2slice.json")
        if not os.path.exists(index_path):
            self._prepare_slicing()
            with open(index_path, "w") as f:
                json.dump(self.idx2slice, f)
        else:
            with open(index_path, "r") as f:
                self.idx2slice = [tuple(t) for t in json.load(f)]
            print(f"Loaded {len(self.idx2slice)} idx2slice items")

    # ------------------------------------------------------------------
    def _prepare_slicing(self):
        """Slice every pair; drop slices shorter than 1024 samples
        (ref se_dataset.py:249-307, incl. the <1024 decimation at :277-279)."""
        args_c = [(n, self.slice_size, self.stride) for n in self.clean_names]
        args_n = [(n, self.slice_size, self.stride) for n in self.noisy_names]
        if self.slice_workers and self.slice_workers > 1:
            with mp.Pool(self.slice_workers) as pool:
                c_slices = pool.map(_slice_index_job, args_c)
                n_slices = pool.map(_slice_index_job, args_n)
        else:
            c_slices = [_slice_index_job(a) for a in args_c]
            n_slices = [_slice_index_job(a) for a in args_n]
        idx2slice = []
        for w_i, (c_sl, n_sl) in enumerate(zip(c_slices, n_slices)):
            for t_i, (c_ss, n_ss) in enumerate(zip(c_sl, n_sl)):
                if c_ss[1] - c_ss[0] < 1024:
                    continue
                idx2slice.append((w_i, t_i, int(c_ss[0]), int(c_ss[1]),
                                  int(n_ss[0]), int(n_ss[1])))
        self.idx2slice = idx2slice

    def read_wav_file(self, path: str) -> np.ndarray:
        """normalize then preemph by default; order inverted by preemph_norm
        (ref se_dataset.py:190-198)."""
        if path in self._wav_cache:
            return self._wav_cache[path]
        rate, wav = read_wav_raw(path)
        wav = np.asarray(wav)
        if self.preemph_norm:
            wav = pre_emphasize_np(wav.astype(np.float32), self.preemph)
            wav = np.asarray(normalize_wave_minmax(wav))
        else:
            wav = np.asarray(normalize_wave_minmax(wav))
            wav = pre_emphasize_np(wav, self.preemph)
        wav = wav.astype(np.float32)
        # small LRU-ish cache to avoid re-reading the same file for every slice
        # (loader workers share this dict: tolerate concurrent evictions)
        if len(self._wav_cache) > 64:
            try:
                self._wav_cache.pop(next(iter(self._wav_cache)))
            except (KeyError, StopIteration, RuntimeError):
                pass
        self._wav_cache[path] = wav
        return wav

    def read_wav_file_norm(self, path: str) -> np.ndarray:
        """Normalized-only read (no pre-emphasis) — the augmentation-domain signal."""
        key = path + "#norm"
        if key in self._wav_cache:
            return self._wav_cache[key]
        rate, wav = read_wav_raw(path)
        wav = np.asarray(normalize_wave_minmax(np.asarray(wav))).astype(np.float32)
        if len(self._wav_cache) > 64:
            try:
                self._wav_cache.pop(next(iter(self._wav_cache)))
            except (KeyError, StopIteration, RuntimeError):
                pass
        self._wav_cache[key] = wav
        return wav

    # ------------------------------------------------------------------
    def gather_batch(self, indices) -> Optional[dict]:
        """Native C++ fast path: decode+normalize+preemph+slice a whole batch in a
        thread pool (native/segan_io.cpp), bypassing the per-item Python loop.
        Returns None when unavailable (non-default preemph order, .met sidecars,
        random scaling, or the library failed to build) — callers fall back."""
        if self.preemph_norm or self.random_scale != [1] or self.transform is not None:
            return None
        if getattr(self, "_has_met", None) is None:
            self._has_met = any(
                glob.glob(os.path.join(os.path.dirname(n), "*.met"))
                for n in self.noisy_names[:1])
        if self._has_met:  # .met sidecars need the python metadata path
            return None
        if getattr(self, "_native", None) is None:
            try:
                from .native import NativeAudioEngine

                self._native = NativeAudioEngine(
                    threads=getattr(self, "io_threads", 0))
            except Exception:
                self._native = False
        if self._native is False:
            return None
        c_paths, n_paths, begs_c, ends_c, begs_n, ends_n = [], [], [], [], [], []
        uttnames, slice_ids = [], []
        for index in indices:
            w_i, t_i, cb, ce, nb, ne = self.idx2slice[index]
            c_paths.append(self.clean_names[w_i])
            n_paths.append(self.noisy_names[w_i])
            begs_c.append(cb); ends_c.append(ce)
            begs_n.append(nb); ends_n.append(ne)
            uttnames.append(
                os.path.splitext(os.path.basename(self.noisy_names[w_i]))[0])
            slice_ids.append(t_i)
        try:
            clean = self._native.gather(c_paths, begs_c, ends_c,
                                        self.slice_size, self.preemph)
            noisy = self._native.gather(n_paths, begs_n, ends_n,
                                        self.slice_size, self.preemph)
        except Exception:
            self._native = False
            return None
        return {"uttname": uttnames, "clean": clean, "noisy": noisy,
                "slice_idx": np.asarray(slice_ids, np.int32)}

    def __getitem__(self, index: int) -> dict:
        w_i, t_i, cb, ce, nb, ne = self.idx2slice[index]
        c_path = self.clean_names[w_i]
        n_path = self.noisy_names[w_i]
        bname = os.path.splitext(os.path.basename(n_path))[0]
        if self.transform is not None:
            # augmentation path: noisy is regenerated from the NORMALIZED clean
            # slice at a random SNR, then both sides are pre-emphasized
            c_raw = self.read_wav_file_norm(c_path)[cb:ce]
            n_raw = self.transform(c_raw)
            c_slice = pre_emphasize_np(c_raw, self.preemph)
            n_slice = pre_emphasize_np(np.asarray(n_raw, np.float32), self.preemph)
            bname = bname + "_additive"
        else:
            c_sig = self.read_wav_file(c_path)
            n_sig = self.read_wav_file(n_path)
            c_slice = c_sig[cb:ce]
            n_slice = n_sig[nb:ne]
        L = min(c_slice.shape[0], n_slice.shape[0])
        c_slice, n_slice = c_slice[:L], n_slice[:L]
        if c_slice.shape[0] < self.slice_size:
            pad = np.zeros((self.slice_size - c_slice.shape[0],), np.float32)
            c_slice = np.concatenate((c_slice, pad))
            n_slice = np.concatenate((n_slice, pad))
        pesq = ssnr = None
        met_path = os.path.join(os.path.dirname(n_path), bname + ".met")
        if os.path.exists(met_path):
            with open(met_path, "r") as f:
                met = json.load(f)
            pesq, ssnr = met["pesq"], met["ssnr"]
        rscale = _random.choice(self.random_scale)
        if rscale != 1:
            c_slice = rscale * c_slice
            n_slice = rscale * n_slice
        return {
            "uttname": bname,
            "clean": c_slice.astype(np.float32),
            "noisy": n_slice.astype(np.float32),
            "slice_idx": t_i,
            "pesq": pesq,
            "ssnr": ssnr,
        }

    def __len__(self):
        return len(self.idx2slice)


class SEH5Dataset:
    """Pre-chunked H5 pairs: {split}.h5 with 'data'/'label' (ref se_dataset.py:527-568)."""

    def __init__(
        self,
        data_root: str,
        split: str,
        preemph: float,
        verbose: bool = False,
        preemph_norm: bool = False,
        random_scale: Sequence[float] = (1,),
    ):
        import h5py

        h5_file = os.path.join(data_root, split + ".h5")
        if not os.path.exists(h5_file):
            raise FileNotFoundError(h5_file)
        self.f = h5py.File(h5_file, "r")
        ks = list(self.f.keys())
        assert "data" in ks, ks
        assert "label" in ks, ks
        if verbose:
            print(f"Found H5 file {h5_file} with {self.f['data'].shape[0]} samples")
        self.random_scale = list(random_scale)

    def __getitem__(self, index: int) -> dict:
        c = np.asarray(self.f["data"][index], np.float32)
        n = np.asarray(self.f["label"][index], np.float32)
        if c.ndim > 1:
            c = np.squeeze(c, axis=-1)
        if n.ndim > 1:
            n = np.squeeze(n, axis=-1)
        rscale = _random.choice(self.random_scale)
        if rscale != 1:
            c, n = rscale * c, rscale * n
        return {"uttname": "N/A", "clean": c, "noisy": n, "slice_idx": 0,
                "pesq": None, "ssnr": None}

    def __len__(self):
        return self.f["data"].shape[0]


class RandomChunkSEDataset:
    """One random slice per utterance per epoch (ref se_dataset.py:373-448)."""

    def __init__(
        self,
        clean_dir: str,
        noisy_dir: str,
        preemph: float,
        split: str = "train",
        slice_size: int = 2**14,
        max_samples: Optional[int] = None,
        utt2spk: Optional[str] = None,
        spk2idx: Optional[dict] = None,
    ):
        self.preemph = preemph
        self.slice_size = slice_size
        self.utt2spk = utt2spk
        self.spk2idx = spk2idx
        if self.utt2spk is not None and self.spk2idx is None:
            raise ValueError("Please specify spk2idx too with utt2spk!")
        if utt2spk is not None:
            self._read_utt2spk()
        self.samples = {}
        self.clean_names = sorted(glob.glob(os.path.join(clean_dir, "*.wav")))
        for c_i, cname in enumerate(self.clean_names):
            bname = os.path.basename(cname)
            self.samples[c_i] = {
                "clean": cname,
                "noisy": os.path.join(noisy_dir, bname),
            }

    def _read_utt2spk(self):
        utt2spk = {}
        with open(self.utt2spk, "r") as f:
            for line in f:
                parts = line.rstrip().split("\t")
                uttname = os.path.splitext(os.path.basename(parts[0]))[0]
                utt2spk[uttname] = parts[1]
        self.utt2spk = utt2spk

    def read_wav_file(self, path: str) -> np.ndarray:
        wav, _ = read_wav_16k(path, 16000)  # float in [-1,1] (ref se_dataset.py:408)
        return pre_emphasize_np(wav, self.preemph)

    def __getitem__(self, index: int) -> dict:
        sample = self.samples[index]
        bname = os.path.splitext(os.path.basename(sample["clean"]))[0]
        cwav = self.read_wav_file(sample["clean"])
        nwav = self.read_wav_file(sample["noisy"])
        min_L = min(cwav.shape[0], nwav.shape[0])
        slice_size = min(self.slice_size, min_L)
        beg = _random.randint(0, min_L - slice_size)
        cslice = cwav[beg : beg + self.slice_size]
        nslice = nwav[beg : beg + self.slice_size]
        if min_L < self.slice_size:
            cslice = np.concatenate(
                (cslice, np.zeros(self.slice_size - cslice.shape[0], np.float32))
            )
            nslice = np.concatenate(
                (nslice, np.zeros(self.slice_size - nslice.shape[0], np.float32))
            )
        out = {
            "uttname": bname,
            "clean": cslice.astype(np.float32),
            "noisy": nslice.astype(np.float32),
            "slice_idx": 0,
            "pesq": None,
            "ssnr": None,
        }
        if isinstance(self.utt2spk, dict):
            out["spkid"] = self.spk2idx[self.utt2spk[bname]]
        return out

    def __len__(self):
        return len(self.samples)


class RandomChunkSEF0Dataset:
    """Random-chunk SE dataset pairing clean wavs with F0 (.lf0) targets
    (ref se_dataset.py:450-525). The aco IO / unvoiced interpolation the reference
    takes from ahoproc_tools lives in data/aco.py here."""

    def __init__(self, clean_dir: str, noisy_dir: str, preemph: float = 0,
                 split: str = "train", slice_size: int = 2**14,
                 max_samples: Optional[int] = None):
        from .aco import read_aco_file, interpolation

        self._read_aco_file = read_aco_file
        self._interpolation = interpolation
        self.preemph = preemph
        self.slice_size = slice_size
        self.samples = {}
        self.clean_names = sorted(glob.glob(os.path.join(clean_dir, "*.wav")))
        for c_i, cname in enumerate(self.clean_names):
            bname = os.path.splitext(os.path.basename(cname))[0]
            self.samples[c_i] = {
                "clean": cname,
                "noisy": os.path.join(noisy_dir, bname) + ".lf0",
            }

    def read_wav_file(self, path: str) -> np.ndarray:
        from ..ops.signal import abs_normalize_wave_minmax

        rate, wav = read_wav_raw(path)
        wav = pre_emphasize_np(np.asarray(wav, np.float32), self.preemph)
        return np.asarray(abs_normalize_wave_minmax(wav), np.float32)

    def __getitem__(self, index: int) -> dict:
        sample = self.samples[index]
        bname = os.path.splitext(os.path.basename(sample["clean"]))[0]
        cwav = self.read_wav_file(sample["clean"])
        lf0 = self._read_aco_file(sample["noisy"])
        ilf0, uv = self._interpolation(lf0, -10000000000)
        ilf0 = np.where(ilf0 < -1000, np.log(60), ilf0)
        # EOS zero frame (ref se_dataset.py:488-490)
        ilf0 = np.concatenate((ilf0, np.zeros((1,), np.float32)))
        uv = np.concatenate((uv, np.zeros((1,), np.float32)))
        min_L = cwav.shape[0]
        slice_size = min(self.slice_size, min_L)
        beg = _random.randint(0, min_L - slice_size)
        cslice = cwav[beg : beg + self.slice_size]
        lf0slice = np.zeros(((self.slice_size // 80) + 1,), np.float32)
        uvslice = np.zeros(((self.slice_size // 80) + 1,), np.float32)
        ilf0_s = ilf0[beg // 80 : beg // 80 + (self.slice_size // 80) + 1]
        uv_s = uv[beg // 80 : beg // 80 + (self.slice_size // 80) + 1]
        lf0slice[: ilf0_s.shape[0]] = ilf0_s
        uvslice[: uv_s.shape[0]] = uv_s
        if min_L < self.slice_size:
            cslice = np.concatenate(
                (cslice, np.zeros((self.slice_size - cslice.shape[0],), np.float32)))
        return {"uttname": bname, "clean": cslice.astype(np.float32),
                "lf0": lf0slice, "uv": uvslice, "slice_idx": 0,
                "pesq": None, "ssnr": None}

    def __len__(self):
        return len(self.samples)
