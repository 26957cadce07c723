"""Chunk-parallel long-utterance enhancement over a device mesh.

The reference enhances long wavs by looping 16384-sample chunks sequentially on one
device (ref model.py:116-157). The TPU-native scaling of 'sequence length' (SURVEY §5):
the chunk grid is embarrassingly parallel, so we batch it and shard the chunk axis across
the 'data' mesh — N chips enhance one utterance ~N× faster with zero communication (the
only cross-chunk state, the de-emphasis IIR, runs after gathering).

Optional overlap-add mode enhances overlapping chunks and cross-fades them — this is an
extension over the reference (which hard-cuts chunk boundaries); it needs no halo
exchange because overlapping chunks are simply more (independent) rows in the grid.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.signal import de_emphasize_np


def _bucket_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length() if n > 1 else 1


def chunk_grid(wav: np.ndarray, slice_size: int, overlap: float = 0.0
               ) -> Tuple[np.ndarray, int, int]:
    """Split a 1-D wav into a (N, slice_size, 1) grid. overlap in [0, 0.5)."""
    T = wav.shape[0]
    hop = int(slice_size * (1.0 - overlap)) or slice_size
    n_chunks = max(1, -(-max(T - slice_size, 0) // hop) + 1)
    total = (n_chunks - 1) * hop + slice_size
    buf = np.zeros((total,), np.float32)
    buf[:T] = wav
    idx = np.arange(n_chunks)[:, None] * hop + np.arange(slice_size)[None, :]
    return buf[idx][..., None], hop, n_chunks


def overlap_add(chunks: np.ndarray, hop: int, T: int) -> np.ndarray:
    """Cross-fade overlapping enhanced chunks back into one waveform."""
    n, S = chunks.shape[0], chunks.shape[1]
    out = np.zeros(((n - 1) * hop + S,), np.float64)
    wsum = np.zeros_like(out)
    if hop >= S:
        win = np.ones((S,))
    else:
        # nonzero-endpoint hann ramps so every sample keeps positive total weight
        ramp = np.hanning(2 * (S - hop) + 2)[1:-1]
        w = np.ones((S,))
        w[: S - hop] = ramp[: S - hop]
        w[hop:] = ramp[S - hop:]
        win = w
    for i in range(n):
        out[i * hop : i * hop + S] += chunks[i, :, 0] * win
        wsum[i * hop : i * hop + S] += win
    out = out / np.maximum(wsum, 1e-8)
    return out[:T].astype(np.float32)


def enhance_sharded(segan, wav: np.ndarray, mesh=None, overlap: float = 0.0,
                    z: Optional[np.ndarray] = None) -> np.ndarray:
    """Enhance one (normalized + pre-emphasized) waveform with the chunk grid sharded
    over `mesh` (or segan.mesh). Returns the de-emphasized enhanced wav."""
    from .sharding import batch_sharding

    mesh = mesh if mesh is not None else segan.mesh
    wav = np.asarray(wav, np.float32).reshape(-1)
    T = wav.shape[0]
    S = segan.cfg.slice_size
    grid, hop, n_chunks = chunk_grid(wav, S, overlap)
    n_dev = mesh.devices.size if mesh is not None else 1
    n_padded = max(_bucket_pow2(n_chunks), n_dev)
    if n_padded % n_dev:
        n_padded = -(-n_padded // n_dev) * n_dev
    if n_padded > n_chunks:
        grid = np.concatenate(
            [grid, np.zeros((n_padded - n_chunks, S, 1), np.float32)], axis=0)
    if not segan.G.no_z:
        if z is None:
            zrow = np.asarray(segan.G.sample_z(
                jax.random.PRNGKey(segan.cfg.seed), (1, S, 1)))
        else:
            zrow = np.asarray(z).reshape(1, *np.asarray(z).shape[-2:])
        zb = jnp.asarray(np.tile(zrow, (n_padded, 1, 1)))
    else:
        zb = None
    x = jnp.asarray(grid)
    if mesh is not None:
        sh = batch_sharding(mesh)
        x = jax.device_put(x, sh)
        if zb is not None:
            zb = jax.device_put(zb, sh)
    out, _ = segan._gfwd_jit()(segan.state.g_params, segan.state.g_vars, x, zb)
    out = np.asarray(out[:n_chunks])  # don't fetch the padding rows
    if overlap > 0:
        merged = overlap_add(out, hop, T)
    else:
        merged = out.reshape(-1)[:T]
    return de_emphasize_np(merged, segan.preemph)
