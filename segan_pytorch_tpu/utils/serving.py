"""Serving-side inference machinery: request micro-batching and streaming.

The reference stops at batch CLIs; this module completes the deployment story
(SURVEY L6) with two TPU-minded pieces:

- MicroBatcher: coalesces CONCURRENT enhancement requests into one device
  forward. One utterance's chunk grid already batches onto the MXU, but N
  concurrent clients would otherwise serialize N separate device passes behind
  the model lock; the batcher concatenates their chunk grids (row-independent
  math: inference BN uses running stats, z is per-request) and answers all of
  them with a single pass.

- StreamingEnhancer: incremental windowed enhancement with hann cross-fade
  (the overlap-add math of parallel/inference.py made stateful): audio is fed
  in arbitrary-sized pieces, pre-emphasis/de-emphasis run as causal streaming
  filters, and enhanced samples are emitted with bounded latency (a sample is
  final once the next window can no longer touch it — worst case
  window + hop samples of audio plus one forward).
"""
from __future__ import annotations

import threading
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..parallel.inference import chunk_grid, overlap_add, _bucket_pow2


class _Job:
    __slots__ = ("pwav", "rng", "overlap", "event", "result", "error")

    def __init__(self, pwav, rng, overlap):
        self.pwav = pwav
        self.rng = rng
        self.overlap = overlap
        self.event = threading.Event()
        self.result = None
        self.error = None


class MicroBatcher:
    """Coalesce concurrent generate() calls into one device batch.

    enhance() is a drop-in for segan.generate()[0]: it takes the normalized,
    pre-emphasized waveform and returns the de-emphasized enhanced waveform.
    Requests that arrive while a forward is in flight are batched into the
    next one (no artificial wait: the device itself provides the window).
    """

    def __init__(self, segan, max_batch_chunks: int = 128,
                 target_batch_seconds: float = 0.0,
                 min_batch_chunks: int = 8):
        """target_batch_seconds > 0 enables ADAPTIVE batch sizing: the chunk
        budget tracks measured device latency so one coalesced pass stays under
        the target (bounding the queueing delay a small request can suffer
        behind a giant one). Warm-up compiles are excluded from the estimate
        (a batch only updates the EMA when its padded-row bucket has run
        before). max_batch_chunks stays the hard cap."""
        self.segan = segan
        self.max_batch_chunks = max_batch_chunks
        self.target_batch_seconds = float(target_batch_seconds)
        self.min_batch_chunks = int(min_batch_chunks)
        self._sec_per_chunk: Optional[float] = None  # EMA over warm batches
        self._warm_buckets: set = set()
        self._queue: List[_Job] = []
        self._cv = threading.Condition()
        self._stop = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="microbatcher")
        self._worker.start()
        self.batches = 0          # observability: device passes issued
        self.requests = 0         # requests answered

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._worker.join(timeout=5)

    def enhance(self, pwav: np.ndarray, rng=None, overlap: float = 0.0,
                timeout: Optional[float] = 120.0) -> np.ndarray:
        job = _Job(np.asarray(pwav, np.float32).reshape(-1), rng, float(overlap))
        with self._cv:
            self._queue.append(job)
            self._cv.notify()
        if not job.event.wait(timeout):
            raise TimeoutError("enhancement request timed out")
        if job.error is not None:
            raise job.error
        return job.result

    # ------------------------------------------------------------------
    def _run(self):
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if self._stop:
                    for j in self._queue:
                        j.error = RuntimeError("batcher closed")
                        j.event.set()
                    return
                jobs = self._drain_locked()
            try:
                self._process(jobs)
            except Exception as e:  # pragma: no cover - defensive
                for j in jobs:
                    if not j.event.is_set():
                        j.error = e
                        j.event.set()

    @property
    def effective_max_chunks(self) -> int:
        """Current chunk budget: fixed, or latency-adapted when
        target_batch_seconds is set and a warm latency estimate exists."""
        if self.target_batch_seconds <= 0 or not self._sec_per_chunk:
            return self.max_batch_chunks
        fit = int(self.target_batch_seconds / self._sec_per_chunk)
        return max(self.min_batch_chunks, min(self.max_batch_chunks, fit))

    def _drain_locked(self) -> List[_Job]:
        """Take queued jobs up to the chunk budget (called with the lock).

        The budget is enforced on the POST-padding row count (_process pads the
        combined grid to a pow2 bucket, and the latency EMA is measured per
        padded row) — otherwise a pass admitted at `budget` raw chunks could pad
        up to ~2x past the latency target."""
        S = self.segan.cfg.slice_size
        budget = self.effective_max_chunks
        jobs, total = [], 0
        while self._queue:
            j = self._queue[0]
            n = max(1, -(-len(j.pwav) // S))
            if jobs and _bucket_pow2(total + n) > budget:
                break
            jobs.append(self._queue.pop(0))
            total += n
        return jobs

    def _process(self, jobs: List[_Job]):
        segan = self.segan
        from ..models import WSEGAN

        if isinstance(segan, WSEGAN):
            # WSEGAN/AEWSEGAN semantics are a single full-utterance pass
            # padded to /1024 (ref model.py:755-766), not a 16384 chunk grid —
            # route coalesced requests through the engine's own batched
            # generate so served output is bit-identical to clean.py's.
            # generate_batch groups rows by padded length; per-request seeds
            # ride the rngs list (None entries draw from the model stream).
            # (isinstance, not cfg flags: build_enhancement_engine decides the
            # engine class and AEWSEGAN sets aewsegan with wsegan=False.)
            t0 = time.perf_counter()
            results = segan.generate_batch(
                [j.pwav for j in jobs],
                rngs=None if segan.G.no_z else [j.rng for j in jobs])
            dt = time.perf_counter() - t0
            # keep --target_batch_seconds live for these engines: budget the
            # EMA in slice_size-equivalent rows (the unit _drain_locked
            # counts), warm-gated on the set of make_div_n padded lengths
            # (one XLA program per distinct padded length)
            S = segan.cfg.slice_size
            bucket = tuple(sorted({-(-len(j.pwav) // 1024) * 1024
                                   for j in jobs}))
            rows = sum(max(1, -(-len(j.pwav) // S)) for j in jobs)
            if bucket in self._warm_buckets:
                spc = dt / max(rows, 1)
                self._sec_per_chunk = (spc if self._sec_per_chunk is None
                                       else 0.7 * self._sec_per_chunk
                                       + 0.3 * spc)
            self._warm_buckets.add(bucket)
            self.batches += 1
            for j, (wav, _) in zip(jobs, results):
                j.result = wav  # generate_batch already de-emphasized
                self.requests += 1
                j.event.set()
            return
        S = segan.cfg.slice_size
        grids, metas, zrows = [], [], []
        for j in jobs:
            T = len(j.pwav)
            grid, hop, n_chunks = chunk_grid(j.pwav, S, j.overlap)
            metas.append((T, hop, n_chunks))
            grids.append(grid)
            if not segan.G.no_z:
                rng = j.rng
                if rng is None:
                    if segan._gen_rng is None:
                        segan._gen_rng = jax.random.PRNGKey(segan.cfg.seed)
                    segan._gen_rng, rng = jax.random.split(segan._gen_rng)
                # one z row per request, tiled over that request's chunks
                # (generate() semantics: chunks of one utterance share z).
                # Sampled AND tiled on device — np.asarray here cost a
                # synchronous D2H+H2D round trip per batch (the WindowBatcher
                # had the same defect, measured ~75 ms/pass on the dev tunnel)
                zrow = segan.G.sample_z(rng, (1, S, 1))
                zrows.append(jnp.tile(zrow, (n_chunks, 1, 1)))
        x = np.concatenate(grids, axis=0)
        n_rows = x.shape[0]
        # pad the COMBINED row count to a pow2 bucket: bounds compiled shapes
        n_padded = _bucket_pow2(n_rows)
        if n_padded > n_rows:
            x = np.concatenate(
                [x, np.zeros((n_padded - n_rows, S, 1), np.float32)], axis=0)
        zb = None
        if not segan.G.no_z:
            zb = zrows[0] if len(zrows) == 1 else jnp.concatenate(zrows, axis=0)
            if n_padded > n_rows:
                zb = jnp.concatenate(
                    [zb, jnp.zeros((n_padded - n_rows,) + zb.shape[1:],
                                   zb.dtype)], axis=0)
        t0 = time.perf_counter()
        out, _ = segan._gfwd_jit()(segan.state.g_params, segan.state.g_vars,
                                   jnp.asarray(x), zb)
        # fetch only the real rows (padding rows would double D2H at bucket
        # boundaries)
        out = np.asarray(out[:n_rows])
        dt = time.perf_counter() - t0
        # latency estimate for the adaptive budget: only batches whose padded
        # shape has run before (cold batches include the XLA compile)
        if n_padded in self._warm_buckets:
            spc = dt / n_padded
            self._sec_per_chunk = (spc if self._sec_per_chunk is None
                                   else 0.7 * self._sec_per_chunk + 0.3 * spc)
        self._warm_buckets.add(n_padded)
        self.batches += 1
        row = 0
        from ..ops.signal import de_emphasize_np

        for j, (T, hop, n_chunks) in zip(jobs, metas):
            chunks = out[row: row + n_chunks]
            row += n_chunks
            if j.overlap > 0:
                merged = overlap_add(chunks, hop, T)
            else:
                merged = chunks.reshape(-1)[:T]
            j.result = de_emphasize_np(merged, segan.preemph)
            self.requests += 1
            j.event.set()


class _WinJob:
    __slots__ = ("wseg", "z", "event", "result", "error")

    def __init__(self, wseg, z):
        self.wseg = wseg
        self.z = z
        self.event = threading.Event()
        self.result = None
        self.error = None


class WindowBatcher:
    """Coalesce concurrent StreamingEnhancer window forwards into shared
    device passes (VERDICT r3 #4: N streams used to cost N serialized passes
    per hop behind the model lock).

    Each streaming session submits one (window, z) pair per hop; jobs with the
    same window length S batch into one generator forward (rows padded to a
    pow2 bucket so compiled shapes stay bounded). Per-session z rides as that
    job's row, so session PRNG semantics are untouched. Row math is
    independent (inference BN uses running stats; no cross-row reduction in
    G), so a row's result equals the per-session (1, S, 1) forward up to XLA's
    batch-shape conv retiling (~1 ulp, same tolerance as the MicroBatcher
    path); for a FIXED batch composition results are exactly deterministic.
    Sessions with different window sizes never share a pass (different
    compiled shapes); the worker serves them in arrival order.
    """

    def __init__(self, segan, max_rows: int = 16):
        self.segan = segan
        self.max_rows = int(max_rows)
        self._queue: List[_WinJob] = []
        self._cv = threading.Condition()
        self._stop = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="windowbatcher")
        self._worker.start()
        self.batches = 0          # device passes issued
        self.windows = 0          # window forwards answered

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._worker.join(timeout=5)

    def warm(self, window: int, max_rows: Optional[int] = None):
        """Pre-compile the pow2 row buckets for `window` (serve.py calls this
        with the default window during --warm_seconds startup, so the first
        concurrent streams never pay an XLA compile mid-hop). Runs the passes
        inline on the caller's thread."""
        segan = self.segan
        rows, cap = 1, max_rows or self.max_rows
        while rows <= cap:
            x = jnp.zeros((rows, window, 1), jnp.float32)
            z = None
            if not segan.G.no_z:
                z = jnp.asarray(np.asarray(segan.G.sample_z(
                    jax.random.PRNGKey(0), (rows, window, 1))))
            out, _ = segan._gfwd_jit()(segan.state.g_params,
                                       segan.state.g_vars, x, z)
            jax.block_until_ready(out)
            rows *= 2

    def enhance_window(self, wseg: np.ndarray, z=None,
                       timeout: Optional[float] = 120.0) -> np.ndarray:
        """Blocking single-window forward; drop-in for the per-session
        ``_gfwd_jit()(params, vars, wseg[None, :, None], z)[0, :, 0]``."""
        job = _WinJob(np.asarray(wseg, np.float32).reshape(-1), z)
        with self._cv:
            self._queue.append(job)
            self._cv.notify()
        if not job.event.wait(timeout):
            raise TimeoutError("window enhancement timed out")
        if job.error is not None:
            raise job.error
        return job.result

    # ------------------------------------------------------------------
    def _run(self):
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if self._stop:
                    for j in self._queue:
                        j.error = RuntimeError("batcher closed")
                        j.event.set()
                    return
                jobs = self._drain_locked()
            try:
                self._process(jobs)
            except Exception as e:  # pragma: no cover - defensive
                for j in jobs:
                    if not j.event.is_set():
                        j.error = e
                        j.event.set()

    def _drain_locked(self) -> List[_WinJob]:
        """Take queued jobs sharing the head job's window length (one compiled
        shape per pass), up to max_rows; other lengths wait for the next pass."""
        S = self._queue[0].wseg.size
        jobs, rest = [], []
        for j in self._queue:
            if len(jobs) < self.max_rows and j.wseg.size == S:
                jobs.append(j)
            else:
                rest.append(j)
        self._queue = rest
        return jobs

    def _process(self, jobs: List[_WinJob]):
        segan = self.segan
        S = jobs[0].wseg.size
        x = np.stack([j.wseg for j in jobs])[..., None]       # (N, S, 1)
        n_rows = x.shape[0]
        n_padded = min(_bucket_pow2(n_rows), 1 << (self.max_rows - 1).bit_length())
        if n_padded > n_rows:
            x = np.concatenate(
                [x, np.zeros((n_padded - n_rows, S, 1), np.float32)], axis=0)
        zb = None
        if not segan.G.no_z:
            # Assemble z ON DEVICE: sessions hand a device-resident z (put once
            # at session start), so the batch z is a device concat — NOT a
            # per-pass host round trip. (np.asarray on a device z here cost a
            # synchronous D2H+H2D every hop — measured ~75 ms on the remote
            # dev tunnel, 2x the entire per-hop latency.)
            zs = [jnp.asarray(j.z) for j in jobs]
            zb = zs[0] if len(zs) == 1 else jnp.concatenate(zs, axis=0)
            if n_padded > n_rows:
                zb = jnp.concatenate(
                    [zb, jnp.zeros((n_padded - n_rows,) + zb.shape[1:],
                                   zb.dtype)], axis=0)
        out, _ = segan._gfwd_jit()(segan.state.g_params, segan.state.g_vars,
                                   jnp.asarray(x), zb)
        # fetch only the real rows — the pow2 padding rows would double the
        # D2H bytes at bucket boundaries
        out = np.asarray(out[: len(jobs)])
        self.batches += 1
        self.windows += len(jobs)
        for i, j in enumerate(jobs):
            j.result = out[i, :, 0]
            j.event.set()


class StreamingEnhancer:
    """Stateful incremental enhancement with hann cross-faded windows.

    feed(samples) accepts RAW normalized audio ([-1, 1] float) in pieces of any
    size and returns the newly-finalized enhanced samples; flush() drains the
    tail. Pre-emphasis and de-emphasis run as causal streaming filters across
    feed() boundaries, so the concatenated output equals the offline
    chunk_grid + overlap_add path on the same window/hop (same windows, same
    cross-fade weights, same per-session z).

    window must divide by the generator's total pooling (default: the training
    slice_size); smaller windows lower latency at slightly more compute —
    worst-case output latency is window + hop input samples plus one forward.
    """

    def __init__(self, segan, window: Optional[int] = None,
                 overlap: float = 0.25, rng=None,
                 batcher: Optional["WindowBatcher"] = None):
        if not 0.0 <= overlap < 0.5:
            raise ValueError(f"overlap must be in [0, 0.5), got {overlap}")
        if batcher is not None and batcher.segan is not segan:
            raise ValueError("batcher serves a different engine")
        self.batcher = batcher
        self.segan = segan
        S = int(window or segan.cfg.slice_size)
        pool = 1
        for p in segan.G.poolings:
            pool *= p
        if S % pool:
            raise ValueError(f"window {S} must divide by the generator's total "
                             f"pooling {pool}")
        self.S = S
        self.hop = int(S * (1.0 - overlap)) or S
        # one z per streaming session, shared by every window (generate()
        # shares z across one utterance's chunks; a stream is one utterance).
        # Device-resident, put ONCE here: both the solo path and the
        # WindowBatcher (device-side concat) reuse it with no per-hop transfer.
        self._z = None
        if not segan.G.no_z:
            if rng is None:
                rng = jax.random.PRNGKey(segan.cfg.seed)
            self._z = jnp.asarray(np.asarray(
                segan.G.sample_z(rng, (1, S, 1))))
        self._pe_buf = np.zeros((0,), np.float32)  # pre-emphasized input
        self._pe_prev = 0.0    # last raw sample (pre-emphasis state)
        self._de_prev = 0.0    # last output sample (de-emphasis state)
        self._n_in = 0         # raw samples fed
        self._next_win = 0     # index of the next window to enhance
        self._canvas = np.zeros((0,), np.float64)
        self._wsum = np.zeros((0,), np.float64)
        self._emitted = 0      # finalized samples handed back
        if self.hop >= S:
            self._win = np.ones((S,))
        else:
            ramp = np.hanning(2 * (S - self.hop) + 2)[1:-1]
            w = np.ones((S,))
            w[: S - self.hop] = ramp[: S - self.hop]
            w[self.hop:] = ramp[S - self.hop:]
            self._win = w

    @property
    def latency_samples(self) -> int:
        """Worst-case input-to-output latency in samples (plus one forward)."""
        return self.S + self.hop

    def feed(self, samples: np.ndarray) -> np.ndarray:
        x = np.asarray(samples, np.float32).reshape(-1)
        if x.size:
            # streaming pre-emphasis: y[t] = x[t] - c*x[t-1] across feed() calls
            c = self.segan.preemph
            shifted = np.concatenate(([self._pe_prev], x[:-1]))
            self._pe_buf = np.concatenate((self._pe_buf,
                                           x - np.float32(c) * shifted))
            self._pe_prev = float(x[-1])
            self._n_in += x.size
        return self._advance(final=False)

    def flush(self) -> np.ndarray:
        """Process the zero-padded tail and return everything not yet emitted."""
        return self._advance(final=True)

    # ------------------------------------------------------------------
    def _enhance_window(self, wseg: np.ndarray) -> np.ndarray:
        if self.batcher is not None:
            # shared pass with other concurrent sessions (same window length);
            # this session's z rides as its own row (device copy: the batcher
            # concatenates z on device, so no per-hop host round trip)
            return self.batcher.enhance_window(wseg, self._z)
        segan = self.segan
        x = jnp.asarray(wseg.reshape(1, self.S, 1))
        out, _ = segan._gfwd_jit()(segan.state.g_params, segan.state.g_vars,
                                   x, self._z)
        return np.asarray(out)[0, :, 0]

    def _grow(self, upto: int):
        if self._canvas.shape[0] < upto:
            pad = upto - self._canvas.shape[0]
            self._canvas = np.concatenate((self._canvas, np.zeros(pad)))
            self._wsum = np.concatenate((self._wsum, np.zeros(pad)))

    def _advance(self, final: bool) -> np.ndarray:
        S, hop = self.S, self.hop
        while True:
            beg = self._next_win * hop
            have = self._pe_buf.shape[0]
            # window-count rule identical to parallel/inference.chunk_grid:
            # a new window runs only while the processed ones don't yet cover
            # the input (smallest n with (n-1)*hop + S >= T)
            covered = -1 if self._next_win == 0 else (
                (self._next_win - 1) * hop + S)
            if covered >= max(self._n_in, 1):
                break
            if not final and have < beg + S:
                break
            wseg = np.zeros((S,), np.float32)
            seg = self._pe_buf[beg: beg + S]
            wseg[: seg.shape[0]] = seg
            enh = self._enhance_window(wseg)
            self._grow(beg + S)
            self._canvas[beg: beg + S] += enh * self._win
            self._wsum[beg: beg + S] += self._win
            self._next_win += 1
        # samples < next window's start can no longer change
        final_upto = self._n_in if final else min(self._next_win * hop,
                                                  self._n_in)
        if final_upto <= self._emitted:
            return np.zeros((0,), np.float32)
        self._grow(final_upto)
        seg = (self._canvas[self._emitted: final_upto]
               / np.maximum(self._wsum[self._emitted: final_upto], 1e-8))
        # streaming de-emphasis: y[t] = x[t] + c*y[t-1] carried across
        # emissions via lfilter's filter state (zi = c * y_prev)
        c = self.segan.preemph
        if c > 0:
            from scipy.signal import lfilter

            out, zf = lfilter([1.0], [1.0, -c], seg,
                              zi=np.asarray([c * self._de_prev]))
            self._de_prev = float(out[-1]) if out.size else self._de_prev
        else:
            out = seg
        self._emitted = final_upto
        return out.astype(np.float32)


__all__ = ["MicroBatcher", "StreamingEnhancer", "WindowBatcher"]
