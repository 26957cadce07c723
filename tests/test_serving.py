"""Serving-library tests (utils/serving.py): request micro-batching equality
and streaming-vs-offline enhancement equality."""
import threading

import numpy as np

import jax
import jax.numpy as jnp

from segan_pytorch_tpu.utils.config import SEGANConfig
from segan_pytorch_tpu.models import SEGAN
from segan_pytorch_tpu.ops.signal import pre_emphasize_np, de_emphasize_np
from segan_pytorch_tpu.parallel.inference import chunk_grid, overlap_add
from segan_pytorch_tpu.utils.serving import (MicroBatcher, StreamingEnhancer,
                                              WindowBatcher)
import pytest

pytestmark = pytest.mark.quick


def tiny_engine():
    cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32],
                      genc_poolings=[4, 4, 4], z_dim=32,
                      denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                      dpool_slen=16, batch_size=1,
                      save_path="/tmp/serving_test")
    segan = SEGAN(cfg)
    segan.init_state(batch_size=1)
    return segan


def raw_wav(n=2500, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.02 * rng.randn(n)).astype(np.float32)


class TestMicroBatcher:
    def test_batched_equals_direct_generate(self):
        """A forced multi-request batch must reproduce each request's direct
        segan.generate output exactly (row-independent inference math)."""
        segan = tiny_engine()
        wavs = [pre_emphasize_np(raw_wav(n, seed=i), 0.95)
                for i, n in enumerate((2500, 1024, 3333))]
        direct = [segan.generate(w, rng=jax.random.PRNGKey(10 + i))[0]
                  for i, w in enumerate(wavs)]

        batcher = MicroBatcher(segan)
        try:
            # force coalescing: enqueue all jobs while holding the cv so the
            # worker drains them as ONE batch
            from segan_pytorch_tpu.utils.serving import _Job

            jobs = [_Job(w, jax.random.PRNGKey(10 + i), 0.0)
                    for i, w in enumerate(wavs)]
            with batcher._cv:
                batcher._queue.extend(jobs)
                batcher._cv.notify()
            for j in jobs:
                assert j.event.wait(120)
                assert j.error is None, j.error
            assert batcher.batches == 1  # all three answered by one pass
            for j, d in zip(jobs, direct):
                np.testing.assert_allclose(j.result, d, atol=2e-6)
        finally:
            batcher.close()

    def test_adaptive_budget_from_measured_latency(self):
        """target_batch_seconds: the chunk budget follows the warm-batch
        latency EMA (clamped to [min_batch_chunks, max_batch_chunks]); cold
        (first-of-its-shape) batches must not feed the estimate."""
        segan = tiny_engine()
        batcher = MicroBatcher(segan, max_batch_chunks=64,
                               target_batch_seconds=0.5, min_batch_chunks=8)
        try:
            # no estimate yet -> fixed budget
            assert batcher.effective_max_chunks == 64
            wav = pre_emphasize_np(raw_wav(2048, seed=1), 0.95)
            batcher.enhance(wav, rng=jax.random.PRNGKey(0))
            # first pass of this shape = compile; EMA must stay unset
            assert batcher._sec_per_chunk is None
            batcher.enhance(wav, rng=jax.random.PRNGKey(1))
            assert batcher._sec_per_chunk is not None  # warm pass measured
            # budget math: 10 ms/chunk at a 0.5 s target -> 50 chunks
            batcher._sec_per_chunk = 0.01
            assert batcher.effective_max_chunks == 50
            batcher._sec_per_chunk = 10.0   # pathological latency -> floor
            assert batcher.effective_max_chunks == 8
            batcher._sec_per_chunk = 1e-6   # instant device -> hard cap
            assert batcher.effective_max_chunks == 64
            # the drain budget binds on the POST-padding (pow2-bucketed) row
            # count: at budget 50, admitting past 32 raw chunks would pad to
            # the 64-row bucket and overshoot the latency target
            from segan_pytorch_tpu.utils.serving import _Job

            batcher._sec_per_chunk = 0.01   # fit = 50
            one_chunk = np.zeros((16,), np.float32)
            with batcher._cv:
                batcher._queue.extend(_Job(one_chunk, None, 0.0)
                                      for _ in range(60))
                taken = batcher._drain_locked()
                rest = len(batcher._queue)
                batcher._queue.clear()
            assert len(taken) == 32, len(taken)
            assert rest == 28
            for j in taken:   # don't leave the worker waiting on drained jobs
                j.event.set()
        finally:
            batcher.close()

    def test_concurrent_enhance_threads(self):
        segan = tiny_engine()
        batcher = MicroBatcher(segan)
        try:
            wav = pre_emphasize_np(raw_wav(2000, seed=4), 0.95)
            results = [None] * 4

            def hit(i):
                results[i] = batcher.enhance(
                    wav, rng=jax.random.PRNGKey(7), overlap=0.0)

            ts = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=120)
            for r in results:
                assert r is not None and r.shape == (2000,)
                np.testing.assert_array_equal(r, results[0])  # same seed
        finally:
            batcher.close()


class TestMicroBatcherWSEGAN:
    def _engine(self):
        from segan_pytorch_tpu.models import WSEGAN

        cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32],
                          genc_poolings=[4, 4, 4], z_dim=32,
                          denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                          dpool_slen=16, batch_size=1, wsegan=True,
                          save_path="/tmp/serving_test_ws")
        m = WSEGAN(cfg)
        m.init_state(batch_size=1)
        return m

    def test_wsegan_route_equals_direct_generate(self):
        """A WSEGAN engine behind the MicroBatcher must serve the engine's own
        semantics (single full pass padded to /1024, ref model.py:755-766) —
        bit-identical to sequential WSEGAN.generate, including mixed
        seeded/unseeded requests drawing from the model stream in job order
        (not SEGAN's chunk-grid math)."""
        a, b = self._engine(), self._engine()  # same seed -> same params/stream
        wavs = [pre_emphasize_np(raw_wav(n, seed=i), 0.95)
                for i, n in enumerate((2500, 1024, 2500))]
        rngs = [None, jax.random.PRNGKey(30), None]
        direct = [a.generate(w, rng=r)[0] for w, r in zip(wavs, rngs)]

        batcher = MicroBatcher(b)
        try:
            from segan_pytorch_tpu.utils.serving import _Job

            jobs = [_Job(w, r, 0.0) for w, r in zip(wavs, rngs)]
            with batcher._cv:
                batcher._queue.extend(jobs)
                batcher._cv.notify()
            for j in jobs:
                assert j.event.wait(120)
                assert j.error is None, j.error
            assert batcher.batches == 1  # one coalescing event
            for j, d, w in zip(jobs, direct, wavs):
                assert j.result.shape == (w.shape[0],)
                np.testing.assert_array_equal(j.result, d)
        finally:
            batcher.close()

    def test_rngs_arg_validation(self):
        eng = self._engine()
        with pytest.raises(ValueError):
            eng.generate_batch([raw_wav(1000)], rng=jax.random.PRNGKey(0),
                               rngs=[jax.random.PRNGKey(1)])
        with pytest.raises(ValueError):
            eng.generate_batch([raw_wav(1000)], rngs=[])


class TestServedAEWSEGAN:
    """AEWSEGAN checkpoints must serve (ADVICE r3 high): train.py sets
    aewsegan with wsegan=False, so the engine builder must pick AEWSEGAN (which
    inherits WSEGAN's make_div_n generate semantics) and the MicroBatcher must
    route it through generate_batch — previously it built a plain SEGAN whose
    generate_batch lacks the rngs kwarg and every /enhance raised TypeError."""

    def _ckpt(self, tmp_path):
        from segan_pytorch_tpu.models import AEWSEGAN
        from segan_pytorch_tpu.utils.checkpoint import Saver

        cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32],
                          genc_poolings=[4, 4, 4], z_dim=32,
                          denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                          dpool_slen=16, batch_size=1, aewsegan=True,
                          opt="adam", save_path=str(tmp_path))
        m = AEWSEGAN(cfg)
        m.init_state(batch_size=1)
        gs = Saver(str(tmp_path), prefix="EOE_G-")
        m.save(gs, None, 1)
        gs.flush()
        with open(tmp_path / "train.opts", "w") as f:
            f.write(cfg.to_json())
        return tmp_path / "weights_EOE_G-Generator-1.ckpt", \
            tmp_path / "train.opts", m

    def test_engine_builder_selects_aewsegan(self, tmp_path):
        from segan_pytorch_tpu.models import AEWSEGAN
        from segan_pytorch_tpu.utils.engine import build_enhancement_engine

        ckpt, opts, _ = self._ckpt(tmp_path)
        cfg, eng = build_enhancement_engine(str(opts), str(ckpt), seed=7)
        assert isinstance(eng, AEWSEGAN)
        assert eng.D is None

    def test_microbatched_serving_equals_direct_generate(self, tmp_path):
        from segan_pytorch_tpu.utils.engine import build_enhancement_engine

        ckpt, opts, _ = self._ckpt(tmp_path)
        _, direct_eng = build_enhancement_engine(str(opts), str(ckpt), seed=7)
        _, served_eng = build_enhancement_engine(str(opts), str(ckpt), seed=7)
        wavs = [pre_emphasize_np(raw_wav(n, seed=i), 0.95)
                for i, n in enumerate((2500, 1024))]
        rngs = [jax.random.PRNGKey(41), None]
        direct = [direct_eng.generate(w, rng=r)[0]
                  for w, r in zip(wavs, rngs)]

        batcher = MicroBatcher(served_eng)
        try:
            from segan_pytorch_tpu.utils.serving import _Job

            jobs = [_Job(w, r, 0.0) for w, r in zip(wavs, rngs)]
            with batcher._cv:
                batcher._queue.extend(jobs)
                batcher._cv.notify()
            for j in jobs:
                assert j.event.wait(120)
                assert j.error is None, j.error
            for j, d, w in zip(jobs, direct, wavs):
                assert j.result.shape == (w.shape[0],)
                np.testing.assert_array_equal(j.result, d)
        finally:
            batcher.close()

    def test_adaptive_budget_live_for_wsegan_engines(self, tmp_path):
        """--target_batch_seconds must not be silently inert for the
        WSEGAN/AEWSEGAN route (ADVICE r3 low): after a warm repeat of the same
        padded-length bucket, the latency EMA must be populated."""
        ckpt, opts, _ = self._ckpt(tmp_path)
        from segan_pytorch_tpu.utils.engine import build_enhancement_engine

        _, eng = build_enhancement_engine(str(opts), str(ckpt), seed=7)
        batcher = MicroBatcher(eng, target_batch_seconds=0.5)
        try:
            w = pre_emphasize_np(raw_wav(2000, seed=3), 0.95)
            batcher.enhance(w, rng=jax.random.PRNGKey(0))  # cold: compiles
            assert batcher._sec_per_chunk is None
            batcher.enhance(w, rng=jax.random.PRNGKey(1))  # warm bucket
            assert batcher._sec_per_chunk is not None
            assert batcher.effective_max_chunks >= batcher.min_batch_chunks
        finally:
            batcher.close()


class TestWindowBatcher:
    """Concurrent streaming sessions share device passes (VERDICT r3 #4)."""

    def _direct(self, segan, wseg, z):
        x = jnp.asarray(wseg.reshape(1, -1, 1))
        out, _ = segan._gfwd_jit()(segan.state.g_params, segan.state.g_vars,
                                   x, z)
        return np.asarray(out)[0, :, 0]

    def test_coalesced_equals_per_session(self):
        """A forced 3-job batch = ONE device pass; each row matches that
        session's per-session (1, S, 1) forward within float tolerance (XLA
        retiles convs per batch shape — same tolerance as the MicroBatcher
        parity test), and a repeat of the SAME composition is bit-equal."""
        segan = tiny_engine()
        S = 1024
        wsegs = [raw_wav(S, seed=i) for i in range(3)]
        zs = [jnp.asarray(np.asarray(
            segan.G.sample_z(jax.random.PRNGKey(20 + i), (1, S, 1))))
            for i in range(3)]
        direct = [self._direct(segan, w, z) for w, z in zip(wsegs, zs)]

        wb = WindowBatcher(segan)
        try:
            from segan_pytorch_tpu.utils.serving import _WinJob

            def force_batch():
                jobs = [_WinJob(w, z) for w, z in zip(wsegs, zs)]
                with wb._cv:
                    wb._queue.extend(jobs)
                    wb._cv.notify()
                for j in jobs:
                    assert j.event.wait(120)
                    assert j.error is None, j.error
                return jobs

            before = wb.batches
            jobs = force_batch()
            assert wb.batches == before + 1   # one shared pass for 3 windows
            assert wb.windows == 3
            for j, d in zip(jobs, direct):
                np.testing.assert_allclose(j.result, d, atol=2e-6)
            # determinism: identical batch composition -> bit-identical rows
            jobs2 = force_batch()
            for a, b in zip(jobs, jobs2):
                np.testing.assert_array_equal(a.result, b.result)
        finally:
            wb.close()

    def test_mixed_window_sizes_never_share_a_pass(self):
        segan = tiny_engine()
        wb = WindowBatcher(segan)
        try:
            from segan_pytorch_tpu.utils.serving import _WinJob

            sizes = [1024, 2048, 1024, 2048]
            jobs = [_WinJob(raw_wav(s, seed=i),
                            jnp.asarray(np.asarray(segan.G.sample_z(
                                jax.random.PRNGKey(i), (1, s, 1)))))
                    for i, s in enumerate(sizes)]
            with wb._cv:
                wb._queue.extend(jobs)
                wb._cv.notify()
            for j in jobs:
                assert j.event.wait(120)
                assert j.error is None, j.error
            # one pass per distinct window length (compiled shapes differ)
            assert wb.batches == 2
            for j, s in zip(jobs, sizes):
                assert j.result.shape == (s,)
        finally:
            wb.close()

    def test_streaming_sessions_through_shared_batcher(self):
        """Full streams routed through a shared WindowBatcher reproduce the
        per-session StreamingEnhancer output (per-session z preserved), and
        concurrent same-shape hops coalesce."""
        segan = tiny_engine()
        wav_a, wav_b = raw_wav(2500, seed=1), raw_wav(2500, seed=2)
        rng_a, rng_b = jax.random.PRNGKey(3), jax.random.PRNGKey(4)

        def run(wav, rng, batcher):
            st = StreamingEnhancer(segan, window=1024, overlap=0.25, rng=rng,
                                   batcher=batcher)
            return np.concatenate([st.feed(wav), st.flush()])

        solo_a = run(wav_a, rng_a, None)
        solo_b = run(wav_b, rng_b, None)

        wb = WindowBatcher(segan)
        try:
            got = [None, None]
            ts = [threading.Thread(
                target=lambda i=i, w=w, r=r: got.__setitem__(
                    i, run(w, r, wb)))
                for i, (w, r) in enumerate(((wav_a, rng_a), (wav_b, rng_b)))]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=240)
            np.testing.assert_allclose(got[0], solo_a, atol=2e-6)
            np.testing.assert_allclose(got[1], solo_b, atol=2e-6)
            assert wb.windows >= 6  # 3 windows per 2500-sample stream each
        finally:
            wb.close()

    def test_batcher_engine_mismatch_rejected(self):
        a, b = tiny_engine(), tiny_engine()
        wb = WindowBatcher(a)
        try:
            with pytest.raises(ValueError):
                StreamingEnhancer(b, window=1024, batcher=wb)
        finally:
            wb.close()


class TestStreamingEnhancer:
    def _offline(self, segan, wav, window, overlap, rng):
        """The offline chunk_grid + overlap_add path with the session z."""
        pe = pre_emphasize_np(wav, segan.preemph)
        grid, hop, n = chunk_grid(pe, window, overlap)
        z = jnp.asarray(np.tile(
            np.asarray(segan.G.sample_z(rng, (1, window, 1))), (n, 1, 1)))
        out, _ = segan._gfwd_jit()(segan.state.g_params, segan.state.g_vars,
                                   jnp.asarray(grid), z)
        merged = overlap_add(np.asarray(out), hop, len(wav))
        return de_emphasize_np(merged, segan.preemph)

    def test_streaming_equals_offline(self):
        segan = tiny_engine()
        wav = raw_wav(2500, seed=1)
        rng = jax.random.PRNGKey(3)
        expected = self._offline(segan, wav, 1024, 0.25, rng)

        st = StreamingEnhancer(segan, window=1024, overlap=0.25, rng=rng)
        pieces, pos = [], 0
        # ragged feed sizes exercise the carried filter/window state
        for sz in (1, 700, 123, 900, 10**9):
            chunk = wav[pos: pos + sz]
            pos += len(chunk)
            pieces.append(st.feed(chunk))
        pieces.append(st.flush())
        got = np.concatenate(pieces)
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=2e-6)

    def test_streaming_no_overlap_short_input(self):
        """Input shorter than one window: everything arrives at flush()."""
        segan = tiny_engine()
        wav = raw_wav(700, seed=2)
        rng = jax.random.PRNGKey(9)
        expected = self._offline(segan, wav, 1024, 0.0, rng)
        st = StreamingEnhancer(segan, window=1024, overlap=0.0, rng=rng)
        a = st.feed(wav)
        assert a.size == 0  # window not complete yet
        b = st.flush()
        got = np.concatenate([a, b])
        np.testing.assert_allclose(got, expected, atol=2e-6)

    def test_bounded_latency_emission(self):
        """Samples must be emitted as soon as the covering window completes —
        not only at flush."""
        segan = tiny_engine()
        st = StreamingEnhancer(segan, window=1024, overlap=0.25,
                               rng=jax.random.PRNGKey(0))
        out1 = st.feed(raw_wav(1024, seed=3))  # first window complete
        assert out1.size == st.hop  # finalized up to the next window start
        out2 = st.feed(raw_wav(1024, seed=4))
        assert out2.size > 0

    def test_window_must_divide_pooling(self):
        segan = tiny_engine()
        import pytest

        with pytest.raises(ValueError):
            StreamingEnhancer(segan, window=1000)
        with pytest.raises(ValueError):
            StreamingEnhancer(segan, overlap=0.7)
