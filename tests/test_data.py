"""Data-pipeline tests: SEDataset slicing/caching, loader masking, augmentation,
aco/F0 path, resume round-trip."""
import json
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def wav_dirs(tmp_path_factory):
    """6 paired clean/noisy int16 wavs of varying length (incl. one short one)."""
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("data")
    clean_d = root / "clean"
    noisy_d = root / "noisy"
    clean_d.mkdir()
    noisy_d.mkdir()
    rng = np.random.RandomState(0)
    lengths = [24000, 20000, 18000, 17000, 16500, 9000]
    for i, L in enumerate(lengths):
        t = np.arange(L) / 16000.0
        c = 0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t)
        n = c + 0.05 * rng.randn(L)
        wavfile.write(str(clean_d / f"utt{i}.wav"), 16000,
                      (c * 32767).astype(np.int16))
        wavfile.write(str(noisy_d / f"utt{i}.wav"), 16000,
                      np.clip(n * 32767, -32768, 32767).astype(np.int16))
    return str(clean_d), str(noisy_d), str(root)


class TestSEDataset:
    def test_slicing_counts_and_shapes(self, wav_dirs, tmp_path):
        from segan_pytorch_tpu.data import SEDataset

        clean_d, noisy_d, _ = wav_dirs
        ds = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "c"),
                       slice_size=16384, stride=0.5)
        # per-file slice count: 1 + (L - 16384)//8192 for L >= 16384, else 0
        expect = sum(1 + (L - 16384) // 8192 for L in
                     [24000, 20000, 18000, 17000, 16500] if L >= 16384)
        assert len(ds) == expect
        s = ds[0]
        assert s["clean"].shape == (16384,)
        assert s["noisy"].shape == (16384,)
        # cache reload path
        ds2 = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "c"),
                        slice_size=16384, stride=0.5)
        assert len(ds2) == len(ds)

    def test_met_sidecar(self, wav_dirs, tmp_path):
        from segan_pytorch_tpu.data import SEDataset

        clean_d, noisy_d, _ = wav_dirs
        with open(os.path.join(noisy_d, "utt0.met"), "w") as f:
            json.dump({"pesq": 2.3, "ssnr": 5.0}, f)
        try:
            ds = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "m"),
                           slice_size=16384, stride=0.5)
            hits = [ds[i] for i in range(len(ds)) if ds[i]["uttname"] == "utt0"]
            assert hits and hits[0]["pesq"] == 2.3
        finally:
            os.unlink(os.path.join(noisy_d, "utt0.met"))

    def test_random_chunk_dataset(self, wav_dirs):
        from segan_pytorch_tpu.data import RandomChunkSEDataset

        clean_d, noisy_d, _ = wav_dirs
        ds = RandomChunkSEDataset(clean_d, noisy_d, 0.95, slice_size=16384)
        assert len(ds) == 6
        s = ds[5]  # the 9000-sample utterance -> zero-padded to slice_size
        assert s["clean"].shape == (16384,)
        assert np.allclose(s["clean"][-1000:], 0)


class TestLoader:
    def test_order_determinism_and_masking(self, wav_dirs, tmp_path):
        from segan_pytorch_tpu.data import SEDataset, DataLoader

        clean_d, noisy_d, _ = wav_dirs
        ds = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "l"),
                       slice_size=16384, stride=0.5)
        dl1 = DataLoader(ds, batch_size=3, shuffle=True, num_workers=3, seed=7)
        dl2 = DataLoader(ds, batch_size=3, shuffle=True, num_workers=1, seed=7)
        b1 = [b["uttname"] for b in dl1]
        b2 = [b["uttname"] for b in dl2]
        assert b1 == b2  # multi-worker emission order is deterministic
        last = list(dl1)[-1]
        assert last["clean"].shape[0] == 3  # padded to full batch
        assert last["mask"].sum() <= 3

    def test_sharded_loader_reassembles_global_batches(self, wav_dirs, tmp_path):
        """N sharded loaders (same seed) concatenated row-wise must equal the
        single-host loader exactly — including the padded ragged final batch and
        its mask. This is the multi-host data path (train.py shard_id/num_shards +
        make_array_from_process_local_data assembly)."""
        from segan_pytorch_tpu.data import SEDataset, DataLoader

        clean_d, noisy_d, _ = wav_dirs
        ds = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "s"),
                       slice_size=16384, stride=0.5)
        B, S = 4, 2
        ref = list(DataLoader(ds, batch_size=B, shuffle=True, seed=3))
        shards = [list(DataLoader(ds, batch_size=B, shuffle=True, seed=3,
                                  shard_id=s, num_shards=S)) for s in range(S)]
        assert all(len(sh) == len(ref) for sh in shards)
        for bi, gb in enumerate(ref):
            for key in ("clean", "noisy", "mask"):
                got = np.concatenate([shards[s][bi][key] for s in range(S)], axis=0)
                np.testing.assert_array_equal(got, gb[key], err_msg=f"{bi}/{key}")

    def test_sharded_loader_validates_args(self, wav_dirs, tmp_path):
        from segan_pytorch_tpu.data import SEDataset, DataLoader

        clean_d, noisy_d, _ = wav_dirs
        ds = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "v"),
                       slice_size=16384, stride=0.5)
        with pytest.raises(ValueError):
            DataLoader(ds, batch_size=5, num_shards=2)  # not divisible
        with pytest.raises(ValueError):
            DataLoader(ds, batch_size=4, num_shards=2, shard_id=2)
        with pytest.raises(ValueError):
            DataLoader(ds, batch_size=4, num_shards=2, pad_final=False)


class TestLoaderModes:
    def test_wav_header_sample_count(self, wav_dirs):
        """Header-only length == decoded length for 16 kHz PCM (the cold
        slice-index build path)."""
        from segan_pytorch_tpu.data.wav_io import (read_wav_16k,
                                                   wav_num_samples_16k)

        clean_d, _, _ = wav_dirs
        import glob as _glob

        for p in sorted(_glob.glob(os.path.join(clean_d, "*.wav"))):
            n_hdr = wav_num_samples_16k(p)
            n_dec = read_wav_16k(p, 16000)[0].shape[0]
            assert n_hdr == n_dec, p

    def test_wav_header_rejects_non_riff(self, tmp_path):
        from segan_pytorch_tpu.data.wav_io import wav_num_samples_16k

        p = tmp_path / "x.wav"
        p.write_bytes(b"NOTAWAVFILE")
        assert wav_num_samples_16k(str(p)) is None

    def test_shuffle_buffer_mode(self, wav_dirs, tmp_path):
        """Streaming shuffle: full coverage minus the ragged tail, bounded
        buffer, stable batch count, per-seed determinism."""
        from segan_pytorch_tpu.data import SEDataset, DataLoader

        clean_d, noisy_d, _ = wav_dirs
        ds = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "sb"),
                       slice_size=16384, stride=0.5)
        dl = DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                        shuffle_buffer=3)
        n_batches = len(dl)
        assert n_batches == len(ds) // 2
        seen = []
        for b in dl:
            assert b["clean"].shape == (2, 16384)
            assert b["mask"].tolist() == [1.0, 1.0]
            seen.append(b["slice_idx"].tolist())
        assert len(seen) == n_batches
        # two shards cover disjoint strided subsets with equal batch counts
        d0 = DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                        shuffle_buffer=3, shard_id=0, num_shards=2)
        d1 = DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                        shuffle_buffer=3, shard_id=1, num_shards=2)
        assert len(d0) == len(d1)

    def test_shuffle_buffer_global_mode_cross_shard_deterministic(
            self, wav_dirs, tmp_path):
        """shuffle_buffer_mode='global': the row-concatenation of the shards'
        batches is bit-identical to the single-host buffered loader (every
        shard replays the same buffered walk and slices its rows)."""
        from segan_pytorch_tpu.data import SEDataset, DataLoader

        clean_d, noisy_d, _ = wav_dirs
        ds = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "sbg"),
                       slice_size=16384, stride=0.5)
        ref = list(DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                              shuffle_buffer=3, shuffle_buffer_mode="global"))
        shards = [list(DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                                  shuffle_buffer=3,
                                  shuffle_buffer_mode="global",
                                  shard_id=s, num_shards=2))
                  for s in range(2)]
        assert len(shards[0]) == len(shards[1]) == len(ref)
        for r, b0, b1 in zip(ref, *shards):
            np.testing.assert_array_equal(
                r["clean"], np.concatenate([b0["clean"], b1["clean"]], axis=0))
            np.testing.assert_array_equal(
                r["noisy"], np.concatenate([b0["noisy"], b1["noisy"]], axis=0))
            assert r["uttname"] == b0["uttname"] + b1["uttname"]
        import pytest as _pytest

        with _pytest.raises(ValueError):
            DataLoader(ds, batch_size=2, shuffle_buffer=3,
                       shuffle_buffer_mode="bogus")

    def test_emit_dtype_bf16(self, wav_dirs, tmp_path):
        import jax.numpy as jnp

        from segan_pytorch_tpu.data import SEDataset, DataLoader

        clean_d, noisy_d, _ = wav_dirs
        ds = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "bf"),
                       slice_size=16384, stride=0.5)
        dl = DataLoader(ds, batch_size=2, shuffle=False, emit_dtype="bfloat16")
        b = next(iter(dl))
        assert b["clean"].dtype == jnp.bfloat16
        assert b["noisy"].dtype == jnp.bfloat16
        assert b["mask"].dtype == np.float32  # mask stays fp32

    def test_emit_dtype_bf16_h5(self, tmp_path):
        """emit_dtype covers the H5 path too (cast happens at the DataLoader,
        after any dataset gather)."""
        import h5py
        import jax.numpy as jnp

        from segan_pytorch_tpu.data import DataLoader
        from segan_pytorch_tpu.data.se_dataset import SEH5Dataset

        with h5py.File(str(tmp_path / "train.h5"), "w") as f:
            f.create_dataset("data", data=np.random.RandomState(0)
                             .randn(6, 1024).astype(np.float32))
            f.create_dataset("label", data=np.random.RandomState(1)
                             .randn(6, 1024).astype(np.float32))
        ds = SEH5Dataset(str(tmp_path), split="train", preemph=0.95)
        dl = DataLoader(ds, batch_size=3, shuffle=False, emit_dtype="bfloat16")
        b = next(iter(dl))
        assert b["clean"].dtype == jnp.bfloat16
        assert b["noisy"].dtype == jnp.bfloat16


class TestAdditive:
    def test_snr_scaling(self, tmp_path):
        from scipy.io import wavfile

        from segan_pytorch_tpu.data import Additive

        noise_dir = tmp_path / "noises"
        noise_dir.mkdir()
        rng = np.random.RandomState(0)
        wavfile.write(str(noise_dir / "n.wav"), 16000,
                      (0.1 * rng.randn(60000) * 32767).astype(np.int16))
        add = Additive(str(noise_dir), snr_levels=[5],
                       rng=np.random.RandomState(3))
        t = np.arange(20000) / 16000.0
        clean = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        noisy = add(clean)
        assert noisy.shape == clean.shape
        assert not np.allclose(noisy, clean)
        assert np.max(np.abs(noisy)) < 1.0  # anti-clip renorm

    def test_sedataset_transform_wiring(self, wav_dirs, tmp_path):
        """--noises_dir path: noisy regenerated from clean, '_additive' uttnames
        (so WSEGAN's additive-L1 mask engages), pre-emphasis applied after."""
        from scipy.io import wavfile

        from segan_pytorch_tpu.data import Additive, SEDataset
        from segan_pytorch_tpu.ops.signal import pre_emphasize_np

        clean_d, noisy_d, _ = wav_dirs
        noise_dir = tmp_path / "noises"
        noise_dir.mkdir()
        rng = np.random.RandomState(0)
        wavfile.write(str(noise_dir / "n.wav"), 16000,
                      (0.1 * rng.randn(60000) * 32767).astype(np.int16))
        add = Additive(str(noise_dir), snr_levels=[5],
                       rng=np.random.RandomState(3))
        ds = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "aug"),
                       slice_size=16384, stride=0.5, transform=add)
        s = ds[0]
        assert s["uttname"].endswith("_additive")
        assert s["clean"].shape == (16384,) and s["noisy"].shape == (16384,)
        assert not np.allclose(s["noisy"], s["clean"])
        # clean side must equal the preemph of the normalized clean slice
        w_i, t_i, cb, ce, *_ = ds.idx2slice[0]
        c_raw = ds.read_wav_file_norm(ds.clean_names[w_i])[cb:ce]
        np.testing.assert_allclose(s["clean"],
                                   pre_emphasize_np(c_raw, 0.95), rtol=1e-6)
        # the native gather fast path must decline (augmentation is per-item)
        assert ds.gather_batch([0, 1]) is None
        # incompatible with preemph_norm
        with pytest.raises(ValueError):
            SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "aug2"),
                      slice_size=16384, stride=0.5, transform=add,
                      preemph_norm=True)

    def test_asl_p56_matches_reference(self):
        """Golden parity of the vectorized P.56 active-speech-level vs the reference's
        per-sample loop (ref utils.py:180-253)."""
        import sys
        import types
        import importlib.util

        for name in ("numba", "soundfile", "librosa"):
            if name not in sys.modules:
                mod = types.ModuleType(name)
                if name == "numba":
                    mod.jit = lambda *a, **k: (lambda f: f)
                    mod.int32 = mod.float32 = None
                sys.modules[name] = mod
        spec = importlib.util.spec_from_file_location(
            "ref_segan_utils2", "/root/reference/segan/utils.py")
        ref_utils = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_utils)

        from segan_pytorch_tpu.data import Additive

        add = Additive.__new__(Additive)
        add.eps = 1e-22
        add.rng = np.random
        ref_add = ref_utils.Additive.__new__(ref_utils.Additive)
        ref_add.eps = 1e-22
        rng = np.random.RandomState(0)
        for seed in range(3):
            rng = np.random.RandomState(seed)
            active = 0.25 * rng.randn(8000)
            sig = np.concatenate([active, np.zeros(4000),
                                  0.1 * rng.randn(4000)]).astype(np.float64)
            mine = add.asl_P56(sig, 16000, 16)
            theirs = ref_add.asl_P56(sig, 16000, 16)
            np.testing.assert_allclose(mine[0], theirs[0], rtol=1e-6)
            np.testing.assert_allclose(mine[1], theirs[1], rtol=1e-6)
            np.testing.assert_allclose(mine[2], theirs[2], rtol=1e-6)


class TestAcoF0:
    def test_aco_roundtrip_and_interpolation(self, tmp_path):
        from segan_pytorch_tpu.data import read_aco_file, write_aco_file, interpolation

        lf0 = np.array([5.0, -1e10, -1e10, 5.6, 5.8, -1e10, 6.0], np.float32)
        p = str(tmp_path / "x.lf0")
        write_aco_file(p, lf0)
        back = read_aco_file(p)
        np.testing.assert_array_equal(back, lf0)
        ilf0, uv = interpolation(lf0, -10000000000)
        np.testing.assert_array_equal(uv, [1, 0, 0, 1, 1, 0, 1])
        assert 5.0 < ilf0[1] < 5.6 and 5.0 < ilf0[2] < 5.6
        assert 5.8 < ilf0[5] < 6.0

    def test_f0_autocorr_tracks_sine(self):
        from segan_pytorch_tpu.data.aco import f0_autocorr

        t = np.arange(16000) / 16000.0
        wav = 0.5 * np.sin(2 * np.pi * 200 * t)
        lf0, uv = f0_autocorr(wav.astype(np.float32))
        voiced = uv > 0
        assert voiced.mean() > 0.8
        f0 = np.exp(lf0[voiced])
        assert abs(np.median(f0) - 200) < 10

    def test_f0_evaluator(self):
        from segan_pytorch_tpu.metrics import F0Evaluator

        t = np.arange(16000) / 16000.0
        a = 0.5 * np.sin(2 * np.pi * 180 * t)
        b = 0.5 * np.sin(2 * np.pi * 200 * t)
        ev = F0Evaluator(num_proc=1)
        kld, mae, acc = ev(np.stack([a, a]), np.stack([a, b]))
        assert mae[0] < mae[1]  # identical pair has lower F0 error
        assert acc[0] >= acc[1] - 1e-6

    def test_f0_dataset(self, wav_dirs, tmp_path):
        from segan_pytorch_tpu.data import RandomChunkSEF0Dataset, write_aco_file
        from segan_pytorch_tpu.data.aco import f0_autocorr
        from segan_pytorch_tpu.data.wav_io import read_wav_16k

        clean_d, _, root = wav_dirs
        lf0_d = tmp_path / "lf0"
        lf0_d.mkdir()
        for f in sorted(os.listdir(clean_d)):
            wav, _ = read_wav_16k(os.path.join(clean_d, f))
            lf0, uv = f0_autocorr(wav)
            raw = np.where(uv > 0, lf0, -1e10).astype(np.float32)
            write_aco_file(str(lf0_d / (os.path.splitext(f)[0] + ".lf0")), raw)
        ds = RandomChunkSEF0Dataset(clean_d, str(lf0_d), preemph=0,
                                    slice_size=16384)
        s = ds[0]
        assert s["clean"].shape == (16384,)
        assert s["lf0"].shape == (16384 // 80 + 1,)
        assert s["uv"].shape == (16384 // 80 + 1,)


class TestResume:
    def test_resume_roundtrip(self, tmp_path):
        from segan_pytorch_tpu.utils.config import SEGANConfig
        from segan_pytorch_tpu.models import SEGAN
        from segan_pytorch_tpu.utils.checkpoint import Saver, flatten_tree

        cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16], genc_poolings=[4, 4],
                          z_dim=16, denc_fmaps=[8, 16], denc_poolings=[4, 4],
                          dpool_slen=64, batch_size=2,
                          save_path=str(tmp_path / "ck"))
        s = SEGAN(cfg)
        s.init_state(batch_size=2)
        s.prepare_train(2)
        rngnp = np.random.RandomState(0)
        clean = rngnp.randn(2, 1024, 1).astype(np.float32) * 0.1
        noisy = clean + 0.02 * rngnp.randn(2, 1024, 1).astype(np.float32)
        mask = np.ones((2,), np.float32)
        for i in range(3):
            s.train_step(clean, noisy, mask, jax.random.PRNGKey(i), 100.0)
        g_saver = Saver(cfg.save_path, max_ckpts=3, prefix="EOE_G-")
        d_saver = Saver(cfg.save_path, max_ckpts=3, prefix="EOE_D-")
        s.save(g_saver, d_saver, int(s.state.step))
        trained = flatten_tree(jax.device_get(s.state.g_params))

        s2 = SEGAN(cfg)
        s2.init_state(batch_size=2)
        step = s2.resume(cfg.save_path)
        assert step == 3
        assert int(s2.state.step) == 3
        restored = flatten_tree(jax.device_get(s2.state.g_params))
        for k in trained:
            np.testing.assert_array_equal(trained[k], restored[k])
        # optimizer state restored too (rmsprop nu accumulators non-zero)
        nus = [np.asarray(x) for x in jax.tree.leaves(
            jax.device_get(s2.state.g_opt)) if hasattr(x, "shape") and x.size > 1]
        assert any(np.any(x != 0) for x in nus)
        # and training continues from there
        s2.prepare_train(2)
        m, _, _ = s2.train_step(clean, noisy, mask, jax.random.PRNGKey(9), 100.0)
        assert int(s2.state.step) == 4


class TestNativeLoader:
    def test_native_batch_matches_python(self, wav_dirs, tmp_path):
        from segan_pytorch_tpu.data import SEDataset, DataLoader
        from segan_pytorch_tpu.data import native as native_mod

        clean_d, noisy_d, _ = wav_dirs
        ds = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "nat"),
                       slice_size=16384, stride=0.5)
        if not native_mod.available():
            pytest.skip("native lib unavailable")
        dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1)
        b_native = next(iter(dl))
        assert ds._native not in (None, False)  # fast path actually taken
        ds._native = False  # force python path
        dl2 = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1)
        b_py = next(iter(dl2))
        np.testing.assert_allclose(b_native["clean"], b_py["clean"], atol=2e-7)
        np.testing.assert_allclose(b_native["noisy"], b_py["noisy"], atol=2e-7)
        assert b_native["uttname"] == b_py["uttname"]
        np.testing.assert_array_equal(b_native["slice_idx"], b_py["slice_idx"])

    def test_io_threads_plumbed_to_engine(self, wav_dirs, tmp_path):
        """SEDataset(io_threads=N) reaches NativeAudioEngine (train.py
        --io_threads); a 1-thread pool must produce identical batches."""
        from segan_pytorch_tpu.data import SEDataset
        from segan_pytorch_tpu.data import native as native_mod

        if not native_mod.available():
            pytest.skip("native lib unavailable")
        clean_d, noisy_d, _ = wav_dirs
        ds1 = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "t1"),
                        slice_size=16384, stride=0.5, io_threads=1)
        dsN = SEDataset(clean_d, noisy_d, 0.95, cache_dir=str(tmp_path / "tN"),
                        slice_size=16384, stride=0.5)
        b1 = ds1.gather_batch([0, 1, 2, 3])
        bN = dsN.gather_batch([0, 1, 2, 3])
        assert b1 is not None and bN is not None
        np.testing.assert_array_equal(b1["clean"], bN["clean"])
        np.testing.assert_array_equal(b1["noisy"], bN["noisy"])


class TestH5Path:
    def test_make_h5_and_seh5dataset_roundtrip(self, wav_dirs, tmp_path):
        """tools/make_h5.py builds the {split}.h5 the reference consumes
        (ref se_dataset.py:527-568: 'data'=clean chunks, 'label'=noisy chunks);
        SEH5Dataset + DataLoader must serve fixed-shape batches from it."""
        import subprocess
        import sys

        from segan_pytorch_tpu.data import DataLoader
        from segan_pytorch_tpu.data.se_dataset import SEH5Dataset, SEDataset

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        clean_d, noisy_d, root = wav_dirs
        out = subprocess.run(
            [sys.executable, "tools/make_h5.py", "--clean_dir", clean_d,
             "--noisy_dir", noisy_d, "--out_dir", str(tmp_path),
             "--split", "train", "--slice_size", "4096", "--stride", "0.5"],
            cwd=repo, capture_output=True, text=True,
            env=dict(os.environ, SEGAN_TPU_PLATFORM="cpu", PYTHONPATH=repo))
        assert out.returncode == 0, out.stderr[-2000:]
        ds = SEH5Dataset(str(tmp_path), "train", preemph=0.95)
        assert len(ds) > 0
        s = ds[0]
        assert s["clean"].shape == (4096,) and s["noisy"].shape == (4096,)
        # chunk content parity with the wav-path dataset (same slicing chain)
        ref = SEDataset(clean_d, noisy_d, 0.95,
                        cache_dir=str(tmp_path / "cache"),
                        slice_size=4096, stride=0.5)
        assert len(ds) == len(ref)
        r0 = ref[0]
        np.testing.assert_allclose(s["clean"], r0["clean"], atol=1e-6)
        np.testing.assert_allclose(s["noisy"], r0["noisy"], atol=1e-6)
        batches = list(DataLoader(ds, batch_size=4, shuffle=False))
        assert batches[0]["clean"].shape == (4, 4096)
        assert batches[-1]["mask"].shape == (4,)

    def test_seh5dataset_random_scale(self, wav_dirs, tmp_path):
        import subprocess
        import sys

        from segan_pytorch_tpu.data.se_dataset import SEH5Dataset

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        clean_d, noisy_d, _ = wav_dirs
        subprocess.run(
            [sys.executable, "tools/make_h5.py", "--clean_dir", clean_d,
             "--noisy_dir", noisy_d, "--out_dir", str(tmp_path),
             "--split", "valid", "--slice_size", "4096"],
            cwd=repo, capture_output=True, text=True, check=True,
            env=dict(os.environ, SEGAN_TPU_PLATFORM="cpu", PYTHONPATH=repo))
        ds = SEH5Dataset(str(tmp_path), "valid", preemph=0.95,
                         random_scale=[2.0])
        base = SEH5Dataset(str(tmp_path), "valid", preemph=0.95)
        np.testing.assert_allclose(ds[0]["clean"], 2.0 * base[0]["clean"],
                                   rtol=1e-6)
