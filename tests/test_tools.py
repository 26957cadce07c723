"""Tests for the remaining tool surfaces: eval_noisy_performance.py,
select_speakers.py, VCDataset/varlen collate, utils/profiling."""
import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.quick

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_wav(path, x, sr=16000):
    from scipy.io import wavfile

    wavfile.write(str(path), sr, (np.clip(x, -1, 1) * 32767).astype(np.int16))


@pytest.fixture()
def paired_dirs(tmp_path):
    clean_d = tmp_path / "clean"
    noisy_d = tmp_path / "noisy"
    clean_d.mkdir()
    noisy_d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        t = np.arange(12000) / 16000.0
        # speech-like (harmonics + noise floor): pure sines degenerate the LPC
        # inside LLR -> NaN CSIG/COVL, same as the reference would produce
        f0 = 120 + 30 * i
        c = sum((0.3 / k) * np.sin(2 * np.pi * k * f0 * t) for k in range(1, 5))
        c = c * 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t)) + 0.01 * rng.randn(12000)
        _write_wav(clean_d / f"u{i}.wav", c)
        _write_wav(noisy_d / f"u{i}.wav", c + 0.05 * rng.randn(12000))
    return clean_d, noisy_d


class TestEvalNoisyPerformance:
    def test_logfile_layout_and_values(self, paired_dirs, tmp_path):
        clean_d, noisy_d = paired_dirs
        log = tmp_path / "scores.log"
        env = dict(os.environ, SEGAN_TPU_PLATFORM="cpu", PYTHONPATH=REPO)
        out = subprocess.run(
            [sys.executable, "eval_noisy_performance.py",
             "--test_wavs", str(noisy_d), "--clean_wavs", str(clean_d),
             "--logfile", str(log)],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=500)
        assert out.returncode == 0, out.stderr[-2000:]
        lines = log.read_text().strip().splitlines()
        # reference-compatible layout: header + one row per wav
        assert lines[0].split() == ["FILE", "CSIG", "CBAK", "COVL", "PESQ", "SSNR"]
        assert len(lines) == 4
        for row in lines[1:]:
            cells = row.split()
            assert cells[0].endswith(".wav")
            vals = [float(v) for v in cells[1:]]
            assert len(vals) == 5
            assert all(np.isfinite(vals))
            assert vals[4] > 0  # mildly-noisy sines have positive SSNR

    def test_missing_reference_fails(self, paired_dirs, tmp_path):
        clean_d, noisy_d = paired_dirs
        os.unlink(clean_d / "u1.wav")
        env = dict(os.environ, SEGAN_TPU_PLATFORM="cpu", PYTHONPATH=REPO)
        out = subprocess.run(
            [sys.executable, "eval_noisy_performance.py",
             "--test_wavs", str(noisy_d), "--clean_wavs", str(clean_d),
             "--logfile", str(tmp_path / "x.log")],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=200)
        assert out.returncode != 0
        assert "no clean reference" in (out.stderr + out.stdout)


class TestSelectSpeakers:
    @pytest.fixture()
    def vctk_root(self, tmp_path):
        """Miniature VCTK layout: txt/<spk>/*.txt + speaker-info.txt."""
        root = tmp_path / "vctk"
        (root / "txt").mkdir(parents=True)
        rng = np.random.RandomState(1)
        n_spk = 40
        header = "ID  AGE  GENDER  ACCENTS  REGION\n"
        info = [header.rstrip()]
        texts = [f"sentence number {i} about things" for i in range(60)]
        for si in range(n_spk):
            spk = f"p{225 + si}"
            gender = "F" if si % 2 == 0 else "M"
            # speaker-info columns: ID AGE GENDER ... (load_spk2gen takes el[4]
            # of a space-split: 'p225 23  F  English  x' -> index juggling below)
            info.append(f"{225 + si}  23  {gender}  Eng  region")
            d = root / "txt" / spk
            d.mkdir()
            # overlapping texts for most, unique texts for a few (the best
            # held-out candidates)
            picks = rng.choice(len(texts), size=8, replace=False)
            for j, ti in enumerate(picks):
                body = texts[ti] if si >= 6 else f"unique {spk} line {j}"
                (d / f"{spk}_{j:03d}.txt").write_text(body + ".\n")
        (root / "speaker-info.txt").write_text("\n".join(info) + "\n")
        return root

    def test_split_properties(self, vctk_root, tmp_path):
        env = dict(os.environ, PYTHONPATH=REPO)
        out = subprocess.run(
            [sys.executable, "select_speakers.py",
             "--vctk_path", str(vctk_root), "--cache_dir", str(tmp_path / "c"),
             "--out_dir", str(tmp_path),
             "--test_files", "6", "--valid_files", "6"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=200)
        assert out.returncode == 0, out.stderr[-2000:]
        def rd(name):
            return (tmp_path / f"{name}_split.txt").read_text().split()
        test, valid, train = rd("test"), rd("valid"), rd("train")
        assert len(test) == 6 and len(valid) == 6
        all_spks = set(test) | set(valid) | set(train)
        assert len(all_spks) == len(test) + len(valid) + len(train)  # disjoint
        # 40 corpus speakers + the reference's hardcoded lost speaker p280
        # (ref select_speakers.py:32 defaults it into the gender map -> train)
        assert len(all_spks) == 41 and "280" in train

    def test_deterministic_under_seed(self, vctk_root, tmp_path):
        env = dict(os.environ, PYTHONPATH=REPO)
        outs = []
        for run in range(2):
            d = tmp_path / f"o{run}"
            d.mkdir()
            subprocess.run(
                [sys.executable, "select_speakers.py",
                 "--vctk_path", str(vctk_root),
                 "--cache_dir", str(tmp_path / f"c{run}"),
                 "--out_dir", str(d), "--test_files", "4",
                 "--valid_files", "4", "--seed", "7"],
                cwd=REPO, env=env, capture_output=True, text=True, check=True,
                timeout=200)
            outs.append(tuple((d / f"{n}_split.txt").read_text()
                              for n in ("train", "valid", "test")))
        assert outs[0] == outs[1]


class TestVCDataset:
    def test_pairing_and_varlen_collate(self, tmp_path):
        from segan_pytorch_tpu.data.vc_dataset import VCDataset, varlen_wav_collate

        src_d = tmp_path / "src"
        trg_d = tmp_path / "trg"
        src_d.mkdir()
        trg_d.mkdir()
        rng = np.random.RandomState(0)
        lens = [8000, 6000, 10000]
        for i, L in enumerate(lens):
            _write_wav(src_d / f"u{i}.wav", 0.2 * rng.randn(L))
            _write_wav(trg_d / f"u{i}.wav", 0.2 * rng.randn(L + 500))
        ds = VCDataset(str(src_d), str(trg_d), preemph=0.95)
        assert len(ds) == 3
        src, trg = ds[1]
        assert src.shape == (6000,) and trg.shape == (6500,)
        _, src_b, trg_b = varlen_wav_collate([ds[i] for i in range(3)])
        assert src_b.shape == (3, 10000)
        assert trg_b.shape == (3, 10500)
        # zero padding beyond each sample's true length
        assert np.allclose(src_b[1, 6000:], 0.0)

    def test_missing_target_asserts(self, tmp_path):
        from segan_pytorch_tpu.data.vc_dataset import VCDataset

        src_d = tmp_path / "s"
        trg_d = tmp_path / "t"
        src_d.mkdir()
        trg_d.mkdir()
        _write_wav(src_d / "a.wav", np.zeros(1000))
        with pytest.raises(AssertionError):
            VCDataset(str(src_d), str(trg_d))


class TestProfiling:
    def test_step_timer_running_stats(self):
        from segan_pytorch_tpu.utils.profiling import StepTimer

        t = StepTimer(window=3)
        for _ in range(5):
            t.start()
            time.sleep(0.01)
            t.stop()
        assert len(t.times) == 3  # window bound
        assert 0.005 < t.mean < 0.2
        assert t.last > 0

    def test_mfu_math(self):
        from segan_pytorch_tpu.utils import profiling

        # pin the peak for a deterministic check
        assert profiling.mfu(None, 0.1) is None
        assert profiling.mfu(1e12, 0.0) is None
        v = profiling.mfu(1e12, 0.1)
        if v is not None:  # CPU test runs have no known peak -> None is correct
            assert 0 < v < 1.1

    def test_compiled_flops_counts_matmul(self):
        import jax
        import jax.numpy as jnp

        from segan_pytorch_tpu.utils.profiling import compiled_flops

        f = jax.jit(lambda a, b: a @ b)
        a = jnp.ones((128, 128))
        flops = compiled_flops(f, a, a)
        if flops is not None:  # cost analysis availability is backend-dependent
            assert flops >= 2 * 128 ** 3 * 0.5  # within 2x of the exact count


class TestTrainThroughputBench:
    """Log-parse + steady-window math of tools/train_throughput_bench.py
    (the product-path throughput harness, BENCH.md r4)."""

    def _mod(self):
        import importlib

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        return importlib.import_module("train_throughput_bench")

    def test_log_re_matches_train_log_line(self):
        m = self._mod().LOG_RE.search(
            "(Iter 196) Batch 14/14 (Epoch 14) d_real:0.3458, d_fake:0.1781,"
            " g_adv:0.2010, g_l1:0.6792 l1_w: 100.00, btime: 0.0024 s,"
            " mbtime: 3.3281 s")
        assert m is not None
        assert tuple(map(int, m.groups())) == (196, 14, 14, 14)

    def test_steady_state_skips_compile_epochs(self):
        tb = self._mod()
        # epoch 1 is compile-slow (100 s); epochs 2.. run 14 steps / 10 s
        marks = [(100.0, 14, 1), (110.0, 28, 2), (120.0, 42, 3),
                 (130.0, 56, 4)]
        sps, steps, wall = tb.steady_state(marks, skip_epochs=1,
                                           batch_size=300)
        assert steps == 28 and wall == 20.0
        assert sps == pytest.approx(28 * 300 / 20.0)

    def test_steady_state_degenerate_window_raises(self):
        tb = self._mod()
        with pytest.raises(ValueError):
            tb.steady_state([(10.0, 14, 1), (20.0, 28, 2)], skip_epochs=2,
                            batch_size=300)


class TestMergeABSeeds:
    """tools/merge_ab_seeds.py: staged-seed pooling with corpus fingerprint."""

    def _report(self, seeds, pesq_base=1.5, corpus="/tmp/ab_corpus"):
        mk = lambda v: {"pesq": v, "stoi": 0.8}
        return {
            "config": {"corpus": corpus, "seeds": [int(s) for s in seeds],
                       "epoch": 60, "batch_size": 16, "slice_size": 2048,
                       "fmaps": [8, 16, 32], "ours_platform": "cpu"},
            "noisy_baseline": mk(pesq_base),
            "seeds": {str(s): {"ref": {"metrics": mk(2.0 + i)},
                               "ours": {"metrics": mk(2.1 + i)}}
                      for i, s in enumerate(seeds)},
            "summary": {},
        }

    def _write(self, tmp_path, name, rep):
        p = tmp_path / name
        p.write_text(json.dumps(rep))
        return str(p)

    def _merge(self):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.merge_ab_seeds import merge
        return merge

    def test_union_and_recomputed_summary(self, tmp_path):
        main = self._write(tmp_path, "main.json", self._report([111, 222]))
        side = self._write(tmp_path, "side.json", self._report([444]))
        self._merge()(main, side)
        out = json.loads(open(main).read())
        assert out["config"]["seeds"] == [111, 222, 444]
        # ref pesq over {2.0, 3.0, 2.0}: the side run's seed indexes from 0
        vals = [out["seeds"][s]["ref"]["metrics"]["pesq"]
                for s in ("111", "222", "444")]
        assert out["summary"]["ref"]["pesq"]["mean"] == pytest.approx(
            np.mean(vals))
        assert out["summary"]["ref"]["pesq"]["std"] == pytest.approx(
            np.std(vals))

    def test_different_corpus_contents_refused(self, tmp_path):
        # same corpus PATH, different noisy baseline -> different wavs
        main = self._write(tmp_path, "main.json", self._report([111]))
        side = self._write(tmp_path, "side.json",
                           self._report([444], pesq_base=1.6))
        with pytest.raises(SystemExit, match="noisy-baseline mismatch"):
            self._merge()(main, side)

    def test_duplicate_seed_refused(self, tmp_path):
        main = self._write(tmp_path, "main.json", self._report([111]))
        side = self._write(tmp_path, "side.json", self._report([111]))
        with pytest.raises(SystemExit, match="already present"):
            self._merge()(main, side)

    def test_config_mismatch_refused(self, tmp_path):
        main = self._write(tmp_path, "main.json", self._report([111]))
        rep = self._report([444])
        rep["config"]["epoch"] = 100
        side = self._write(tmp_path, "side.json", rep)
        with pytest.raises(SystemExit, match="config mismatch"):
            self._merge()(main, side)


class TestAbCkptTrajectory:
    """Pure helpers of tools/ab_ckpt_trajectory.py (the scoring path itself is
    exercised by the r5 campaign artifact)."""

    def _mod(self):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import tools.ab_ckpt_trajectory as m
        return m

    def test_parse_run_spec(self):
        m = self._mod()
        assert m.parse_run_spec("ours:/tmp/x") == ("ours", "/tmp/x")
        assert m.parse_run_spec("ref:/a/b:c") == ("ref", "/a/b:c")
        for bad in ("ours", "theirs:/x", "ours:", ":/x"):
            with pytest.raises(ValueError):
                m.parse_run_spec(bad)

    def test_eoe_ckpts_sorted_by_iter(self, tmp_path):
        m = self._mod()
        # iters chosen so lexicographic order != numeric order
        for it in (900, 11281, 2821):
            (tmp_path / f"weights_EOE_G-Generator-{it}.ckpt").write_text("x")
        (tmp_path / "weights_EOE_D-Discriminator-900.ckpt").write_text("x")
        got = m.eoe_g_ckpts(str(tmp_path))
        assert [int(p.rsplit("-", 1)[1][:-5]) for p in got] == [900, 2821, 11281]

    def test_clean_cmd_env_sides(self):
        m = self._mod()
        cmd, env = m._clean_cmd_env("ref", "/c.ckpt", "/t.opts", "/n", "/e")
        assert cmd[2].startswith("/root/reference")
        assert m.STUBS in env["PYTHONPATH"]
        cmd, env = m._clean_cmd_env("ours", "/c.ckpt", "/t.opts", "/n", "/e")
        assert cmd[2] == os.path.join(m.ROOT, "clean.py")
        assert env["SEGAN_TPU_PLATFORM"] == "cpu"
