"""CLI end-to-end tests: train.py -> checkpoints -> resume -> clean.py -> purge_ckpts,
driven via subprocess on the forced-CPU backend (the real product surface)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=560):
    env = dict(os.environ, SEGAN_TPU_PLATFORM="cpu")
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="module")
def cli_data(tmp_path_factory):
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("cli")
    for sub in ("clean", "noisy"):
        (root / sub).mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        t = np.arange(12000) / 16000.0
        c = 0.3 * np.sin(2 * np.pi * (220 + 40 * i) * t)
        n = c + 0.05 * rng.randn(len(t))
        wavfile.write(str(root / "clean" / f"u{i}.wav"), 16000,
                      (c * 32767).astype(np.int16))
        wavfile.write(str(root / "noisy" / f"u{i}.wav"), 16000,
                      np.clip(n * 32767, -32768, 32767).astype(np.int16))
    return root


TINY = ["--batch_size", "4", "--slice_size", "4096",
        "--genc_fmaps", "8", "16", "--genc_poolings", "4", "4", "--z_dim", "16",
        "--denc_fmaps", "8", "16", "--denc_poolings", "4", "4",
        "--dpool_slen", "256", "--no_train_gen", "--save_freq", "5"]


class TestTrainCleanCLI:
    def test_train_resume_clean_purge(self, cli_data):
        save = str(cli_data / "ckpt")
        cache = str(cli_data / "cache")
        base = ["train.py", "--save_path", save,
                "--clean_trainset", str(cli_data / "clean"),
                "--noisy_trainset", str(cli_data / "noisy"),
                "--cache_dir", cache] + TINY
        r = run_cli(base + ["--epoch", "1"])
        assert r.returncode == 0, r.stderr[-2000:]
        assert "(Iter" in r.stdout
        assert os.path.exists(os.path.join(save, "train.opts"))
        idx = json.load(open(os.path.join(save, "EOE_G-checkpoints")))
        first_ckpt = idx["current"]

        # resume for 2 more epochs: iteration numbering must continue
        r = run_cli(base + ["--epoch", "3", "--resume"])
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Resumed from step" in r.stdout
        idx = json.load(open(os.path.join(save, "EOE_G-checkpoints")))
        assert idx["current"] != first_ckpt
        assert len(set(idx["latest"])) == len(idx["latest"])  # no name collisions

        # clean with the produced checkpoint
        synth = str(cli_data / "synth")
        r = run_cli(["clean.py",
                     "--g_pretrained_ckpt",
                     os.path.join(save, "weights_" + idx["current"]),
                     "--cfg_file", os.path.join(save, "train.opts"),
                     "--test_files", str(cli_data / "noisy"),
                     "--synthesis_path", synth, "--soundfile"])
        assert r.returncode == 0, r.stderr[-2000:]
        outs = os.listdir(synth)
        assert len(outs) == 4
        from scipy.io import wavfile

        rate, wav = wavfile.read(os.path.join(synth, outs[0]))
        assert rate == 16000 and wav.shape[0] == 12000

        # purge keeps newest + current
        r = run_cli(["purge_ckpts.py", save])
        assert r.returncode == 0, r.stderr[-2000:]
        idx2 = json.load(open(os.path.join(save, "EOE_G-checkpoints")))
        assert len(idx2["latest"]) == 1

    def test_train_rejects_bad_dp(self, cli_data):
        r = run_cli(["train.py", "--save_path", str(cli_data / "ck2"),
                     "--clean_trainset", str(cli_data / "clean"),
                     "--noisy_trainset", str(cli_data / "noisy"),
                     "--cache_dir", str(cli_data / "cache2"),
                     "--dp", "3", "--epoch", "1"] + TINY)
        assert r.returncode != 0
        assert "divisible" in (r.stdout + r.stderr)


class TestPreemption:
    def test_sigterm_checkpoints_and_exits_cleanly(self, cli_data):
        """TPU-preemption safety: SIGTERM mid-training must finish the in-flight
        step, write an EOE checkpoint, and exit 0 (models/segan.py
        _install_preempt_handler)."""
        import signal
        import time

        save = str(cli_data / "ckpt_term")
        cache = str(cli_data / "cache_term")
        env = dict(os.environ, SEGAN_TPU_PLATFORM="cpu")
        p = subprocess.Popen(
            [sys.executable, "-u", "train.py", "--save_path", save,
             "--clean_trainset", str(cli_data / "clean"),
             "--noisy_trainset", str(cli_data / "noisy"),
             "--cache_dir", cache, "--epoch", "200", "--save_freq", "1"] + TINY,
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        # wait for the first logged step (compile done, loop running)
        deadline = time.time() + 300
        lines = []
        for line in p.stdout:
            lines.append(line)
            if "(Iter" in line:
                break
            if time.time() > deadline:
                p.kill()
                raise AssertionError("train never reached a step:\n"
                                     + "".join(lines[-30:]))
        p.send_signal(signal.SIGTERM)
        try:
            out = p.stdout.read()
        except Exception:
            out = ""
        rc = p.wait(timeout=120)
        full = "".join(lines) + out
        assert rc == 0, full[-2000:]
        assert "SIGTERM" in full and "preempted" in full, full[-2000:]
        idx = json.load(open(os.path.join(save, "EOE_G-checkpoints")))
        assert os.path.exists(os.path.join(save, "weights_" + idx["current"]))


class TestConverterCLI:
    def test_weight_converter_roundtrip(self, cli_data, tmp_path):
        """weight_converter.py converts a torch G ckpt to the native format, which
        clean.py then loads identically to the torch original."""
        torch = pytest.importorskip("torch")
        # fabricate a tiny torch generator state dict matching the TINY config
        rng = np.random.RandomState(1)
        st = {}
        for i, (cin, cout) in enumerate([(1, 8), (8, 16)]):
            st[f"enc_blocks.{i}.conv.weight"] = torch.from_numpy(
                rng.randn(cout, cin, 31).astype("f") * 0.05)
            st[f"enc_blocks.{i}.conv.bias"] = torch.from_numpy(
                rng.randn(cout).astype("f") * 0.05)
            st[f"enc_blocks.{i}.act.weight"] = torch.from_numpy(
                rng.randn(cout).astype("f") * 0.05)
        st["alpha_0.skip_k"] = torch.from_numpy(rng.randn(1, 8, 1).astype("f"))
        for i, (cin, cout) in enumerate([(32, 8), (16, 1)]):
            st[f"dec_blocks.{i}.deconv.weight"] = torch.from_numpy(
                rng.randn(cin, cout, 31).astype("f") * 0.05)
            st[f"dec_blocks.{i}.deconv.bias"] = torch.from_numpy(
                rng.randn(cout).astype("f") * 0.05)
            if i < 1:
                st[f"dec_blocks.{i}.act.weight"] = torch.from_numpy(
                    rng.randn(cout).astype("f") * 0.05)
        src = str(tmp_path / "tg.ckpt")
        torch.save({"state_dict": st}, src)
        out = str(tmp_path / "tg.jax")
        r = run_cli(["weight_converter.py", src, "--out", out, "--which", "G"])
        assert r.returncode == 0, r.stderr[-1500:]
        assert os.path.exists(out)
        from segan_pytorch_tpu.utils.checkpoint import load_pytree

        tree, meta = load_pytree(out)
        assert "enc_blocks_0" in tree["state_dict"]["params"]
        assert meta["source"] == src

        # reverse direction: our npz -> torch format, state dicts must agree
        back = str(tmp_path / "tg.torch")
        r = run_cli(["weight_converter.py", out, "--to_torch", "--out", back,
                     "--which", "G"])
        assert r.returncode == 0, r.stderr[-1500:]
        payload = torch.load(back)
        assert set(payload["state_dict"]) == set(st)
        for k in st:
            np.testing.assert_array_equal(payload["state_dict"][k].numpy(),
                                          st[k].numpy())
