"""WSEGAN + AEWSEGAN quality campaigns (VERDICT r4 #3).

The reference's WSEGAN exists for DEWHISPERING (run_wsegan_train.sh:4-9 trains
clean_trainset_M4 vs whisper_trainset_M4 with snorm/adam/misalign), not
denoising — so the campaign corpus is the synthetic dewhispering set
(tools/make_demo_corpus.py --style whisper: the 'noisy' side is the same
articulation with noise excitation; the enhancer must regenerate voicing).

Arms (identical corpus, budget, batch — only the training recipe differs):
  wsegan_full   — run_wsegan_train.sh semantics + interf pairs: snorm G+D,
                  adam, --misalign_pair --interf_pair, power loss (ref
                  model.py:597-628,638-654)
  wsegan_plain  — same engine, extras OFF (no misalign/interf, pow_weight 0):
                  isolates what the extra fake pairs + power loss buy
  segan_control — plain SEGAN+ (rmsprop/bnorm/LSGAN) on the same data/budget
  aewsegan      — G-only autoencoder arm with a valset: its SD(dB) trajectory
                  (Genh_SD in train/scalars.jsonl) is the quality evidence the
                  reference's broken AE eval path never produced

Each arm trains through the product train.py (TPU by default), enhances the
held-out whisper testset through clean.py (CPU-forced), and is scored with the
shared harness (tools/ab_parity.py:score). Output: one JSON report with the
whisper baseline, per-arm metrics, and the AE SD trajectory.

Usage:
    python -u tools/wsegan_quality_campaign.py --work /tmp/wsq \
        --out tools/r5_wsegan_quality.json --epoch 40
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

os.environ.setdefault("SEGAN_TPU_PLATFORM", "cpu")  # orchestrator never dials TPU

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def sh(cmd, env=None, log=None, tag=""):
    print(f"[{tag}] + {' '.join(cmd)}", flush=True)
    t0 = time.time()
    if log:
        with open(log, "w") as lf:
            rc = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT,
                                env=env).returncode
    else:
        rc = subprocess.run(cmd, env=env).returncode
    if rc != 0:
        raise RuntimeError(f"{tag} failed rc={rc}" + (f", see {log}" if log else ""))
    print(f"[{tag}] done in {time.time()-t0:.0f}s", flush=True)


def ensure_corpus(work):
    corpus = os.path.join(work, "whisper_corpus")
    if not os.path.isdir(os.path.join(corpus, "clean_trainset")):
        sh([sys.executable, os.path.join(ROOT, "tools/make_demo_corpus.py"),
            "--out", corpus, "--style", "whisper", "--n_train", "240",
            "--n_test", "16", "--dur", "3.0", "--seed", "9876"], tag="corpus")
    val = os.path.join(work, "whisper_val")
    if not os.path.isdir(os.path.join(val, "clean_trainset")):
        sh([sys.executable, os.path.join(ROOT, "tools/make_demo_corpus.py"),
            "--out", val, "--style", "whisper", "--n_train", "8",
            "--n_test", "1", "--dur", "3.0", "--seed", "31415"], tag="valcorpus")
    return corpus, val


def arm_flags(name, args):
    base = {
        # run_wsegan_train.sh:4-9 + --interf_pair (the full extras set the
        # VERDICT asks to evaluate; ref model.py:594-627)
        "wsegan_full": ["--wsegan", "--gnorm_type", "snorm", "--dnorm_type",
                        "snorm", "--opt", "adam", "--misalign_pair",
                        "--interf_pair"],
        # same engine, extras off: what do misalign/interf + power loss buy?
        "wsegan_plain": ["--wsegan", "--gnorm_type", "snorm", "--dnorm_type",
                         "snorm", "--opt", "adam", "--pow_weight", "0"],
        # power loss on, extra fake pairs off: isolates WHICH full-recipe
        # ingredient moves the result (pow loss vs misalign/interf)
        "wsegan_pow": ["--wsegan", "--gnorm_type", "snorm", "--dnorm_type",
                       "snorm", "--opt", "adam"],
        # the denoising default recipe as the cross-engine control
        "segan_control": [],
        # G-only AE ablation (ref model.py:769-935), adam per the engine default
        "aewsegan": ["--aewsegan", "--opt", "adam"],
    }[name]
    return base + ["--batch_size", str(args.batch_size),
                   "--epoch", str(args.epoch)]


def run_arm(name, args, corpus, val, work):
    save = os.path.join(work, name)
    log = save + ".log"
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    env.pop("SEGAN_TPU_PLATFORM", None)
    if args.platform == "cpu":
        env["SEGAN_TPU_PLATFORM"] = "cpu"
    if not os.path.exists(os.path.join(save, "DONE")):
        cmd = [sys.executable, "-u", os.path.join(ROOT, "train.py"),
               "--save_path", save,
               "--clean_trainset", os.path.join(corpus, "clean_trainset"),
               "--noisy_trainset", os.path.join(corpus, "noisy_trainset"),
               "--cache_dir", os.path.join(work, "cache"),
               "--no_train_gen", "--no_bias",
               "--compute_dtype", "bfloat16", "--loader_dtype", "bfloat16",
               "--eoe_save_every", str(max(1, args.epoch // 4)),
               ] + arm_flags(name, args)
        if name == "aewsegan":  # valset drives the SD(dB) trajectory
            cmd += ["--clean_valset", os.path.join(val, "clean_trainset"),
                    "--noisy_valset", os.path.join(val, "noisy_trainset")]
        sh(cmd, env=env, log=log, tag=name)
        open(os.path.join(save, "DONE"), "w").write("ok")
    cks = sorted(glob.glob(os.path.join(save, "weights_EOE_G-Generator-*.ckpt")),
                 key=lambda p: int(re.search(r"-(\d+)\.ckpt$", p).group(1)))
    return save, cks


def enhance_ckpt(name, save, ck, corpus, work, tag=""):
    """clean.py (CPU-forced) the held-out testset through one checkpoint."""
    enh = os.path.join(work, name + "_enh" + (("_" + tag) if tag else ""))
    if not glob.glob(os.path.join(enh, "*.wav")):
        os.makedirs(enh, exist_ok=True)
        cenv = dict(os.environ, SEGAN_TPU_PLATFORM="cpu", PYTHONUNBUFFERED="1")
        sh([sys.executable, "-u", os.path.join(ROOT, "clean.py"),
            "--g_pretrained_ckpt", ck,
            "--cfg_file", os.path.join(save, "train.opts"),
            "--test_files", os.path.join(corpus, "noisy_testset"),
            "--synthesis_path", enh], env=cenv,
           log=save + f"_clean{('_' + tag) if tag else ''}.log",
           tag=name + "-clean" + (("@" + tag) if tag else ""))
    return enh


def sd_trajectory(save):
    """Genh_SD points from the TrainLogger's scalars.jsonl (AE arm)."""
    path = os.path.join(save, "train", "scalars.jsonl")
    out = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                if d.get("tag") == "Genh_SD":
                    out.append({"step": d.get("step"), "sd_db": d.get("value")})
    return out


def score_dir(clean_dir, enh_dir):
    from tools.ab_parity import score
    from segan_pytorch_tpu.data.wav_io import read_wav_raw
    import numpy as np

    per = []
    for ef in sorted(glob.glob(os.path.join(enh_dir, "*.wav"))):
        cf = os.path.join(clean_dir, os.path.basename(ef))
        _, c = read_wav_raw(cf)
        _, e = read_wav_raw(ef)
        n = min(len(c), len(e))
        per.append(score(c[:n].astype("float32"), e[:n].astype("float32")))
    return {k: float(np.mean([u[k] for u in per])) for k in per[0]}, per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/wsq")
    ap.add_argument("--out", default="tools/r5_wsegan_quality.json")
    ap.add_argument("--epoch", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=150)
    ap.add_argument("--platform", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--arms", nargs="+",
                    default=["wsegan_full", "wsegan_plain", "segan_control",
                             "aewsegan"],
                    choices=["wsegan_full", "wsegan_plain", "wsegan_pow",
                             "segan_control", "aewsegan"])
    ap.add_argument("--traj_arms", nargs="*", default=[],
                    help="arms whose EVERY retained EOE checkpoint is scored "
                         "(quality-vs-budget trajectory), not just the final")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    corpus, val = ensure_corpus(args.work)
    clean_test = os.path.join(corpus, "clean_testset")

    report = {"config": {"epoch": args.epoch, "batch_size": args.batch_size,
                         "platform": args.platform, "corpus": corpus},
              "arms": {}}
    base_mean, _ = score_dir(clean_test, os.path.join(corpus, "noisy_testset"))
    report["whisper_baseline"] = base_mean
    print("[whisper-baseline]", json.dumps(base_mean), flush=True)

    for name in args.arms:
        save, cks = run_arm(name, args, corpus, val, args.work)
        ck = cks[-1]
        enh = enhance_ckpt(name, save, ck, corpus, args.work)
        mean, per = score_dir(clean_test, enh)
        entry = {"ckpt": os.path.basename(ck), "metrics": mean, "per_utt": per}
        if name in args.traj_arms:
            traj = []
            for c in cks:
                step = int(re.search(r"-(\d+)\.ckpt$", c).group(1))
                if c == ck:
                    traj.append({"ckpt": os.path.basename(c), "step": step,
                                 "metrics": mean})
                    continue
                e = enhance_ckpt(name, save, c, corpus, args.work,
                                 tag=str(step))
                m, _ = score_dir(clean_test, e)
                traj.append({"ckpt": os.path.basename(c), "step": step,
                             "metrics": m})
                print(f"[{name}@{step}]", json.dumps(m), flush=True)
            entry["ckpt_trajectory"] = traj
        if name == "aewsegan":
            entry["sd_trajectory"] = sd_trajectory(save)
        report["arms"][name] = entry
        print(f"[{name}]", json.dumps(mean), flush=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    print("[campaign] report ->", args.out, flush=True)


if __name__ == "__main__":
    main()
