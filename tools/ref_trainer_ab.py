"""Same-corpus quality A/B vs the ACTUAL reference trainer (VERDICT r4 #1).

Runs the reference's UNMODIFIED training loop (/root/reference/train.py:94-98 ->
segan/models/model.py:230-437, torch CPU, third-party deps satisfied by
tools/ref_stubs — see its README) and this framework's product train.py on the
SAME corpus with the SAME config and epoch budget, enhances the same held-out
test set with each trainer's final end-of-epoch generator through each side's
own clean.py, and scores both (plus the noisy baseline) with the SAME metric
harness (composite CSIG/CBAK/COVL, SSNR, native-P.862 PESQ, STOI).

This converts the framework's "matches the reference" claim from math parity
(forward/loss/ckpt byte-parity, tests/test_reference_parity.py) to OUTCOME
parity: trained-model quality from the same data and budget. It is the
strongest substitute for the environment-blocked released-ckpt/Valentini gate
(tools/ab_parity.py).

Usage (the r5 campaign):
    python tools/make_demo_corpus.py --out /tmp/ab_corpus --style v2 \
        --n_train 100 --n_test 16 --dur 2.0
    python tools/ref_trainer_ab.py --corpus /tmp/ab_corpus \
        --work /tmp/ref_ab --out tools/r5_ref_trainer_ab.json \
        --seeds 111 222 --epoch 60

Both trainers run torch/JAX on CPU (fp32) for an apples-to-apples numeric
setting; runs are idempotent (a side with a finished final checkpoint is
skipped on re-invocation).
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

# CPU-force THIS process before anything imports jax: the container pins the
# remote-TPU backend at interpreter start, and an orchestration script must not
# dial (or wedge) the chip grant just to score wavs (verify notes, r3 trap)
os.environ.setdefault("SEGAN_TPU_PLATFORM", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REF_ROOT = "/root/reference"
STUBS = os.path.join(ROOT, "tools", "ref_stubs")

# the two trainers share this log format verbatim (ref model.py:334-348 /
# models/segan.py train loop) — parse loss trajectories from both
LOG_RE = re.compile(
    r"\(Iter (\d+)\) Batch (\d+)/(\d+) \(Epoch (\d+)\) "
    r"d_real:([-\d.]+), d_fake:([-\d.]+), g_adv:([-\d.]+), g_l1:([-\d.]+)")


def shared_flags(args, seed):
    """The identical reduced-SEGAN+ config handed to BOTH trainers: canonical
    optimizer/losses (RMSprop 5e-5, LSGAN MSE + L1 100 — ref run_segan+_train.sh)
    at a CPU-feasible scale."""
    return [
        "--clean_trainset", os.path.join(args.corpus, "clean_trainset"),
        "--noisy_trainset", os.path.join(args.corpus, "noisy_trainset"),
        "--batch_size", str(args.batch_size),
        "--epoch", str(args.epoch),
        "--seed", str(seed),
        "--slice_size", str(args.slice_size),
        "--genc_fmaps", *[str(f) for f in args.fmaps],
        "--genc_poolings", "4", "4", "4",
        "--denc_fmaps", *[str(f) for f in args.fmaps],
        "--denc_poolings", "4", "4", "4",
        "--z_dim", str(args.fmaps[-1]),
        # the D head FC is sized fmaps[-1] * dpool_slen (ref discriminator.py):
        # dpool_slen must equal the D encoder's output length
        "--dpool_slen", str(args.slice_size // (4 ** len(args.fmaps))),
        "--save_freq", "50",
        "--no_train_gen",  # sample plotting off on both sides
    ]


def run_trainer(cmd, env, log_path, tag):
    print(f"[{tag}] + {' '.join(cmd)}", flush=True)
    t0 = time.time()
    with open(log_path, "w", buffering=1) as lf:  # line-buffered: live tailing
        p = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True, env=env)
        n_lines = 0
        for line in p.stdout:
            lf.write(line)
            n_lines += 1
            if n_lines % 200 == 0:
                lf.flush()
                print(f"[{tag}] ...{line.strip()[:110]}", flush=True)
        p.wait()
    dt = time.time() - t0
    if p.returncode != 0:
        raise RuntimeError(f"{tag} trainer failed rc={p.returncode}, see {log_path}")
    print(f"[{tag}] done in {dt:.0f}s", flush=True)
    return dt


def parse_trajectory(log_path):
    traj = []
    with open(log_path) as f:
        for line in f:
            m = LOG_RE.search(line)
            if m:
                it, b, nb, ep, dr, df, ga, gl = m.groups()
                traj.append({"iter": int(it), "epoch": int(ep),
                             "d_real": float(dr), "d_fake": float(df),
                             "g_adv": float(ga), "g_l1": float(gl)})
    return traj


def latest_eoe_g(save_path):
    cks = glob.glob(os.path.join(save_path, "weights_EOE_G-Generator-*.ckpt"))
    if not cks:
        raise RuntimeError(f"no EOE G checkpoints in {save_path}")
    return max(cks, key=lambda p: int(re.search(r"-(\d+)\.ckpt$", p).group(1)))


def run_ref_side(args, seed, work):
    save = os.path.join(work, f"ref_s{seed}")
    log = save + ".log"
    final_marker = os.path.join(save, "DONE")
    env = dict(os.environ,
               PYTHONPATH=STUBS + ":" + REF_ROOT,
               PYTHONUNBUFFERED="1",
               OMP_NUM_THREADS=str(args.threads),
               MKL_NUM_THREADS=str(args.threads))
    if not os.path.exists(final_marker):
        cmd = [sys.executable, "-u", os.path.join(REF_ROOT, "train.py"),
               "--save_path", save, "--cache_dir", os.path.join(work, "ref_cache"),
               "--no-cuda"] + shared_flags(args, seed)
        run_trainer(cmd, env, log, f"ref s{seed}")
        open(final_marker, "w").write("ok")
    ck = latest_eoe_g(save)
    enh_dir = os.path.join(work, f"ref_s{seed}_enh")
    if not glob.glob(os.path.join(enh_dir, "*.wav")):
        os.makedirs(enh_dir, exist_ok=True)
        cmd = [sys.executable, "-u", os.path.join(REF_ROOT, "clean.py"),
               "--g_pretrained_ckpt", ck,
               "--cfg_file", os.path.join(save, "train.opts"),
               "--test_files", os.path.join(args.corpus, "noisy_testset"),
               "--synthesis_path", enh_dir, "--seed", str(seed)]
        run_trainer(cmd, env, save + "_clean.log", f"ref-clean s{seed}")
    return {"save": save, "ckpt": ck, "enh": enh_dir,
            "trajectory": parse_trajectory(log)}


def run_ours_side(args, seed, work):
    save = os.path.join(work, f"ours_s{seed}")
    log = save + ".log"
    final_marker = os.path.join(save, "DONE")
    env = dict(os.environ,
               SEGAN_TPU_PLATFORM=args.ours_platform,
               PYTHONUNBUFFERED="1")
    if not os.path.exists(final_marker):
        cmd = [sys.executable, "-u", os.path.join(ROOT, "train.py"),
               "--save_path", save, "--cache_dir", os.path.join(work, "ours_cache"),
               "--eoe_save_every", str(max(1, args.epoch // 4))
               ] + shared_flags(args, seed)
        run_trainer(cmd, env, log, f"ours s{seed}")
        open(final_marker, "w").write("ok")
    ck = latest_eoe_g(save)
    enh_dir = os.path.join(work, f"ours_s{seed}_enh")
    if not glob.glob(os.path.join(enh_dir, "*.wav")):
        os.makedirs(enh_dir, exist_ok=True)
        cmd = [sys.executable, "-u", os.path.join(ROOT, "clean.py"),
               "--g_pretrained_ckpt", ck,
               "--cfg_file", os.path.join(save, "train.opts"),
               "--test_files", os.path.join(args.corpus, "noisy_testset"),
               "--synthesis_path", enh_dir, "--seed", str(seed)]
        run_trainer(cmd, env, save + "_clean.log", f"ours-clean s{seed}")
    return {"save": save, "ckpt": ck, "enh": enh_dir,
            "trajectory": parse_trajectory(log)}


def score_dir(clean_dir, enh_dir):
    """Score every enhanced wav against its clean counterpart with the shared
    harness (tools/ab_parity.py:score — composite + native PESQ + STOI)."""
    from tools.ab_parity import score
    from segan_pytorch_tpu.data.wav_io import read_wav_raw

    per_utt = []
    for ef in sorted(glob.glob(os.path.join(enh_dir, "*.wav"))):
        cf = os.path.join(clean_dir, os.path.basename(ef))
        if not os.path.exists(cf):
            raise RuntimeError(f"no clean counterpart for {ef}")
        _, c = read_wav_raw(cf)
        _, e = read_wav_raw(ef)
        n = min(len(c), len(e))
        per_utt.append(score(c[:n].astype("float32"), e[:n].astype("float32")))
    keys = per_utt[0].keys()
    import numpy as np

    return ({k: float(np.mean([u[k] for u in per_utt])) for k in keys},
            per_utt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="make_demo_corpus layout (clean/noisy train+test dirs)")
    ap.add_argument("--work", default="/tmp/ref_trainer_ab")
    ap.add_argument("--out", default="tools/r5_ref_trainer_ab.json")
    ap.add_argument("--seeds", type=int, nargs="+", default=[111, 222])
    ap.add_argument("--epoch", type=int, default=60)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--slice_size", type=int, default=2048)
    ap.add_argument("--fmaps", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--threads", type=int, default=1,
                    help="torch CPU threads for the reference side")
    ap.add_argument("--ours_platform", default="cpu", choices=["cpu", "tpu"],
                    help="cpu (default: same numeric setting as the torch ref) "
                         "or tpu (product hardware path)")
    ap.add_argument("--sides", nargs="+", default=["ref", "ours"],
                    choices=["ref", "ours"], help="subset for staged runs")
    ap.add_argument("--score_only", action="store_true",
                    help="skip training, (re)score existing enhanced dirs")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    clean_test = os.path.join(args.corpus, "clean_testset")
    noisy_test = os.path.join(args.corpus, "noisy_testset")

    report = {"config": {k: getattr(args, k) for k in
                         ("corpus", "seeds", "epoch", "batch_size", "slice_size",
                          "fmaps", "ours_platform")},
              "seeds": {}}

    # noisy baseline: scored once (same inputs for every side)
    noisy_mean, _ = score_dir(clean_test, noisy_test)
    report["noisy_baseline"] = noisy_mean
    print("[noisy]", json.dumps(noisy_mean), flush=True)

    for seed in args.seeds:
        entry = {}
        if "ref" in args.sides:
            r = run_ref_side(args, seed, args.work)
            mean, per = score_dir(clean_test, r["enh"])
            entry["ref"] = {"ckpt": r["ckpt"], "metrics": mean,
                            "per_utt": per, "trajectory": r["trajectory"]}
            print(f"[ref s{seed}]", json.dumps(mean), flush=True)
        if "ours" in args.sides:
            o = run_ours_side(args, seed, args.work)
            mean, per = score_dir(clean_test, o["enh"])
            entry["ours"] = {"ckpt": o["ckpt"], "metrics": mean,
                             "per_utt": per, "trajectory": o["trajectory"]}
            print(f"[ours s{seed}]", json.dumps(mean), flush=True)
        report["seeds"][str(seed)] = entry
        with open(args.out, "w") as f:  # checkpoint the report per seed
            json.dump(report, f, indent=1)

    # cross-seed summary
    import numpy as np

    summary = {}
    for side in args.sides:
        vals = [report["seeds"][str(s)][side]["metrics"] for s in args.seeds
                if side in report["seeds"][str(s)]]
        if vals:
            summary[side] = {
                k: {"mean": float(np.mean([v[k] for v in vals])),
                    "std": float(np.std([v[k] for v in vals]))}
                for k in vals[0]}
    report["summary"] = summary
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"summary": summary}, indent=1), flush=True)


if __name__ == "__main__":
    main()
