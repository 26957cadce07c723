"""Canonical 100-epoch SEGAN+ campaign through the product path (VERDICT r4 #2).

Reference canonical config (/root/reference/run_segan+_train.sh:4-7 +
ckpt_segan+/train.opts): batch 300, RMSprop 5e-5, l1 100, slice 16384,
--no_bias --no_train_gen, 100 epochs. The released run used NO valset
(train.opts: clean_valset null); this campaign adds one so the eval-driven
best-checkpoint / early-stop logic (ref model.py:413-433) governs a full-scale
run end-to-end, and injects ONE mid-campaign SIGTERM (graceful preempt ->
checkpoint -> clean exit, models/segan.py SIGTERM handler) followed by a
--resume relaunch to prove the resume path at scale.

The orchestrator CPU-forces ITSELF (never dials the TPU); only the spawned
train.py children touch the chip. Output: tools/r5_canonical_campaign.json
(trajectory, val_obj curve, ckpt lineage, wall-clock, resume evidence) plus
final/best-ckpt test-set scores via tools/ab_parity.py.

Usage:
    python -u tools/canonical_campaign.py --work /tmp/canon \
        --out tools/r5_canonical_campaign.json \
        [--preempt_epoch 50] [--epoch 100] [--corpus-exists]
"""
import argparse
import glob
import json
import os
import re
import signal
import subprocess
import sys
import time

os.environ.setdefault("SEGAN_TPU_PLATFORM", "cpu")  # orchestrator never dials TPU

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EPOCH_RE = re.compile(r"\(Epoch (\d+)\)")
VAL_RE = re.compile(r"Val obj \(COVL \+ SSNR \+ PESQ\) improved "
                    r"([\d.eE+-]+) -> ([\d.eE+-]+)")
PATIENCE_RE = re.compile(r"Val loss did not improve. Patience (\d+)/(\d+)")


def sh(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, **kw)


def ensure_corpora(work):
    corpus = os.path.join(work, "corpus")
    val = os.path.join(work, "valcorpus")
    if not os.path.isdir(os.path.join(corpus, "clean_trainset")):
        sh([sys.executable, os.path.join(ROOT, "tools/make_demo_corpus.py"),
            "--out", corpus, "--style", "v2", "--n_train", "600",
            "--n_test", "16", "--dur", "3.0", "--seed", "1234"])
    if not os.path.isdir(os.path.join(val, "clean_trainset")):
        sh([sys.executable, os.path.join(ROOT, "tools/make_demo_corpus.py"),
            "--out", val, "--style", "v2", "--n_train", "12",
            "--n_test", "1", "--dur", "3.0", "--seed", "777"])
    return corpus, val


def train_cmd(args, corpus, val, save, resume):
    cmd = [sys.executable, "-u", os.path.join(ROOT, "train.py"),
           "--save_path", save,
           "--clean_trainset", os.path.join(corpus, "clean_trainset"),
           "--noisy_trainset", os.path.join(corpus, "noisy_trainset"),
           "--clean_valset", os.path.join(val, "clean_trainset"),
           "--noisy_valset", os.path.join(val, "noisy_trainset"),
           "--cache_dir", os.path.join(args.work, "cache"),
           "--batch_size", "300", "--no_bias", "--no_train_gen",
           "--epoch", str(args.epoch),
           "--compute_dtype", "bfloat16",
           "--loader_dtype", "bfloat16",  # halves dev-tunnel H2D (BENCH.md r4)
           "--steps_per_call", "4",
           "--eoe_save_every", "5",
           "--eval_workers", "2"]
    if resume:
        cmd.append("--resume")
    return cmd


def run_leg(cmd, log_path, preempt_epoch=None, tag="leg"):
    """Run one training leg; optionally SIGTERM it once `preempt_epoch` appears
    in its output. Returns (returncode, saw_epochs, val_events, wall_s)."""
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    env.pop("SEGAN_TPU_PLATFORM", None)  # children DO use the TPU
    t0 = time.time()
    print(f"[{tag}] + {' '.join(cmd)}", flush=True)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    epochs_seen, val_events, preempted = set(), [], False
    with open(log_path, "a") as lf:
        for line in proc.stdout:
            lf.write(line)
            m = EPOCH_RE.search(line)
            if m:
                ep = int(m.group(1))
                if ep not in epochs_seen:
                    epochs_seen.add(ep)
                    lf.flush()
                    print(f"[{tag}] reached epoch {ep} "
                          f"({time.time()-t0:.0f}s)", flush=True)
            for rex, kind in ((VAL_RE, "improved"), (PATIENCE_RE, "patience")):
                mv = rex.search(line)
                if mv:
                    val_events.append({"kind": kind, "epoch": max(epochs_seen or {0}),
                                       "groups": mv.groups()})
            if (preempt_epoch and not preempted and m
                    and int(m.group(1)) >= preempt_epoch):
                print(f"[{tag}] sending SIGTERM at epoch {m.group(1)} "
                      f"(pid {proc.pid})", flush=True)
                proc.send_signal(signal.SIGTERM)
                preempted = True
    proc.wait()
    return proc.returncode, sorted(epochs_seen), val_events, time.time() - t0


def ckpt_lineage(save):
    out = {}
    for prefix in ("EOE_G-", "EOE_D-", "G-", "D-"):
        idx = os.path.join(save, prefix + "checkpoints")
        if os.path.exists(idx):
            out[prefix] = json.load(open(idx))
    out["files"] = sorted(os.path.basename(p)
                          for p in glob.glob(os.path.join(save, "weights_*")))
    return out


def score_ckpt(ckpt, save, corpus, out_json):
    env = dict(os.environ, SEGAN_TPU_PLATFORM="cpu", PYTHONUNBUFFERED="1")
    sh([sys.executable, "-u", os.path.join(ROOT, "tools/ab_parity.py"),
        "--g_ckpt", ckpt, "--cfg_file", os.path.join(save, "train.opts"),
        "--clean_test", os.path.join(corpus, "clean_testset"),
        "--noisy_test", os.path.join(corpus, "noisy_testset"),
        "--out", out_json], env=env)
    return json.load(open(out_json))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/canon")
    ap.add_argument("--out", default="tools/r5_canonical_campaign.json")
    ap.add_argument("--epoch", type=int, default=100)
    ap.add_argument("--preempt_epoch", type=int, default=50)
    ap.add_argument("--skip_train", action="store_true",
                    help="score existing checkpoints only")
    ap.add_argument("--resume_only", action="store_true",
                    help="continue an interrupted campaign: skip leg1, run one "
                         "--resume leg to completion (prior legs' epoch "
                         "coverage is reconstructed from the existing "
                         "train.log), then score")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    corpus, val = ensure_corpora(args.work)
    save = os.path.join(args.work, "ckpt_segan+")
    log = os.path.join(args.work, "train.log")
    report = {"config": {"epoch": args.epoch, "batch_size": 300,
                         "preempt_epoch": args.preempt_epoch,
                         "corpus": corpus, "val": val},
              "legs": []}

    if args.resume_only:
        # reconstruct prior legs' epoch coverage from the accumulated log
        prior = sorted({int(m.group(1)) for line in open(log)
                        for m in [EPOCH_RE.search(line)] if m}) if \
            os.path.exists(log) else []
        report["legs"].append({"rc": None, "epochs":
                               [min(prior or [0]), max(prior or [0])],
                               "note": "prior legs reconstructed from train.log "
                                       "(orchestrator restart)",
                               "preempted": True})
        rc, eps, vals, wall = run_leg(
            train_cmd(args, corpus, val, save, resume=True), log, tag="leg3")
        report["legs"].append({"rc": rc, "epochs": [min(eps or [0]), max(eps or [0])],
                               "val_events": vals, "wall_s": round(wall, 1),
                               "preempted": False})
        print(f"[leg3] rc={rc}", flush=True)
    elif not args.skip_train:
        # leg 1: fresh start, SIGTERM at preempt_epoch
        rc, eps, vals, wall = run_leg(
            train_cmd(args, corpus, val, save, resume=False), log,
            preempt_epoch=args.preempt_epoch, tag="leg1")
        report["legs"].append({"rc": rc, "epochs": [min(eps or [0]), max(eps or [0])],
                               "val_events": vals, "wall_s": round(wall, 1),
                               "preempted": True})
        print(f"[leg1] rc={rc} epochs={eps[:1]}..{eps[-1:]}", flush=True)
        # leg 2: --resume to completion
        rc, eps, vals, wall = run_leg(
            train_cmd(args, corpus, val, save, resume=True), log, tag="leg2")
        report["legs"].append({"rc": rc, "epochs": [min(eps or [0]), max(eps or [0])],
                               "val_events": vals, "wall_s": round(wall, 1),
                               "preempted": False})
        print(f"[leg2] rc={rc}", flush=True)

    report["lineage"] = ckpt_lineage(save)
    # score the final EOE and (if present) the best-val checkpoint
    eoe = sorted(glob.glob(os.path.join(save, "weights_EOE_G-Generator-*.ckpt")),
                 key=lambda p: int(re.search(r"-(\d+)\.ckpt$", p).group(1)))
    best = sorted(glob.glob(os.path.join(save,
                                         "weights_SEGAN-G-best_Generator-*.ckpt")),
                  key=lambda p: int(re.search(r"-(\d+)\.ckpt$", p).group(1)))
    if eoe:
        report["final_scores"] = score_ckpt(
            eoe[-1], save, corpus, os.path.join(args.work, "final_parity.json"))
        report["final_ckpt"] = os.path.basename(eoe[-1])
    if best:
        report["best_ckpt"] = os.path.basename(best[-1])
        step = lambda p: re.search(r"-(\d+)\.ckpt$", p).group(1)  # noqa: E731
        if eoe and step(best[-1]) == step(eoe[-1]):
            # best-val save landed on the final epoch: identical params, no
            # point rescoring the same generator twice
            report["best_scores"] = report["final_scores"]
            report["best_note"] = ("best-val save coincides with the final "
                                   "EOE step; scores shared")
        else:
            report["best_scores"] = score_ckpt(
                best[-1], save, corpus,
                os.path.join(args.work, "best_parity.json"))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("[campaign] report ->", args.out, flush=True)


if __name__ == "__main__":
    main()
