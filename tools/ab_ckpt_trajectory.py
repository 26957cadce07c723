"""Quality-vs-training-budget trajectories for finished A/B trainer runs.

ref_trainer_ab.py scores each side's FINAL end-of-epoch generator only — the
fair headline (both trainers get the same budget and ship their last model),
but a single point can sit past a GAN's quality peak (the reference itself
ships best-val checkpoints for exactly this reason: model.py's eval-driven
saver). This tool goes back over a finished run directory, enhances the SAME
held-out testset through EVERY retained EOE generator checkpoint, and scores
each with the SAME harness (tools/ab_parity.py:score via the same score_dir
as the A/B), so "was the final checkpoint the best one?" is answered with
data instead of argument.

Run dirs are passed as side:path (the side picks which clean.py decodes the
checkpoint — ours, or the actual reference's via the tools/ref_stubs env):

    python tools/ab_ckpt_trajectory.py --corpus /tmp/ab_corpus \
        --runs ours:/tmp/ref_ab2/ours_s444 ours:/tmp/ref_ab2/ours_s555 \
        --out tools/r5_ab_ckpt_traj.json

Idempotent: a checkpoint whose enhanced wavs already exist is only rescored.
Note the retention asymmetry in the r5 A/B workdirs: the ours side saves EOE
checkpoints at epoch/4 strides (4 points across the run), while the reference
side's own Saver rotation (max_ckpts=5, saving every epoch) retains only the
final epochs — its trajectory spans the tail, not the whole run.
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys

# CPU-force before anything imports jax (the container pins the remote-TPU
# backend at interpreter start; scoring wavs must not dial the chip grant)
os.environ.setdefault("SEGAN_TPU_PLATFORM", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REF_ROOT = "/root/reference"
STUBS = os.path.join(ROOT, "tools", "ref_stubs")


def parse_run_spec(spec):
    """'ours:/path/to/run' -> ('ours', '/path/to/run'); validates the side."""
    side, sep, path = spec.partition(":")
    if not sep or side not in ("ours", "ref") or not path:
        raise ValueError(
            f"run spec {spec!r} must be 'ours:/dir' or 'ref:/dir'")
    return side, path


def eoe_g_ckpts(save_path):
    """All retained EOE generator checkpoints, sorted by training iter."""
    cks = glob.glob(os.path.join(save_path, "weights_EOE_G-Generator-*.ckpt"))
    return sorted(cks, key=lambda p: int(re.search(r"-(\d+)\.ckpt$", p).group(1)))


def _clean_cmd_env(side, ck, cfg, noisy_test, enh_dir):
    if side == "ref":
        env = dict(os.environ, PYTHONPATH=STUBS + ":" + REF_ROOT,
                   PYTHONUNBUFFERED="1", OMP_NUM_THREADS="1",
                   MKL_NUM_THREADS="1")
        clean = os.path.join(REF_ROOT, "clean.py")
    else:
        env = dict(os.environ, SEGAN_TPU_PLATFORM="cpu", PYTHONUNBUFFERED="1")
        clean = os.path.join(ROOT, "clean.py")
    cmd = [sys.executable, "-u", clean, "--g_pretrained_ckpt", ck,
           "--cfg_file", cfg, "--test_files", noisy_test,
           "--synthesis_path", enh_dir, "--seed", "1"]
    return cmd, env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--runs", nargs="+", required=True,
                    help="side:dir specs, e.g. ours:/tmp/ref_ab2/ours_s444")
    ap.add_argument("--out", default="tools/r5_ab_ckpt_traj.json")
    args = ap.parse_args()

    from tools.ref_trainer_ab import score_dir

    clean_test = os.path.join(args.corpus, "clean_testset")
    noisy_test = os.path.join(args.corpus, "noisy_testset")
    noisy_mean, _ = score_dir(clean_test, noisy_test)
    print("[noisy]", json.dumps(noisy_mean), flush=True)
    report = {"corpus": args.corpus, "noisy_baseline": noisy_mean, "runs": {}}

    for spec in args.runs:
        side, save = parse_run_spec(spec)
        name = os.path.basename(save.rstrip("/"))
        cfg = os.path.join(save, "train.opts")
        points = []
        for ck in eoe_g_ckpts(save):
            it = int(re.search(r"-(\d+)\.ckpt$", ck).group(1))
            enh = os.path.join(save + "_traj", str(it))
            if not glob.glob(os.path.join(enh, "*.wav")):
                os.makedirs(enh, exist_ok=True)
                cmd, env = _clean_cmd_env(side, ck, cfg, noisy_test, enh)
                print(f"[{name}@{it}] + {' '.join(cmd)}", flush=True)
                subprocess.run(cmd, env=env, check=True,
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.STDOUT)
            mean, _ = score_dir(clean_test, enh)
            points.append({"iter": it, "ckpt": os.path.basename(ck),
                           "metrics": mean})
            print(f"[{name}@{it}]", json.dumps(mean), flush=True)
        report["runs"][name] = {"side": side, "points": points}
        with open(args.out, "w") as f:  # checkpoint per run
            json.dump(report, f, indent=1)
    print(f"[done] {args.out}", flush=True)


if __name__ == "__main__":
    main()
