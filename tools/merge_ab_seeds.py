"""Merge additional ref_trainer_ab seed runs into the main A/B artifact.

ref_trainer_ab.py writes one report per invocation; staged campaigns (extra
seeds added later, e.g. after a host restart wiped the workspace) land in a
side artifact. This folds the side artifact's per-seed entries into the main
one and recomputes the cross-seed summary over the union, preserving each
seed's per-utterance scores and loss trajectories.

Usage:
    python tools/merge_ab_seeds.py tools/r5_ref_trainer_ab.json \
        tools/r5_ref_trainer_ab_s45.json
"""
import json
import sys

import numpy as np


def merge(main_path, *side_paths):
    with open(main_path) as f:
        report = json.load(f)
    for sp in side_paths:
        with open(sp) as f:
            side = json.load(f)
        for cfg_key in ("corpus", "epoch", "batch_size", "slice_size", "fmaps",
                        "ours_platform"):
            a = report["config"].get(cfg_key)
            b = side["config"].get(cfg_key)
            if a != b:
                raise SystemExit(
                    f"config mismatch on {cfg_key!r}: {a!r} vs {b!r} — "
                    "seeds from a different experiment must not be pooled")
        # the corpus PATH can match while the CONTENTS differ (regenerated
        # after a host restart with different args): the noisy baseline is the
        # corpus fingerprint — identical wavs score identically
        for k, a in report["noisy_baseline"].items():
            b = side["noisy_baseline"].get(k)
            if b is None or abs(a - b) > 1e-9:
                raise SystemExit(
                    f"noisy-baseline mismatch on {k!r}: {a!r} vs {b!r} — the "
                    "two runs scored DIFFERENT corpora; report them as "
                    "independent replications instead of pooling seeds")
        for seed, entry in side["seeds"].items():
            if seed in report["seeds"]:
                raise SystemExit(f"seed {seed} already present in {main_path}")
            report["seeds"][seed] = entry
    seeds = sorted(report["seeds"], key=int)
    report["config"]["seeds"] = [int(s) for s in seeds]
    summary = {}
    for side_name in ("ref", "ours"):
        vals = [report["seeds"][s][side_name]["metrics"] for s in seeds
                if side_name in report["seeds"][s]]
        if vals:
            summary[side_name] = {
                k: {"mean": float(np.mean([v[k] for v in vals])),
                    "std": float(np.std([v[k] for v in vals]))}
                for k in vals[0]}
    report["summary"] = summary
    with open(main_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"seeds": seeds, "summary": summary}, indent=1))


if __name__ == "__main__":
    merge(sys.argv[1], *sys.argv[2:])
