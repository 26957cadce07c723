"""VCTK speaker-split tool (ref select_speakers.py:132-212): pick 14 test / 15 valid
speakers, gender-balanced, minimizing text-content overlap with the rest; remaining
speakers go to train.  Rewritten as an argument-driven tool (the reference hard-codes its
corpus path, select_speakers.py:21)."""
import argparse
import glob
import json
import os
import re
from random import shuffle, seed as _seed

import numpy as np


def txt_clean(path: str) -> str:
    with open(path, "r") as f:
        txt = f.read().rstrip().lower()
    txt = re.sub(r"[^\w\s]", "", txt)
    txt = re.sub(r"\s+", " ", txt)
    return txt


def build_indices(vctk_path: str, cache_dir: str):
    os.makedirs(cache_dir, exist_ok=True)
    s2t_p = os.path.join(cache_dir, "spk2txt.json")
    t2s_p = os.path.join(cache_dir, "txt2spk.json")
    if os.path.exists(s2t_p) and os.path.exists(t2s_p):
        return (json.load(open(s2t_p)), json.load(open(t2s_p)))
    txtfs = glob.glob(os.path.join(vctk_path, "txt", "**", "*.txt"), recursive=True)
    spk2txt, txt2spk = {}, {}
    for ii, txtf in enumerate(txtfs, start=1):
        spk = txtf.split(os.sep)[-2]
        txt = txt_clean(txtf)
        spk2txt.setdefault(spk, []).append(txt)
        txt2spk.setdefault(txt, []).append(spk)
        if ii % 1000 == 0:
            print(f"Processed {ii}/{len(txtfs)}")
    json.dump(spk2txt, open(s2t_p, "w"))
    json.dump(txt2spk, open(t2s_p, "w"))
    return spk2txt, txt2spk


def load_spk2gen(vctk_path: str) -> dict:
    spks = [l.rstrip().split(" ") for l in
            open(os.path.join(vctk_path, "speaker-info.txt"))][1:]
    spk2gen = dict(("p" + el[0], el[4]) for el in spks)
    spk2gen.setdefault("p280", "F")  # lost speaker (ref select_speakers.py:32)
    return spk2gen


def gender_balanced_pick(sorted_spks, spk2gen, n, exclude=()):
    """Greedy gender-balanced selection (ref select_speakers.py:139-191).

    Returns (picked, remainder): speakers skipped by a full gender quota while the
    pick was still open do NOT join the remainder — the reference routes them to
    train (its nontest_counts only collects entries seen after the test pick filled,
    select_speakers.py:160-161)."""
    picked, f, m = [], 0, 0
    remainder = []
    for spk, count in sorted_spks:
        if len(picked) >= n:
            remainder.append((spk, count))
            continue
        if spk in exclude:
            continue
        gen = spk2gen.get(spk)
        if gen == "F":
            if f <= n // 2:
                f += 1
            else:
                continue  # quota-skipped -> train, as in the reference
        elif gen == "M":
            if m <= n // 2:
                m += 1
            else:
                continue
        picked.append(spk)
    return picked, remainder


def main(opts):
    _seed(opts.seed)
    spk2gen = load_spk2gen(opts.vctk_path)
    spk2txt, txt2spk = build_indices(opts.vctk_path, opts.cache_dir)
    # total text-sharing count per speaker: speakers whose texts overlap least with
    # others are the best held-out candidates
    spk2count = {spk: sum(len(txt2spk[t]) for t in txts)
                 for spk, txts in spk2txt.items()}
    sorted_counts = sorted(spk2count.items(), key=lambda kv: kv[1])
    test_spks, nontest = gender_balanced_pick(sorted_counts, spk2gen,
                                              opts.test_files)
    shuffle(nontest)
    valid_spks, _ = gender_balanced_pick(nontest, spk2gen, opts.valid_files,
                                         exclude=test_spks)
    train_spks = [s for s in spk2gen if s not in test_spks and s not in valid_spks]
    print("train spks: ", len(train_spks))
    print("valid spks: ", len(valid_spks))
    print("test spks: ", len(test_spks))
    for name, lst in (("train", train_spks), ("valid", valid_spks),
                      ("test", test_spks)):
        with open(os.path.join(opts.out_dir, f"{name}_split.txt"), "w") as f:
            for spk in lst:
                f.write(spk[1:] + "\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--vctk_path", type=str, required=True)
    parser.add_argument("--cache_dir", type=str, default="spk_cache")
    parser.add_argument("--out_dir", type=str, default=".")
    parser.add_argument("--test_files", type=int, default=14)
    parser.add_argument("--valid_files", type=int, default=15)
    parser.add_argument("--seed", type=int, default=111)
    main(parser.parse_args())
