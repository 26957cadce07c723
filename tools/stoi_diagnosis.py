"""Root-cause harness for the demo-corpus STOI regression (VERDICT r3 #3).

BENCH.md's learning demo shows PESQ up (1.87 -> 2.66) but STOI DOWN
(0.622 -> 0.577) on the v1 synthetic corpus. Hypothesis: the v1 corpus puts a
CONSTANT aspiration-noise floor (~-34 dB re peak) in the *clean* signal, so
pause-region frames survive STOI's 40 dB silent-frame VAD
(metrics/stoi.py:_remove_silent_frames); their content is incompressible
white noise, and an enhancer that (correctly) suppresses it loses correlation
there — an artifact of the corpus, not an intelligibility loss.

This tool pins that with data, per VERDICT's three probes:
 (a) active-speech-only rescore: STOI at stricter VAD ranges (40/30/25/20 dB)
     — if the drop concentrates in the loosest range, pause frames carry it;
 (b) run against a v2 corpus (make_demo_corpus.py --style v2: breath noise
     rides the syllabic envelope, pauses are true silence) — if STOI is
     flat-or-up there, the regression is the v1 artifact;
 (c) per-1/3-octave-band correlation profile (stoi_band_profile) for
     noisy-vs-clean and enhanced-vs-clean — shows WHICH bands lose temporal
     envelope correlation.

Usage:
    python tools/stoi_diagnosis.py --g_ckpt <ckpt> --cfg_file <train.opts> \
        --clean_test <dir> --noisy_test <dir> [--overlap 0.1] [--out d.json]

The reference has no STOI diagnosis tooling (its stoi.m is offline MATLAB,
/root/reference/utils/stoi.m:1-187); this is beyond-reference analysis depth.
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DYN_RANGES = (40.0, 30.0, 25.0, 20.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g_ckpt", required=True)
    ap.add_argument("--cfg_file", required=True)
    ap.add_argument("--clean_test", required=True)
    ap.add_argument("--noisy_test", required=True)
    ap.add_argument("--max_files", type=int, default=0, help="0 = all")
    ap.add_argument("--overlap", type=float, default=0.0,
                    help="overlap-add fraction for enhancement (clean.py's "
                         "--overlap); 0 = hard chunk concat")
    ap.add_argument("--seed", type=int, default=111)
    ap.add_argument("--out", default="stoi_diagnosis.json")
    args = ap.parse_args()

    import jax

    from segan_pytorch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from segan_pytorch_tpu.utils.config import load_train_opts
    from segan_pytorch_tpu.models import SEGAN, WSEGAN
    from segan_pytorch_tpu.data.wav_io import read_wav_raw
    from segan_pytorch_tpu.ops.signal import (normalize_wave_minmax,
                                              pre_emphasize_np)
    from segan_pytorch_tpu.metrics.stoi import stoi, stoi_band_profile

    cfg = load_train_opts(args.cfg_file)
    segan = (WSEGAN if cfg.wsegan else SEGAN)(cfg)
    segan.init_state(jax.random.PRNGKey(args.seed), batch_size=1)
    segan.g_load_pretrained(args.g_ckpt, True)

    noisy_files = sorted(glob.glob(os.path.join(args.noisy_test, "*.wav")))
    if args.max_files:
        noisy_files = noisy_files[: args.max_files]
    if not noisy_files:
        raise SystemExit(f"no wavs in {args.noisy_test}")

    per_dyn = {d: {"noisy": [], "enh": []} for d in DYN_RANGES}
    band_noisy, band_enh = [], []
    cf = None
    for i, nf in enumerate(noisy_files, 1):
        bname = os.path.basename(nf)
        cfp = os.path.join(args.clean_test, bname)
        _, nwav = read_wav_raw(nf)
        _, cwav = read_wav_raw(cfp)
        clean = np.asarray(normalize_wave_minmax(np.asarray(cwav)), np.float32)
        noisy = np.asarray(normalize_wave_minmax(np.asarray(nwav)), np.float32)
        pwav = pre_emphasize_np(noisy, cfg.preemph)
        kw = {"overlap": args.overlap} if args.overlap > 0 else {}
        enh, _ = segan.generate(pwav, **kw)
        enh = enh.astype(np.float32)
        for d in DYN_RANGES:
            per_dyn[d]["noisy"].append(stoi(clean, noisy, 16000, dyn_range=d))
            per_dyn[d]["enh"].append(stoi(clean, enh, 16000, dyn_range=d))
        cf, bn = stoi_band_profile(clean, noisy, 16000)
        _, be = stoi_band_profile(clean, enh, 16000)
        band_noisy.append(bn)
        band_enh.append(be)
        print(f"[{i}/{len(noisy_files)}] {bname} "
              f"STOI@40 {per_dyn[40.0]['noisy'][-1]:.3f} -> "
              f"{per_dyn[40.0]['enh'][-1]:.3f}   "
              f"@25 {per_dyn[25.0]['noisy'][-1]:.3f} -> "
              f"{per_dyn[25.0]['enh'][-1]:.3f}")

    def m(v):
        return float(np.nanmean(v))

    report = {
        "n_files": len(noisy_files),
        "overlap": args.overlap,
        "stoi_by_dyn_range": {
            str(int(d)): {"noisy": m(per_dyn[d]["noisy"]),
                          "enh": m(per_dyn[d]["enh"]),
                          "delta": m(per_dyn[d]["enh"]) - m(per_dyn[d]["noisy"])}
            for d in DYN_RANGES},
        "band_center_hz": [round(float(x), 1) for x in cf],
        "band_corr_noisy": [round(float(x), 4)
                            for x in np.nanmean(band_noisy, axis=0)],
        "band_corr_enh": [round(float(x), 4)
                          for x in np.nanmean(band_enh, axis=0)],
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)

    print("\n=== STOI by VAD dynamic range (dB below peak frame) ===")
    print("dyn_range   noisy    enh    delta")
    for d in DYN_RANGES:
        r = report["stoi_by_dyn_range"][str(int(d))]
        print(f"{int(d):>6d}     {r['noisy']:.4f}  {r['enh']:.4f}  "
              f"{r['delta']:+.4f}")
    print("\n=== per-band mean correlation (noisy -> enh) ===")
    for hz, a, b in zip(report["band_center_hz"], report["band_corr_noisy"],
                        report["band_corr_enh"]):
        print(f"{hz:>8.0f} Hz  {a:.3f} -> {b:.3f}  ({b - a:+.3f})")
    print(f"report -> {args.out}")


if __name__ == "__main__":
    main()
