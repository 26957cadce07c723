"""Validate the native P.862 implementation against a certified backend.

Run this whenever an ITU `pesqmain` binary (or the python `pesq` package) is
available — neither exists in the build container, so the native pipeline ships
response-validated but not ITU-certified.  The tool:

1. generates a deterministic synthetic degradation corpus (speech-like carriers
   x {additive noise at several SNRs, lowpass, clipping, gain, small delay});
2. scores every pair with the certified backend and with the native pipeline;
3. prints per-condition errors + Pearson correlation;
4. writes tests/golden/pesq_golden.json so tests/test_pesq_native.py pins the
   native implementation against the certified numbers from then on.

Usage:  python tools/pesq_validate.py [--out tests/golden/pesq_golden.json]
"""
import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FS = 16000


def speech_like(seconds: float, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    n = int(FS * seconds)
    t = np.arange(n) / FS
    env = np.clip(np.sin(2 * np.pi * (2.0 + 0.3 * seed) * t) + 0.3, 0, None)
    f0 = 110 + 15 * seed % 60 + 25 * np.sin(2 * np.pi * 0.5 * t)
    ph = 2 * np.pi * np.cumsum(f0) / FS
    sig = sum(np.exp(-(k / 8.0)) * np.sin(k * ph) for k in range(1, 25))
    sig = env * sig * 0.12 + 0.001 * rng.randn(n)
    return sig.astype(np.float32)


def degradations(clean: np.ndarray, seed: int):
    rng = np.random.RandomState(1000 + seed)
    out = {}
    for snr in (30, 20, 10, 5):
        nse = rng.randn(len(clean)).astype(np.float32)
        nse *= np.sqrt(np.mean(clean ** 2) / np.mean(nse ** 2)) * 10 ** (-snr / 20)
        out[f"awgn_{snr}dB"] = clean + nse
    out["lowpass"] = np.convolve(clean, np.ones(9) / 9, "same").astype(np.float32)
    out["clip"] = np.clip(clean, -0.05, 0.05)
    out["gain_0.3"] = (0.3 * clean).astype(np.float32)
    d = np.concatenate([np.zeros(320, np.float32), clean])[: len(clean)]
    out["delay_20ms"] = d
    return out


def certified_backend():
    from segan_pytorch_tpu.metrics.pesq import _pesq_binary, _pesq_python

    if shutil.which("pesqmain") is not None:
        return "pesqmain", _pesq_binary
    try:
        import pesq  # noqa: F401

        return "python-pesq", _pesq_python
    except ImportError:
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden", "pesq_golden.json"))
    args = ap.parse_args()

    name, certified = certified_backend()
    if certified is None:
        raise SystemExit(
            "No certified PESQ backend on this machine (need `pesqmain` on PATH "
            "or the python `pesq` package). Re-run where one is available.")
    from segan_pytorch_tpu.metrics.pesq_native import pesq_native

    rows = []
    for seed in range(4):
        clean = speech_like(3.0, seed)
        for cond, deg in degradations(clean, seed).items():
            cert = certified(clean, deg, FS)
            nat = pesq_native(clean, deg, FS, wb=True)
            rows.append({"seed": seed, "cond": cond,
                         "certified": cert, "native": nat})
            print(f"seed {seed} {cond:12s} certified={cert:.3f} native={nat:.3f}"
                  f"  diff={nat - cert:+.3f}")
    cert_v = np.array([r["certified"] for r in rows])
    nat_v = np.array([r["native"] for r in rows])
    corr = float(np.corrcoef(cert_v, nat_v)[0, 1])
    mae = float(np.mean(np.abs(cert_v - nat_v)))
    print(f"\nPearson r = {corr:.4f}   MAE = {mae:.3f} MOS  (backend: {name})")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"backend": name, "fs": FS, "mode": "wb",
                   "pearson_r": corr, "mae": mae, "rows": rows}, f, indent=2)
    print(f"golden vectors -> {args.out}")


if __name__ == "__main__":
    main()
