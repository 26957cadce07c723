"""Released-checkpoint / Valentini parity harness (BASELINE.md north-star gate).

Given a generator checkpoint (torch .ckpt like the released `segan+_generator.ckpt`,
or a native one), a train.opts config, and a clean/noisy test directory pair, this
tool runs reference-style enhancement (normalize -> pre-emphasis -> chunked generate
-> de-emphasis, exactly clean.py's pipeline) and emits the BASELINE.md metric rows:
PESQ / STOI / CSIG / CBAK / COVL / SSNR for the noisy baseline and the enhanced
output.

With --ab_torch it ALSO runs the ACTUAL reference PyTorch Generator
(/root/reference/segan) on the same inputs with the same checkpoint and reports
waveform-level A/B parity (max sample diff, diff SNR) plus per-metric deltas — the
gate that the released checkpoint produces the same audio through this framework.

The moment the released ckpt + Valentini data are obtainable, the full gate is:

    python tools/ab_parity.py --g_ckpt segan+_generator.ckpt \
        --cfg_file ckpt_segan+/train.opts \
        --clean_test <valentini>/clean_testset_wav_16k \
        --noisy_test <valentini>/noisy_testset_wav_16k \
        --ab_torch --out parity_report.json

and the rows compare against arXiv:1703.09452 Table 1 (PESQ 2.16, CSIG 3.48,
CBAK 2.94, COVL 2.80, SSNR 7.73; noisy PESQ 1.97).
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PAPER_ROWS = {  # arXiv:1703.09452 Table 1 (Valentini 28-spk testset)
    "noisy": {"pesq": 1.97, "csig": 3.35, "cbak": 2.44, "covl": 2.63, "ssnr": 1.68},
    "segan": {"pesq": 2.16, "csig": 3.48, "cbak": 2.94, "covl": 2.80, "ssnr": 7.73},
}


def load_reference_torch_generator(cfg, ckpt_path):
    """Instantiate the ACTUAL reference torch Generator from /root/reference with
    this config and load the checkpoint into it (for A/B parity)."""
    import importlib.util
    import types

    import torch

    for name in ("numba", "soundfile", "librosa", "tensorboardX", "torchvision",
                 "torchvision.utils", "ahoproc_tools", "ahoproc_tools.io",
                 "ahoproc_tools.interpolate"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "numba":
                mod.jit = lambda *a, **k: (lambda f: f)
                mod.int32 = mod.float32 = None
            if name == "tensorboardX":
                mod.SummaryWriter = object
            sys.modules[name] = mod
    sys.path.insert(0, "/root/reference/segan/models")
    spec = importlib.util.spec_from_file_location(
        "ref_generator", "/root/reference/segan/models/generator.py")
    ref_gen = importlib.util.module_from_spec(spec)
    sys.modules["ref_generator"] = ref_gen
    spec.loader.exec_module(ref_gen)

    kwidth = cfg.gkwidth
    RG = ref_gen.Generator(
        1, cfg.genc_fmaps, kwidth, cfg.genc_poolings,
        dec_fmaps=cfg.gdec_fmaps, dec_kwidth=cfg.gdec_kwidth,
        dec_poolings=cfg.gdec_poolings,
        z_dim=cfg.z_dim, no_z=cfg.no_z, skip=not cfg.no_skip,
        bias=cfg.bias, skip_init=cfg.skip_init,
        skip_dropout=getattr(cfg, "skip_dropout", 0),
        skip_type=cfg.skip_type, norm_type=cfg.gnorm_type,
        skip_merge=cfg.skip_merge, skip_kwidth=cfg.skip_kwidth)
    st = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if "state_dict" in st:
        st = st["state_dict"]
    RG.load_state_dict(st, strict=False)
    RG.eval()
    return RG


def reference_generate(RG, pwav, z, slice_size):
    """The reference's chunked inference loop (ref model.py:116-157): sequential
    16384 chunks, zero-padded tail, one z shared across chunks."""
    import torch

    zt = None
    if z is not None:
        zt = torch.from_numpy(
            np.ascontiguousarray(np.asarray(z, np.float32).transpose(0, 2, 1)))
    out = []
    with torch.no_grad():
        for beg in range(0, len(pwav), slice_size):
            chunk = pwav[beg:beg + slice_size]
            pad = slice_size - len(chunk)
            if pad > 0:
                chunk = np.concatenate([chunk, np.zeros(pad, np.float32)])
            x = torch.from_numpy(chunk.astype(np.float32))[None, None, :]
            y = RG(x, z=zt) if zt is not None else RG(x)
            out.append(y.numpy().reshape(-1))
    return np.concatenate(out)[:len(pwav)]


def score(clean, enh):
    from segan_pytorch_tpu.metrics import CompositeEval
    from segan_pytorch_tpu.metrics.stoi import stoi

    csig, cbak, covl, pesq, ssnr = CompositeEval(clean, enh, True)
    return {"pesq": float(pesq), "stoi": float(stoi(clean, enh, 16000)),
            "csig": float(csig), "cbak": float(cbak), "covl": float(covl),
            "ssnr": float(ssnr)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g_ckpt", required=True,
                    help="generator checkpoint (torch .ckpt or native)")
    ap.add_argument("--cfg_file", required=True, help="train.opts JSON")
    ap.add_argument("--clean_test", required=True)
    ap.add_argument("--noisy_test", required=True)
    ap.add_argument("--out", default="parity_report.json")
    ap.add_argument("--ab_torch", action="store_true",
                    help="also run the reference torch Generator for waveform A/B")
    ap.add_argument("--max_files", type=int, default=0, help="0 = all")
    ap.add_argument("--seed", type=int, default=111)
    args = ap.parse_args()

    import jax

    from segan_pytorch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from segan_pytorch_tpu.utils.config import load_train_opts
    from segan_pytorch_tpu.models import SEGAN, WSEGAN
    from segan_pytorch_tpu.data.wav_io import read_wav_raw
    from segan_pytorch_tpu.ops.signal import normalize_wave_minmax, \
        pre_emphasize_np

    cfg = load_train_opts(args.cfg_file)
    segan = (WSEGAN if cfg.wsegan else SEGAN)(cfg)
    segan.init_state(jax.random.PRNGKey(args.seed), batch_size=1)
    segan.g_load_pretrained(args.g_ckpt, True)

    RG = None
    if args.ab_torch:
        RG = load_reference_torch_generator(cfg, args.g_ckpt)

    noisy_files = sorted(glob.glob(os.path.join(args.noisy_test, "*.wav")))
    if args.max_files:
        noisy_files = noisy_files[: args.max_files]
    if not noisy_files:
        raise SystemExit(f"no wavs in {args.noisy_test}")

    rows = []
    agg = {"noisy": [], "enh": [], "enh_torch": []}
    ab = {"max_diff": 0.0, "diff_snr_db": []}
    for i, nf in enumerate(noisy_files, 1):
        bname = os.path.basename(nf)
        cf = os.path.join(args.clean_test, bname)
        if not os.path.exists(cf):
            raise SystemExit(f"missing clean reference {cf}")
        _, nwav = read_wav_raw(nf)
        _, cwav = read_wav_raw(cf)
        pwav = pre_emphasize_np(
            np.asarray(normalize_wave_minmax(np.asarray(nwav))), cfg.preemph)
        clean = np.asarray(normalize_wave_minmax(np.asarray(cwav)), np.float32)
        noisy_scored = np.asarray(normalize_wave_minmax(np.asarray(nwav)),
                                  np.float32)

        enh, _ = segan.generate(pwav)
        r = {"file": bname, "noisy": score(clean, noisy_scored),
             "enh": score(clean, enh.astype(np.float32))}
        agg["noisy"].append(r["noisy"])
        agg["enh"].append(r["enh"])

        if RG is not None:
            from segan_pytorch_tpu.ops.signal import de_emphasize_np

            z = segan.z if not segan.G.no_z else None
            raw = reference_generate(RG, pwav, z, cfg.slice_size)
            enh_t = de_emphasize_np(raw.astype(np.float32), cfg.preemph)
            r["enh_torch"] = score(clean, enh_t)
            agg["enh_torch"].append(r["enh_torch"])
            d = enh.astype(np.float64) - enh_t.astype(np.float64)
            ab["max_diff"] = max(ab["max_diff"], float(np.max(np.abs(d))))
            p_sig = float(np.mean(enh_t.astype(np.float64) ** 2)) + 1e-20
            p_d = float(np.mean(d ** 2)) + 1e-20
            ab["diff_snr_db"].append(10 * np.log10(p_sig / p_d))
        rows.append(r)
        print(f"[{i}/{len(noisy_files)}] {bname} "
              f"noisy PESQ {r['noisy']['pesq']:.2f} -> enh {r['enh']['pesq']:.2f}")

    def means(lst):
        return {k: float(np.mean([x[k] for x in lst])) for k in lst[0]} if lst else {}

    report = {
        "n_files": len(rows),
        "means": {k: means(v) for k, v in agg.items() if v},
        "paper_rows": PAPER_ROWS,
        "rows": rows,
    }
    if RG is not None:
        report["ab"] = {"max_sample_diff": ab["max_diff"],
                        "mean_diff_snr_db": float(np.mean(ab["diff_snr_db"]))}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)

    print("\n=== BASELINE.md rows (means) ===")
    hdr = ["pesq", "stoi", "csig", "cbak", "covl", "ssnr"]
    print("system   " + "  ".join(f"{h:>6s}" for h in hdr))
    for sys_name, m in report["means"].items():
        print(f"{sys_name:8s} " + "  ".join(f"{m[h]:6.3f}" for h in hdr))
    if RG is not None:
        print(f"\nA/B parity vs reference torch: max|diff|={ab['max_diff']:.2e}, "
              f"mean diff-SNR={report['ab']['mean_diff_snr_db']:.1f} dB")
    print(f"report -> {args.out}")


if __name__ == "__main__":
    main()
