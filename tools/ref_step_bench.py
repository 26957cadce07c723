"""Measured reference-torch train-step time at the canonical config (VERDICT
r4 weak-2: the perf headline's denominator was a documented estimate — put a
measured number under it).

Runs the ACTUAL reference SEGAN (full 91M canonical architecture,
/root/reference/segan/models/model.py) for a few timed train steps on CPU via
its own train_step path (the same 3-phase D-real/D-fake/G update the trainer
executes), and this framework's train_step on the SAME CPU with the SAME
config/batch — a hardware-matched, same-math ratio. Both sides measure
per-step wall time after a warmup step; slices/s = batch / step_time.

The TPU headline (BENCH_r*.json, ~2744 slices/s/chip at batch 300) can then be
quoted against BOTH:
  * the documented V100 estimate (~500 slices/s, BASELINE.md) and
  * measured same-CPU torch slices/s times the honest caveat that GPU/CPU
    hardware differs (this tool measures software overhead parity, not a GPU).

Run it SOLO (no concurrent training/benchmarks — 1-core container, timings
poison each other).

Usage:
    python -u tools/ref_step_bench.py --batch 8 --steps 3 \
        --out tools/r5_ref_step_bench.json
"""
import argparse
import importlib.util
import json
import os
import sys
import time
import types

os.environ.setdefault("SEGAN_TPU_PLATFORM", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools", "ref_stubs"))
sys.path.insert(0, "/root/reference")


def canonical_ns(batch):
    """The released canonical config (ckpt_segan+/train.opts) as a namespace
    for the reference constructors, reduced only in batch size."""
    d = json.load(open("/root/reference/ckpt_segan+/train.opts"))
    d["batch_size"] = batch
    d["cuda"] = False
    ns = types.SimpleNamespace(**d)
    if not hasattr(ns, "reg_loss"):
        ns.reg_loss = "l1_loss" if getattr(ns, "l1_loss", True) else "mse_loss"
    return ns


def bench_reference(batch, steps):
    import numpy as np
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    torch.set_num_threads(max(1, os.cpu_count()))
    # Import as a real package (model.py does `from ..datasets import *`, so a
    # bare spec_from_file_location load breaks on the relative imports); the
    # ref_stubs dir earlier on sys.path satisfies its third-party deps.
    m = importlib.import_module("segan.models.model")

    opts = canonical_ns(batch)
    segan = m.SEGAN(opts)
    # NB: the reference overrides .train() as its training LOOP
    # (model.py:230) — set torch train mode on the submodules directly.
    segan.G.train()
    segan.D.train()
    Gopt, Dopt = segan.build_optimizers(opts)
    criterion = nn.MSELoss()
    clean = torch.randn(batch, 1, opts.slice_size)
    noisy = clean + 0.1 * torch.randn(batch, 1, opts.slice_size)
    label = torch.ones(batch)

    def step():
        # the exact 3-phase update of ref model.py:292-321
        Dopt.zero_grad()
        Genh = segan.infer_G(noisy, clean)
        d_real, _ = segan.infer_D(clean, noisy)
        criterion(d_real.view(-1), label.fill_(1)).backward()
        d_fake, _ = segan.infer_D(Genh.detach(), noisy)
        criterion(d_fake.view(-1), label.fill_(0)).backward()
        Dopt.step()
        Gopt.zero_grad()
        d_fake_, _ = segan.infer_D(Genh, noisy)
        g_adv = criterion(d_fake_.view(-1), label.fill_(1))
        g_l1 = 100.0 * segan.reg_loss(Genh, clean)
        (g_adv + g_l1).backward()
        Gopt.step()

    step()  # warmup (allocator, thread pools)
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    n_g = sum(p.numel() for p in segan.G.parameters())
    n_d = sum(p.numel() for p in segan.D.parameters())
    return {"per_step_s": [round(t, 3) for t in times],
            "mean_step_s": round(float(np.mean(times)), 3),
            "slices_per_sec": round(batch / float(np.mean(times)), 2),
            "d_params": int(n_d),
            "g_params": int(n_g)}


def bench_ours(batch, steps):
    import numpy as np

    from segan_pytorch_tpu.utils.cache import force_platform_from_env
    force_platform_from_env()
    import jax

    from segan_pytorch_tpu.models import SEGAN
    from segan_pytorch_tpu.utils.config import SEGANConfig

    d = json.load(open("/root/reference/ckpt_segan+/train.opts"))
    cfg = SEGANConfig.from_dict(d)
    cfg.batch_size = batch
    cfg.save_path = "/tmp/ref_step_bench_ours"
    segan = SEGAN(cfg)
    segan.init_state(jax.random.PRNGKey(0), batch_size=batch)
    segan.prepare_train(batch)
    rng = np.random.RandomState(0)
    clean = rng.randn(batch, cfg.slice_size, 1).astype("float32") * 0.3
    noisy = clean + 0.1 * rng.randn(batch, cfg.slice_size, 1).astype("float32")
    mask = np.ones((batch,), "float32")

    def step(i):
        metrics, _, _ = segan.train_step(clean, noisy, mask,
                                         jax.random.PRNGKey(i), 100.0)
        jax.block_until_ready(metrics["g_l1"])

    step(0)  # warmup incl. compile
    times = []
    for i in range(1, steps + 1):
        t0 = time.perf_counter()
        step(i)
        times.append(time.perf_counter() - t0)
    import numpy as _np
    n_g = sum(int(_np.prod(x.shape))
              for x in jax.tree.leaves(segan.state.g_params))
    n_d = sum(int(_np.prod(x.shape))
              for x in jax.tree.leaves(segan.state.d_params))
    return {"per_step_s": [round(t, 3) for t in times],
            "mean_step_s": round(float(np.mean(times)), 3),
            "slices_per_sec": round(batch / float(np.mean(times)), 2),
            "d_params": int(n_d),
            "g_params": int(n_g)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="tools/r5_ref_step_bench.json")
    ap.add_argument("--sides", nargs="+", default=["ref", "ours"],
                    choices=["ref", "ours"])
    args = ap.parse_args()

    report = {"config": "canonical ckpt_segan+/train.opts arch, fp32 CPU",
              "batch": args.batch, "host_cpus": os.cpu_count()}
    if "ref" in args.sides:
        report["reference_torch_cpu"] = bench_reference(args.batch, args.steps)
        print("[ref]", json.dumps(report["reference_torch_cpu"]), flush=True)
    if "ours" in args.sides:
        report["ours_jax_cpu"] = bench_ours(args.batch, args.steps)
        print("[ours]", json.dumps(report["ours_jax_cpu"]), flush=True)
    if len(args.sides) == 2:
        report["ours_over_ref_cpu"] = round(
            report["ours_jax_cpu"]["slices_per_sec"]
            / report["reference_torch_cpu"]["slices_per_sec"], 3)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "config"}),
          flush=True)


if __name__ == "__main__":
    main()
