"""Benchmark: SEGAN+ fused G+D train-step throughput (slices/sec/chip) on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo publishes NO benchmark numbers (BASELINE.md); its train
loop only logs its own step time. `vs_baseline` is therefore computed against a documented
estimate of the single-GPU PyTorch-0.4 reference at its canonical config (batch 300,
RMSprop, ref run_segan+_train.sh): ~500 slices/sec on a V100-class GPU (≈0.6 s/step).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_SLICES_PER_SEC_EST = 500.0


def main():
    parser = argparse.ArgumentParser()
    # batch 300 = the reference's canonical config (run_segan+_train.sh) and the
    # measured throughput sweet spot (BENCH.md)
    parser.add_argument("--batch_size", type=int, default=300)
    parser.add_argument("--steps", type=int, default=15)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    parser.add_argument("--use_pallas", action="store_true", default=False)
    args = parser.parse_args()

    import jax

    from segan_pytorch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from segan_pytorch_tpu.utils.config import SEGANConfig
    from segan_pytorch_tpu.models import SEGAN

    # the fused step runs on ONE device unless a dp mesh is requested; dividing by
    # all visible chips would misreport per-chip throughput on multi-chip hosts
    n_chips = 1
    cfg = SEGANConfig(batch_size=args.batch_size, save_path="/tmp/bench_segan",
                      compute_dtype=args.compute_dtype, no_train_gen=True,
                      use_pallas=args.use_pallas)
    segan = SEGAN(cfg)
    segan.init_state(batch_size=args.batch_size)
    segan.prepare_train(args.batch_size)

    B, T = args.batch_size, cfg.slice_size
    rng = np.random.RandomState(0)
    # stage the batch on device: training overlaps H2D with compute via the loader's
    # device prefetch, so steady-state step time excludes the transfer
    import jax.numpy as jnp

    clean = jnp.asarray((rng.randn(B, T, 1) * 0.1).astype(np.float32))
    noisy = clean + jnp.asarray((rng.randn(B, T, 1) * 0.02).astype(np.float32))
    mask = jnp.ones((B,), jnp.float32)
    jax.block_until_ready((clean, noisy))
    key = jax.random.PRNGKey(0)

    # warmup (compile)
    metrics = None
    for i in range(args.warmup):
        key, k = jax.random.split(key)
        metrics, _, _ = segan.train_step(clean, noisy, mask, k, 100.0)
    if metrics is not None:
        jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        metrics, _, _ = segan.train_step(clean, noisy, mask, k, 100.0)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    steps_per_sec = args.steps / dt
    slices_per_sec_per_chip = steps_per_sec * B / max(n_chips, 1)
    result = {
        "metric": "train_slices_per_sec_per_chip",
        "value": round(slices_per_sec_per_chip, 2),
        "unit": "slices/s/chip",
        "vs_baseline": round(slices_per_sec_per_chip / BASELINE_SLICES_PER_SEC_EST, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
