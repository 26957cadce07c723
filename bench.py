"""Benchmark: SEGAN+ fused G+D train-step throughput (slices/sec/chip) on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline note: the reference repo publishes NO benchmark numbers (BASELINE.md); its train
loop only logs its own step time. `vs_baseline` is therefore computed against a documented
estimate of the single-GPU PyTorch-0.4 reference at its canonical config (batch 300,
RMSprop, ref run_segan+_train.sh): ~500 slices/sec on a V100-class GPU (≈0.6 s/step).

--dp N shards the batch over an N-device mesh (XLA inserts the gradient all-reduces).
Real multi-chip hardware is not reachable from this container, so --dp is exercised on
the virtual CPU mesh (SEGAN_TPU_PLATFORM=cpu, 8 host devices) to measure step overhead
and validate scaling mechanics; the single-chip TPU number stays the headline.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_SLICES_PER_SEC_EST = 500.0


def last_driver_measurement(repo_root=None):
    """Last live chip measurement, read from the newest BENCH_r*.json driver
    artifact — the single source of truth for the headline number (so a wedged
    chip's fail-fast JSON can't drift from what the driver actually recorded).
    Returns {} when no artifact parsed a live value (e.g. round 1)."""
    import os
    import re

    root = repo_root or os.path.dirname(os.path.abspath(__file__))
    best = None  # (round_n, parsed dict)
    for fn in os.listdir(root):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if not m:
            continue
        try:
            with open(os.path.join(root, fn)) as f:
                parsed = json.load(f).get("parsed") or {}
        except (OSError, ValueError):
            continue
        if parsed.get("value", 0) > 0:  # a live (not fail-fast) measurement
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, parsed)
    if best is None:
        return {}
    n, parsed = best
    out = {"last_live_value": parsed["value"], "last_live_round": n,
           "last_live_note": "same default config, measured live on the chip "
                             f"by the round-{n} driver (BENCH_r{n:02d}.json)"}
    if "mfu" in parsed:
        out["last_live_mfu"] = parsed["mfu"]
    return out


def main():
    parser = argparse.ArgumentParser()
    # batch 300 = the reference's canonical config (run_segan+_train.sh) and the
    # measured throughput sweet spot (BENCH.md)
    parser.add_argument("--batch_size", type=int, default=300)
    parser.add_argument("--steps", type=int, default=15)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    parser.add_argument("--use_pallas", action="store_true", default=False)
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel shards (needs >= dp devices; use "
                             "SEGAN_TPU_PLATFORM=cpu for the 8-device virtual mesh)")
    parser.add_argument("--preset", type=str, default="full",
                        choices=["full", "tiny"],
                        help="'full' = the flagship SEGAN+ config (headline number); "
                             "'tiny' = small model for DP-mechanics/overhead runs on "
                             "the virtual CPU mesh, where the full model is too slow "
                             "to compile")
    parser.add_argument("--steps_per_call", type=int, default=4,
                        help="Full train steps per dispatched program "
                             "(lax.scan): amortizes the per-dispatch fixed "
                             "cost; math identical per step. Matches the train "
                             "loops' --steps_per_call (all three engines); "
                             "1 = single-step dispatch.")
    parser.add_argument("--engine", type=str, default="segan",
                        choices=["segan", "wsegan", "aewsegan"],
                        help="'wsegan' benches the WSEGAN step at its canonical "
                             "flag set (snorm G/D, adam, misalign_pair — "
                             "run_wsegan_train.sh; canonical batch 150); "
                             "'aewsegan' the G-only autoencoder step (adam)")
    args = parser.parse_args()

    import os

    # Fail FAST (one diagnostic JSON line) instead of hanging forever when the
    # remote chip grant is wedged (BENCH.md environment caveats): probe the
    # backend with a tiny matmul in a bounded SUBPROCESS — the hang lives
    # inside PJRT client init, which has no timeout knob in-process.
    # SEGAN_TPU_BENCH_PROBE=0 skips; CPU-forced runs never dial the relay.
    if (os.environ.get("SEGAN_TPU_BENCH_PROBE", "1") != "0"
            and os.environ.get("SEGAN_TPU_PLATFORM") != "cpu"):
        import subprocess
        import sys

        def _probe():
            # NOT subprocess.run(timeout=...): that SIGKILLs the child on
            # timeout, and a SIGKILLed axon client mid-dial is precisely what
            # wedges the chip grant for hours (BENCH.md caveats / verify
            # skill traps). SIGTERM first, SIGKILL only if it ignores that.
            proc = subprocess.Popen(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8)))))"],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            try:
                rc = proc.wait(
                    timeout=float(os.environ.get("SEGAN_TPU_BENCH_PROBE_S",
                                                 "900")))
            except subprocess.TimeoutExpired:
                proc.terminate()
                try:
                    proc.wait(timeout=15)
                except subprocess.TimeoutExpired:  # pragma: no cover
                    proc.kill()
                    proc.wait()
                raise
            if rc != 0:
                raise subprocess.CalledProcessError(rc, "device probe")

        try:
            _probe()
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            print(json.dumps({
                "metric": "train_slices_per_sec_per_chip", "value": 0.0,
                "unit": "slices/s/chip", "vs_baseline": 0.0,
                "error": f"device probe failed ({type(e).__name__}): the "
                         "remote chip grant is unreachable/wedged — see "
                         "BENCH.md environment caveats",
                **last_driver_measurement()}))
            raise SystemExit(2)

    import jax

    from segan_pytorch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from segan_pytorch_tpu.utils.config import SEGANConfig
    from segan_pytorch_tpu.models import SEGAN, WSEGAN

    n_chips = max(args.dp, 1)
    if len(jax.devices()) < n_chips:
        raise SystemExit(
            f"--dp {args.dp} needs {n_chips} devices, have {len(jax.devices())} "
            f"(set SEGAN_TPU_PLATFORM=cpu for the virtual 8-device mesh)")
    arch = {}
    if args.preset == "tiny":
        arch = dict(slice_size=4096, genc_fmaps=[16, 32, 64],
                    genc_poolings=[4, 4, 4], z_dim=64,
                    denc_fmaps=[16, 32, 64], denc_poolings=[4, 4, 4],
                    dpool_slen=64)
    extra = {}
    if args.engine == "wsegan":
        extra = dict(wsegan=True, gnorm_type="snorm", dnorm_type="snorm",
                     opt="adam", misalign_pair=True)
    elif args.engine == "aewsegan":
        extra = dict(aewsegan=True, opt="adam")
    cfg = SEGANConfig(batch_size=args.batch_size, save_path="/tmp/bench_segan",
                      compute_dtype=args.compute_dtype, no_train_gen=True,
                      use_pallas=args.use_pallas, dp=args.dp, **arch, **extra)
    from segan_pytorch_tpu.models import AEWSEGAN

    engine_cls = {"segan": SEGAN, "wsegan": WSEGAN,
                  "aewsegan": AEWSEGAN}[args.engine]
    segan = engine_cls(cfg)
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

    # warmup (compile).  NB: completion is forced with a D2H scalar fetch, NOT
    # jax.block_until_ready — the latter can return before execution finishes on the
    # remote 'axon' tunnel platform, silently inflating throughput.
    if args.engine == "wsegan" and args.steps_per_call <= 1:
        amask = jnp.zeros((B,), jnp.float32)  # no 'additive' utterances

        def one_step(k):
            return segan.train_step(clean, noisy, mask, amask, k, 100.0)
        fetch_key = "d_real"
    elif args.steps_per_call > 1:
        S = args.steps_per_call
        segan.prepare_multi_step(S)
        stacked = [jnp.broadcast_to(a, (S,) + a.shape)
                   for a in (clean, noisy, mask)]
        if args.engine == "wsegan":
            stacked.append(jnp.zeros((S, B), jnp.float32))  # additive mask
        l1_s = jnp.full((S,), 100.0, jnp.float32)

        def one_step(k):
            _, metrics, Genh, z = segan.train_step_multi(
                *stacked, rng=k, l1_w_s=l1_s)
            return metrics, Genh, z
        fetch_key = "loss" if args.engine == "aewsegan" else "d_real"
    else:
        def one_step(k):
            return segan.train_step(clean, noisy, mask, k, 100.0)
        fetch_key = "loss" if args.engine == "aewsegan" else "d_real"
    metrics = None
    for i in range(args.warmup):
        key, k = jax.random.split(key)
        metrics, _, _ = one_step(k)
    if metrics is not None:
        float(metrics[fetch_key])

    t0 = time.perf_counter()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        metrics, _, _ = one_step(k)
    float(metrics[fetch_key])  # forces the whole dependent step chain
    dt = time.perf_counter() - t0

    steps_per_sec = args.steps / dt * max(args.steps_per_call, 1)
    slices_per_sec_per_chip = steps_per_sec * B / n_chips
    result = {
        "metric": "train_slices_per_sec_per_chip",
        **({"engine": args.engine} if args.engine != "segan" else {}),
        "value": round(slices_per_sec_per_chip, 2),
        "unit": "slices/s/chip",
        "vs_baseline": round(slices_per_sec_per_chip / BASELINE_SLICES_PER_SEC_EST, 3),
    }
    if args.dp > 1:
        result["dp"] = args.dp
        result["aggregate_slices_per_sec"] = round(steps_per_sec * B, 2)
    from segan_pytorch_tpu.utils.profiling import mfu

    flops = segan.step_flops()
    if flops is not None and args.steps_per_call > 1:
        # XLA cost analysis counts a lax.scan body ONCE regardless of trip
        # count (observed: S=4 reported exactly 1/4 of the single-step MFU);
        # scale to the S steps the timed call actually executes
        flops *= args.steps_per_call
        result["steps_per_call"] = args.steps_per_call
    step_mfu = mfu(flops, dt / args.steps, n_chips)
    if step_mfu is not None:
        result["mfu"] = round(step_mfu, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
