"""Engine-generation lifecycle probe: does a retired serving generation
actually release its memory?

The 30-min serving soak (tools/serving_soak.py) showed RSS ramping for ~25 min
before going flat — ambiguous between a per-reload leak and allocator warmup
(glibc arenas do not return freed pages to the OS, so RSS alone cannot tell).
This probe answers it directly, without the HTTP layer or the 150 s retirement
overlap: build engine+batchers exactly the way serve.py's /admin/reload does,
run work through them, close+drop the generation, gc, and then check

  * weakref liveness — a collected engine/batcher proves no global registry,
    jit cache, or thread still pins the generation;
  * live jax device buffers — must return to the baseline count after each
    generation is dropped (params/executables released);
  * RSS trend per generation — with liveness proven, residual RSS growth is
    allocator retention, not a Python-object leak.

Usage:
    SEGAN_TPU_PLATFORM=cpu python -u tools/reload_leak_probe.py \
        --ckpt_dir /tmp/soak_ckpt --iters 20 --out tools/r5_reload_leak_probe.json
"""
import argparse
import gc
import json
import os
import sys
import weakref

os.environ.setdefault("SEGAN_TPU_PLATFORM", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def rss_kb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return -1


def n_live_buffers():
    import jax
    return len(jax.live_arrays())


def one_generation(cfg_file, g_ckpt, wav):
    """Build + exercise + retire one serving generation (serve.py semantics)."""
    from segan_pytorch_tpu.utils.engine import build_enhancement_engine
    from segan_pytorch_tpu.utils.serving import (MicroBatcher,
                                                 StreamingEnhancer,
                                                 WindowBatcher)

    cfg, engine = build_enhancement_engine(cfg_file, g_ckpt, seed=7)
    engine.generate(wav)                      # warm, like serve.py startup
    batcher = MicroBatcher(engine)
    wb = WindowBatcher(engine)
    wb.warm(cfg.slice_size, max_rows=8)
    batcher.enhance(wav)                      # run real work through both
    sess = StreamingEnhancer(engine, window=cfg.slice_size, overlap=0.25,
                             batcher=wb)
    sess.feed(wav[: cfg.slice_size * 2])
    sess.flush()
    batcher.close()
    wb.close()
    return weakref.ref(engine), weakref.ref(batcher), weakref.ref(wb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", required=True,
                    help="dir with weights_EOE_G-Generator-1.ckpt + train.opts")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="tools/r5_reload_leak_probe.json")
    args = ap.parse_args()

    from segan_pytorch_tpu.utils.cache import force_platform_from_env
    force_platform_from_env()
    import numpy as np

    cfg_file = os.path.join(args.ckpt_dir, "train.opts")
    g_ckpt = os.path.join(args.ckpt_dir, "weights_EOE_G-Generator-1.ckpt")
    wav = (0.1 * np.sin(2 * np.pi * 220 *
                        np.arange(16000) / 16000)).astype(np.float32)

    # first generation outside the measured loop: global jax/XLA init
    one_generation(cfg_file, g_ckpt, wav)
    gc.collect()
    base_buffers = n_live_buffers()
    base_rss = rss_kb()
    rows = []
    alive = {"engine": 0, "batcher": 0, "wb": 0}
    for i in range(args.iters):
        refs = one_generation(cfg_file, g_ckpt, wav)
        gc.collect()
        for name, r in zip(("engine", "batcher", "wb"), refs):
            if r() is not None:
                alive[name] += 1
        rows.append({"iter": i, "rss_kb": rss_kb(),
                     "live_buffers": n_live_buffers()})
        print(f"[probe] gen {i}: rss={rows[-1]['rss_kb']}KB "
              f"buffers={rows[-1]['live_buffers']} "
              f"alive={ {k: v for k, v in alive.items() if v} }", flush=True)

    tail = rows[args.iters // 2:]
    kb_per_gen = ((tail[-1]["rss_kb"] - tail[0]["rss_kb"])
                  / max(1, len(tail) - 1))
    report = {
        "iters": args.iters,
        "baseline": {"rss_kb": base_rss, "live_buffers": base_buffers},
        "uncollected_generations": alive,
        "buffer_leak": rows[-1]["live_buffers"] - base_buffers,
        "rss_kb_per_generation_tail": round(kb_per_gen, 1),
        "rows": rows,
        "verdict": {
            "objects_collected": all(v == 0 for v in alive.values()),
            "buffers_released": rows[-1]["live_buffers"] <= base_buffers,
        },
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("[probe]", json.dumps(report["verdict"]),
          f"rss_kb_per_generation_tail={report['rss_kb_per_generation_tail']}",
          f"buffer_leak={report['buffer_leak']}", flush=True)


if __name__ == "__main__":
    main()
