"""Product-path train throughput: end-to-end slices/s of the real `train.py`
loop at the canonical batch-300 SEGAN+ config (VERDICT r3 #2).

bench.py stages device-resident inputs, so its headline isolates the step
program. THIS tool measures what a user gets from the shipped CLI: C++ gather
loader -> host batch assembly -> (double-buffered) H2D -> fused step dispatch
-> logging fetches -> sample dumps -> async EOE savers, by timestamping
train.py's own epoch-end log lines and dividing slices by wall-clock across a
steady-state window (epochs after the compile-tainted first ones are skipped).

Reference anchor: /root/reference/train.py:66-69 (DataLoader into the train
loop) and /root/reference/run_segan+_train.sh:4-7 (batch 300 canonical config);
the reference logs its own btime/mbtime the same in-loop way
(/root/reference/segan/models/model.py:343-348) and publishes no numbers.

Usage (corpus from tools/make_demo_corpus.py, >=1000 utts for >=200 steps):
    python tools/make_demo_corpus.py --out /tmp/prod_corpus --n_train 1000
    python tools/train_throughput_bench.py --corpus /tmp/prod_corpus \
        --batch_size 300 --epoch 14 [--loader_dtype bfloat16]

Prints one JSON line with end-to-end slices/s plus the attribution inputs
(per-epoch wall, H2D bytes/epoch, device-only estimate from the latest
BENCH_r*.json driver artifact).
"""
import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

LOG_RE = re.compile(r"\(Iter (\d+)\) Batch (\d+)/(\d+) \(Epoch (\d+)\)")


def steady_state(marks, skip_epochs: int, batch_size: int):
    """slices/s over the (wall, iteration, epoch) marks with epoch <=
    skip_epochs excluded (they carry the step/scan compiles). Returns
    (slices_per_sec, steps, wall_s); raises if the window is degenerate."""
    window = [m for m in marks if m[2] > skip_epochs]
    if len(window) < 2:
        raise ValueError(f"not enough log marks ({len(marks)}, "
                         f"{len(window)} past epoch {skip_epochs}) for a "
                         "steady-state window; lower --skip_epochs")
    (t_a, it_a, _), (t_b, it_b, _) = window[0], window[-1]
    steps = it_b - it_a
    if steps <= 0 or t_b <= t_a:
        raise ValueError("degenerate steady-state window")
    return steps * batch_size / (t_b - t_a), steps, t_b - t_a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="dir with clean_trainset/ + noisy_trainset/")
    ap.add_argument("--batch_size", type=int, default=300)
    ap.add_argument("--epoch", type=int, default=14)
    ap.add_argument("--steps_per_call", type=int, default=4)
    ap.add_argument("--skip_epochs", type=int, default=2,
                    help="steady-state window starts after this many epochs "
                         "(epoch 1 carries the step/scan compiles)")
    ap.add_argument("--loader_dtype", default="bfloat16",
                    help="collate-time cast ('' = loader default fp32); "
                         "bfloat16 halves H2D bytes")
    ap.add_argument("--io_threads", type=int, default=4,
                    help="C++ segan_io gather threads (0 = python loader)")
    ap.add_argument("--eoe_save_every", type=int, default=0,
                    help="epochs between async EOE checkpoint saves "
                         "(0 = half the run, i.e. 2 saves)")
    ap.add_argument("--save_path", default="",
                    help="keep train artifacts here (default: temp dir)")
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                    help="extra flags passed through to train.py")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    save_path = args.save_path or tempfile.mkdtemp(prefix="ttb_")
    cache_dir = os.path.join(save_path, "cache")
    eoe_every = args.eoe_save_every or max(1, args.epoch // 2)
    cmd = [
        # -u: unbuffered child stdout — through a pipe, block buffering (~8KB)
        # would flush several epochs' log lines in one burst and quantize the
        # host-side timestamps that define the steady-state window (ADVICE r4)
        sys.executable, "-u", os.path.join(root, "train.py"),
        "--clean_trainset", os.path.join(args.corpus, "clean_trainset"),
        "--noisy_trainset", os.path.join(args.corpus, "noisy_trainset"),
        "--save_path", save_path, "--cache_dir", cache_dir,
        "--batch_size", str(args.batch_size), "--epoch", str(args.epoch),
        "--compute_dtype", "bfloat16", "--no_bias", "--no_train_gen",
        "--steps_per_call", str(args.steps_per_call),
        "--io_threads", str(args.io_threads),
        "--eoe_save_every", str(eoe_every),
        "--slice_workers", "2",
    ]
    if args.loader_dtype:
        cmd += ["--loader_dtype", args.loader_dtype]
    cmd += args.extra

    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, cwd=root)
    # (wall_time, iteration, epoch) per train-loop log line
    marks = []
    num_batches = None
    for line in proc.stdout:
        now = time.time() - t0
        sys.stdout.write(f"[{now:8.1f}s] {line}")
        sys.stdout.flush()
        m = LOG_RE.search(line)
        if m:
            it, bidx, nb, ep = map(int, m.groups())
            num_batches = nb
            marks.append((now, it, ep))
    rc = proc.wait()
    total_wall = time.time() - t0
    if rc != 0:
        raise SystemExit(f"train.py exited {rc}")
    try:
        slices_per_sec, steps, wall_s = steady_state(
            marks, args.skip_epochs, args.batch_size)
    except ValueError as e:
        raise SystemExit(str(e))

    # attribution inputs
    bytes_per_slice = 16384 * 2 * (2 if args.loader_dtype == "bfloat16" else 4)
    sys.path.insert(0, root)
    from bench import last_driver_measurement
    device_only = last_driver_measurement(root).get("last_live_value")

    out = {
        "metric": "train.py end-to-end slices/sec (product path)",
        "value": round(slices_per_sec, 2),
        "unit": "slices/sec/chip",
        "batch_size": args.batch_size,
        "steps_per_call": args.steps_per_call,
        "loader_dtype": args.loader_dtype or "float32",
        "io_threads": args.io_threads,
        "steady_state_steps": steps,
        "steady_state_wall_s": round(wall_s, 2),
        "total_wall_s": round(total_wall, 2),
        "num_batches_per_epoch": num_batches,
        "h2d_bytes_per_slice": bytes_per_slice,
        "h2d_mb_per_sec_at_rate": round(
            slices_per_sec * bytes_per_slice / 1e6, 1),
        "device_only_slices_per_sec": device_only,
        # steady_state counts steps*batch_size slices; each epoch's ragged
        # final batch is mask-padded to batch_size, so real-data throughput is
        # overstated by up to (batch_size-1)/slices-per-epoch per epoch
        # (ADVICE r4). Size the corpus to divide evenly to zero this out.
        "note_ragged_tail": "per-step slices counted as full batch_size; "
                            "mask-padded tail batches inflate real-data "
                            "throughput slightly unless corpus%batch==0",
    }
    if not args.save_path:
        shutil.rmtree(save_path, ignore_errors=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
