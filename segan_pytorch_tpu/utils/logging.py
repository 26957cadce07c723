"""Training observability: TensorBoard scalars/histograms + per-layer weight norms
(ref model.py:331-386), with a JSONL fallback when tensorboardX is unavailable."""
from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np


class TrainLogger:
    def __init__(self, logdir: str, enabled: bool = True):
        """enabled=False turns every method into a no-op and touches no files —
        multi-host training passes enabled=(process_index == 0) so only the chief
        writes TB/JSONL/sample artifacts (concurrent writers would corrupt them)."""
        self.enabled = enabled
        self.logdir = logdir
        self.tb = None
        if not enabled:
            self.jsonl = None
            return
        os.makedirs(logdir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(logdir)
        except Exception:
            self.tb = None
        self.jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int):
        if not self.enabled:
            return
        if self.tb is not None:
            self.tb.add_scalar(tag, float(value), step)
        self.jsonl.write(json.dumps({"t": time.time(), "tag": tag,
                                     "value": float(value), "step": int(step)}) + "\n")
        self.jsonl.flush()

    def histogram(self, tag: str, values: np.ndarray, step: int):
        if not self.enabled:
            return
        if self.tb is not None:
            self.tb.add_histogram(tag, np.asarray(values), step, bins="sturges")

    def weight_norms(self, params: Any, total_name: str, step: int):
        """Per-layer + total weight norms (ref model.py:372-386).

        Norms are computed ON DEVICE and only the scalars are fetched — pulling the
        full parameter trees to the host every log step costs hundreds of MB of
        transfer (catastrophic over a slow host link)."""
        if not self.enabled:
            return
        import jax
        import jax.numpy as jnp

        if not hasattr(self, "_norm_fn"):
            def norm_tree(tree):
                return jax.tree.map(
                    lambda p: jnp.linalg.norm(p.astype(jnp.float32)), tree)

            self._norm_fn = jax.jit(norm_tree)
        from .checkpoint import flatten_tree

        norms = jax.device_get(self._norm_fn(params))
        total = 0.0
        for path, wn in flatten_tree(norms).items():
            if path.endswith("weight"):
                wn = float(wn)
                self.scalar(f"{path.replace('/', '.')}_Wnorm", wn, step)
                total += wn
        self.scalar(f"{total_name}_Wnorm", total, step)

    def close(self):
        if self.tb is not None:
            self.tb.close()
        if self.jsonl is not None:
            self.jsonl.close()
