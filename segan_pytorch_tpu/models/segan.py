"""SEGAN training engine (layer L3): a single fused, jitted LSGAN step.

The reference runs three sequential backward passes per batch — D-real, D-fake, then G
(ref segan/models/model.py:291-321).  Here the whole thing is ONE jitted program:

  1. one G forward captured with jax.vjp (the reference computes Genh once and reuses it
     for D-fake and the G update; the vjp gives us the exact same graph with one G
     backward instead of a recompute),
  2. D grads from d_real_loss + d_fake_loss (summed backward ≡ the reference's two
     accumulating .backward() calls into one Dopt.step, model.py:292-308),
  3. G adv+L1 grads through the *updated* D (the reference steps Dopt before the G pass),
     pulled back through the saved G vjp,
  with D's BatchNorm statistics threaded sequentially through the three D passes exactly
  as torch's stateful BN would (real → fake → fake_), and per-pass phase-shift randomness.

Everything is statically shaped; the final ragged batch is padded and masked, so means
match the reference's smaller last batch exactly.

Under a data mesh, the batch is sharded on 'data' and params replicated; XLA inserts the
gradient all-reduces and makes D's BatchNorm cross-replica automatically.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import timeit
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import unfreeze

from .generator import Generator, build_generator
from .discriminator import Discriminator, build_discriminator
from ..ops import knobs
from ..ops.signal import de_emphasize_np
from ..parallel import local_host_rows
from ..utils.checkpoint import (
    Saver,
    filter_merge_state,
    load_torch_generator,
    load_torch_discriminator,
    flatten_tree,
    unflatten_tree,
)
from ..utils.config import SEGANConfig

MUTS = ("batch_stats", "spectral")


@struct.dataclass
class GANTrainState:
    g_params: Any
    g_vars: Any
    g_opt: Any
    d_params: Any
    d_vars: Any
    d_opt: Any
    step: jnp.ndarray


# ---------------------------------------------------------------------------
# optimizers (ref model.py:219-228: RMSprop(lr) or Adam(lr, betas=(0, 0.9)))
# torch RMSprop: alpha=0.99, eps=1e-8, no momentum, uncentered.
# ---------------------------------------------------------------------------
def build_optimizer(opt: str, lr: float, betas=(0.0, 0.9)) -> optax.GradientTransformation:
    if opt == "rmsprop":
        # eps_in_sqrt=False matches torch's g / (sqrt(nu) + eps); optax's default
        # g * rsqrt(nu + eps) drifts most at early steps / near-zero gradients
        return optax.rmsprop(lr, decay=0.99, eps=1e-8, eps_in_sqrt=False)
    if opt == "adam":
        return optax.adam(lr, b1=betas[0], b2=betas[1], eps=1e-8)
    raise ValueError(f"Unrecognized optimizer {opt}")


def compute_dtype_of(cfg) -> jnp.dtype:
    name = getattr(cfg, "compute_dtype", "float32")
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float32", "fp32", "f32"):
        return jnp.float32
    raise ValueError(
        f"Unsupported compute_dtype {name!r}: use 'float32' or 'bfloat16'")


def cast_tree(tree, dtype):
    """Cast float leaves of a pytree to `dtype` (mixed-precision forward path)."""
    return jax.tree.map(
        lambda p: p.astype(dtype)
        if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        tree,
    )


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over batch entries with mask==1 (equals plain mean on full batches).
    Accumulated in fp32 regardless of compute dtype."""
    per = x.astype(jnp.float32).reshape(x.shape[0], -1).mean(axis=1)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_mse(logits: jax.Array, label: float, mask: jax.Array) -> jax.Array:
    d = (logits.astype(jnp.float32).reshape(logits.shape[0], -1) - label) ** 2
    return masked_mean(d, mask)


def masked_bce_logits(logits: jax.Array, label: float, mask: jax.Array) -> jax.Array:
    x = logits.astype(jnp.float32).reshape(logits.shape[0], -1)
    # binary_cross_entropy_with_logits: max(x,0) - x*y + log(1+exp(-|x|))
    per = jnp.maximum(x, 0) - x * label + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return masked_mean(per, mask)


def reg_loss_fn(kind: str):
    def _f32(a, b):
        return a.astype(jnp.float32), b.astype(jnp.float32)

    if kind == "l1_loss":
        return lambda a, b, mask: masked_mean(jnp.abs(jnp.subtract(*_f32(a, b))), mask)
    if kind == "mse_loss":
        return lambda a, b, mask: masked_mean(jnp.subtract(*_f32(a, b)) ** 2, mask)
    raise ValueError(f"Unrecognized reg loss {kind}")


# ---------------------------------------------------------------------------
# the fused train step
# ---------------------------------------------------------------------------
def make_segan_train_step(gen: Generator, disc: Discriminator, g_tx, d_tx,
                          reg_loss: str = "l1_loss", compute_dtype=jnp.float32,
                          fuse_d_pair: Optional[bool] = None):
    reg_fn = reg_loss_fn(reg_loss)
    cdt = compute_dtype
    if fuse_d_pair is None:
        # fusing the real/fake passes into one 2B apply is bit-identical for
        # bnorm/no-norm D (per-group stats + per-group phase draws) and was expected
        # to fatten the bwd kernels — but MEASURED SLOWER on v5e at batch 300
        # (2510 vs 2651 slices/s, BENCH.md r2: the 2B activations blow past VMEM
        # tiling sweet spots), so the default stays sequential. With snorm it would
        # also diverge (the reference runs one power iteration per forward).
        # fuse_d=true (cfg field / SEGAN_TPU_FUSE_D) opts in for A/B measurement.
        fuse_d_pair = knobs.resolve_bool("fuse_d") and disc.norm_type != "snorm"
    # snorm_impl='cached' (cfg field / SEGAN_TPU_SNORM; snorm-D configs only): one
    # spectral-norm power iteration per step (first D pass) instead of per apply —
    # the later passes reuse the updated u/v, so XLA CSEs a single weight
    # normalization across them. Parity default is per-apply (torch iterates on
    # every forward); divergence is power-iteration count only. See
    # models/wsegan.py for the measured campaign.
    cached_snorm = (knobs.resolve("snorm_impl") == "cached"
                    and disc.norm_type == "snorm")

    def step(state: GANTrainState, clean, noisy, mask, rng, l1_weight):
        kz, kd1, kd2, kd3, kdrop = jax.random.split(rng, 5)
        clean_c = clean.astype(cdt)
        noisy_c = noisy.astype(cdt)
        z = gen.sample_z(kz, noisy.shape)
        z = z.astype(cdt) if z is not None else None

        def gfwd(gp):
            out, newv = gen.apply(
                {"params": cast_tree(gp, cdt), **state.g_vars},
                noisy_c,
                z=z,
                train=True,
                mutable=list(MUTS),
                rngs={"dropout": kdrop},
            )
            return out, newv

        (Genh, g_vars_new), g_vjp = jax.vjp(gfwd, state.g_params)

        # --- D update (ref model.py:292-308) ---
        def d_loss_fn(d_params):
            dp_c = cast_tree(d_params, cdt)
            dv = {"params": dp_c, **state.d_vars}
            if fuse_d_pair:
                # ONE 2B-batch apply: group 0 = real pair, group 1 = fake pair, with
                # per-group BN stats and per-group phase draws (streams kd1/kd2) —
                # bit-identical to the two sequential applies below, ~2x fatter
                # bwd kernels
                pair = jnp.concatenate([
                    jnp.concatenate([clean_c, noisy_c], -1),
                    jnp.concatenate([jax.lax.stop_gradient(Genh), noisy_c], -1),
                ], axis=0)
                mask2 = None if mask is None else jnp.concatenate([mask, mask])
                (d_out, _), m2 = disc.apply(
                    dv, pair, train=True, mask=mask2, stats_groups=2,
                    mutable=list(MUTS), rngs={"phase": kd1, "phase2": kd2})
                B = clean_c.shape[0]
                d_real, d_fake = d_out[:B], d_out[B:]
            else:
                (d_real, _), m1 = disc.apply(
                    dv, jnp.concatenate([clean_c, noisy_c], -1),
                    train=True, mask=mask, mutable=list(MUTS), rngs={"phase": kd1})
                dv = {"params": dp_c, **m1}
                (d_fake, _), m2 = disc.apply(
                    dv, jnp.concatenate([jax.lax.stop_gradient(Genh), noisy_c], -1),
                    train=not cached_snorm, mask=mask, mutable=list(MUTS),
                    rngs={"phase": kd2})
            d_real_loss = masked_mse(d_real, 1.0, mask)
            d_fake_loss = masked_mse(d_fake, 0.0, mask)
            return d_real_loss + d_fake_loss, (m2, d_real_loss, d_fake_loss)

        (d_loss, (d_vars_mid, d_real_loss, d_fake_loss)), d_grads = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
        )
        d_updates, d_opt_new = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params_new = optax.apply_updates(state.d_params, d_updates)

        # --- G update through the UPDATED D (ref model.py:313-321) ---
        def g_obj(Genh_):
            dv = {"params": cast_tree(d_params_new, cdt), **d_vars_mid}
            (d_fake_, _), m3 = disc.apply(
                dv, jnp.concatenate([Genh_, noisy_c], -1),
                train=not cached_snorm, mask=mask, mutable=list(MUTS),
                rngs={"phase": kd3})
            g_adv = masked_mse(d_fake_, 1.0, mask)
            g_l1 = l1_weight * reg_fn(Genh_, clean, mask)  # fp32 target
            return g_adv + g_l1, (m3, g_adv, g_l1)

        (g_loss, (d_vars_new, g_adv_loss, g_l1_loss)), dGenh = (
            jax.value_and_grad(g_obj, has_aux=True)(Genh)
        )
        vars_cot = jax.tree.map(jnp.zeros_like, g_vars_new)
        (g_grads,) = g_vjp((dGenh, vars_cot))
        g_updates, g_opt_new = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params_new = optax.apply_updates(state.g_params, g_updates)

        new_state = state.replace(
            g_params=g_params_new,
            g_vars=g_vars_new,
            g_opt=g_opt_new,
            d_params=d_params_new,
            d_vars=d_vars_new,
            d_opt=d_opt_new,
            step=state.step + 1,
        )
        metrics = {
            "d_real": d_real_loss,
            "d_fake": d_fake_loss,
            "g_adv": g_adv_loss,
            "g_l1": g_l1_loss,
        }
        return new_state, metrics, Genh.astype(jnp.float32), z

    return step


# ---------------------------------------------------------------------------
# post-init weight re-initialization matching ref weights_init schemes
# ---------------------------------------------------------------------------
def apply_wsegan_weights_init(params: dict, rng: jax.Array) -> dict:
    """Xavier-uniform every conv/deconv/linear weight (ref model.py:45-60)."""
    from ..ops import initializers as init

    flat = flatten_tree(unfreeze(params))
    keys = jax.random.split(rng, len(flat))
    out = {}
    for (path, leaf), key in zip(sorted(flat.items()), keys):
        arr = np.asarray(leaf)
        name = path.split("/")[-1]
        parent = path.split("/")[-2] if "/" in path else ""
        if name == "weight" and arr.ndim >= 2:
            if "deconv" in parent:
                out[path] = np.asarray(init.xavier_uniform_convT(key, arr.shape))
            else:
                out[path] = np.asarray(init.xavier_uniform(key, arr.shape))
        else:
            out[path] = arr
    return unflatten_tree(out)


# ---------------------------------------------------------------------------
# SEGAN model/trainer
# ---------------------------------------------------------------------------
class SEGAN:
    """The SEGAN training engine (ref segan/models/model.py:71-507)."""

    name = "SEGAN"

    def __init__(self, cfg: SEGANConfig, generator: Optional[Generator] = None,
                 discriminator: Optional[Discriminator] = None):
        # adopt this config's lowering knobs (bn_impl, conv_grad, ...) as the
        # process defaults so every op traced for this engine reads them;
        # SEGAN_TPU_* env vars still win inside knobs.resolve for experiments
        knobs.register_config(cfg)
        self.cfg = cfg
        self.save_path = cfg.save_path
        self.preemph = cfg.preemph
        self.G = generator if generator is not None else build_generator(cfg)
        self.D = discriminator if discriminator is not None else build_discriminator(cfg)
        self.state: Optional[GANTrainState] = None
        self.mesh = None
        self._jit_step = None
        self._raw_step = None
        self._jit_multi_step = None
        self._jit_gfwd = None
        self._gen_rng = None  # per-utterance z stream for generate()
        # deterministic per-model streams for infer_G / discriminate fallbacks:
        # two identical eval/server runs are bit-identical without callers
        # passing keys (the old fallback seeded from global np.random)
        self._infer_rng = None
        self._disc_rng = None
        self._step_flops = None
        self._flops_args = None
        self.writer = None
        self.pool = None

    # -- initialization ---------------------------------------------------
    def init_state(self, rng: Optional[jax.Array] = None,
                   batch_size: int = 1) -> GANTrainState:
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        kg, kd, kz, kph = jax.random.split(rng, 4)
        x = jnp.zeros((batch_size, cfg.slice_size, 1), jnp.float32)
        g_variables = self.G.init({"params": kg, "z": kz, "dropout": kz}, x, train=True)
        g_variables = unfreeze(g_variables)
        g_params = g_variables.pop("params")
        d_in = jnp.zeros((batch_size, cfg.slice_size, 2), jnp.float32)
        d_variables = self.D.init({"params": kd, "phase": kph}, d_in, train=True)
        d_variables = unfreeze(d_variables)
        d_params = d_variables.pop("params")
        g_tx, d_tx = self.build_optimizers()
        self._g_tx, self._d_tx = g_tx, d_tx
        state = GANTrainState(
            g_params=g_params,
            g_vars=g_variables,
            g_opt=g_tx.init(g_params),
            d_params=d_params,
            d_vars=d_variables,
            d_opt=d_tx.init(d_params),
            step=jnp.zeros((), jnp.int32),
        )
        self.state = state
        return state

    def build_optimizers(self):
        cfg = self.cfg
        return (
            build_optimizer(cfg.opt, cfg.g_lr),
            build_optimizer(cfg.opt, cfg.d_lr),
        )

    def get_n_params(self) -> int:
        n = 0
        for tree in (self.state.g_params, self.state.d_params):
            n += sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
        return n

    # -- pretrained loading -----------------------------------------------
    def g_load_pretrained(self, ckpt_path: str, load_last: bool = False):
        self._load_pretrained("G", ckpt_path, load_last)

    def d_load_pretrained(self, ckpt_path: str, load_last: bool = False):
        self._load_pretrained("D", ckpt_path, load_last)

    def _skip_last_names(self, which: str):
        """Names of the output layer dropped by partial pretrained loading.

        The reference drops the checkpoint's last 2 keys (the final layer's
        weight+bias) for ANY model unless load_last (ref core.py:130-137): D's head
        output (fc_4 / fc / mlp_2 depending on pool_type) and G's final deconv."""
        if which == "D":
            head = {"none": "fc_4", "conv": "fc", "gmax": "fc",
                    "gavg": "fc", "mlp": "mlp_2"}
            return (head.get(self.cfg.dpool_type, "fc_4"),)
        dec_fmaps = self.cfg.gdec_fmaps
        n_dec = len(dec_fmaps) if dec_fmaps is not None else len(self.cfg.genc_fmaps)
        return (f"dec_blocks_{n_dec - 1}/",)

    def _load_pretrained(self, which: str, ckpt_path: str, load_last: bool):
        from ..utils.checkpoint import load_pytree

        skip = () if load_last else self._skip_last_names(which)
        if ckpt_path.endswith(".ckpt") and _is_torch_ckpt(ckpt_path):
            if which == "G":
                loaded = load_torch_generator(ckpt_path)
            else:
                loaded = load_torch_discriminator(
                    ckpt_path, self.cfg.dpool_slen, self.cfg.denc_fmaps[-1])
        else:
            tree, _ = load_pytree(ckpt_path)
            loaded = tree.get("state_dict", tree)
        if which == "G":
            model_tree = {"params": self.state.g_params, **self.state.g_vars}
            merged = filter_merge_state(model_tree, loaded, skip_names=skip)
            # put back on device: leaving numpy leaves in the state would re-upload
            # the full parameter tree on EVERY subsequent jitted call
            merged = jax.device_put(merged)
            g_vars = {k: v for k, v in merged.items() if k != "params"}
            self.state = self.state.replace(g_params=merged["params"], g_vars=g_vars)
        else:
            model_tree = {"params": self.state.d_params, **self.state.d_vars}
            merged = filter_merge_state(model_tree, loaded, skip_names=skip)
            merged = jax.device_put(merged)
            d_vars = {k: v for k, v in merged.items() if k != "params"}
            self.state = self.state.replace(d_params=merged["params"], d_vars=d_vars)

    # -- inference ----------------------------------------------------------
    def _gfwd_jit(self):
        if self._jit_gfwd is None:
            cdt = compute_dtype_of(self.cfg)

            def gfwd(g_params, g_vars, x, z):
                out, hall = self.G.apply(
                    {"params": cast_tree(g_params, cdt), **g_vars},
                    x.astype(cdt),
                    z=z.astype(cdt) if z is not None else None,
                    ret_hid=True, train=False)
                return out.astype(jnp.float32), hall
            self._jit_gfwd = jax.jit(gfwd)
        return self._jit_gfwd

    def infer_G(self, noisy, z=None, ret_hid: bool = False, rng=None):
        if z is None and not self.G.no_z:
            # fresh z per call, like the reference's in-forward randn
            # (generator.py:197) — but drawn from a deterministic per-model
            # stream (seeded from cfg.seed) so runs are reproducible without
            # callers passing keys, matching generate()'s treatment
            if rng is None:
                if self._infer_rng is None:
                    self._infer_rng = jax.random.fold_in(
                        jax.random.PRNGKey(self.cfg.seed), 1)
                self._infer_rng, rng = jax.random.split(self._infer_rng)
            z = self.G.sample_z(rng, noisy.shape)
        out, hall = self._gfwd_jit()(self.state.g_params, self.state.g_vars, noisy, z)
        if ret_hid:
            return out, hall
        return out

    def generate(self, inwav: np.ndarray, z: Optional[np.ndarray] = None,
                 chunk_buckets: bool = True,
                 rng=None, overlap: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
        """Chunked enhancement of one (already normalized+pre-emphasized) waveform.

        The reference loops sequentially over 16384-sample chunks, drawing a FRESH z
        for each utterance and reusing it across that utterance's chunks
        (ref model.py:116-157, z captured at :144-146).  TPU-native version: all
        chunks become ONE device batch (the chunk grid is embarrassingly parallel)
        with the z row tiled — same math, one pass.  z freshness matches the
        reference: each generate() call advances a per-model PRNG stream (seeded by
        cfg.seed, overridable per call via `rng`), so two utterances get different z
        while chunks within one utterance share it.  `chunk_buckets` pads the chunk
        count to the next power of two to bound the number of compiled shapes.

        `overlap` in [0, 0.5): beyond-reference quality option — enhance an
        overlapping chunk grid and cross-fade (hann-ramped overlap-add,
        parallel/inference.py) instead of hard-concatenating chunk boundaries.
        0 (default) is the reference-exact path.
        """
        if not 0.0 <= overlap < 0.5:
            raise ValueError(f"overlap must be in [0, 0.5), got {overlap}")
        N = self.cfg.slice_size
        T = int(np.asarray(inwav).reshape(-1).shape[0])
        wav = np.asarray(inwav, np.float32).reshape(-1)
        hop = N
        if overlap > 0:
            from ..parallel.inference import chunk_grid

            grid, hop, n_chunks = chunk_grid(wav, N, overlap)
        else:
            n_chunks = -(-T // N)
        n_padded = n_chunks
        if chunk_buckets and n_chunks > 1:
            n_padded = 1 << (n_chunks - 1).bit_length()
        if overlap > 0:
            if n_padded > n_chunks:
                grid = np.concatenate(
                    [grid, np.zeros((n_padded - n_chunks, N, 1), np.float32)],
                    axis=0)
            x = grid
        else:
            x = np.zeros((n_padded * N,), np.float32)
            x[:T] = wav
            x = x.reshape(n_padded, N, 1)
        if not self.G.no_z:
            if z is None:
                if rng is None:
                    if self._gen_rng is None:
                        self._gen_rng = jax.random.PRNGKey(self.cfg.seed)
                    self._gen_rng, rng = jax.random.split(self._gen_rng)
                # kept DEVICE-resident: np.asarray here cost a synchronous
                # D2H round trip per utterance (then re-uploaded by the tile)
                self.z = self.G.sample_z(rng, (1, N, 1))
            else:
                z_arr = jnp.asarray(z)
                self.z = z_arr.reshape((1,) + tuple(z_arr.shape[-2:]))
            zb = jnp.tile(jnp.asarray(self.z), (n_padded, 1, 1))
        else:
            zb = None
        out, hall = self._gfwd_jit()(self.state.g_params, self.state.g_vars,
                                     jnp.asarray(x), zb)
        # slice BEFORE fetching: the chunk-bucket padding rows would otherwise
        # ride the D2H for nothing (up to 2x at bucket boundaries)
        if overlap > 0:
            from ..parallel.inference import overlap_add

            c_res = overlap_add(np.asarray(out[:n_chunks]), hop, T)
        else:
            c_res = np.asarray(out[:n_chunks]).reshape(-1)[:T]
        c_res = de_emphasize_np(c_res, self.preemph)
        enc_keys = [k for k in hall.keys() if k.startswith("enc_") and "zc" not in k]
        g_c = np.asarray(
            hall[f"enc_{max(int(k.split('_')[1]) for k in enc_keys)}"][:n_chunks])
        return c_res, g_c

    def generate_batch(self, inwavs, chunk_buckets: bool = True,
                       rng=None, overlap: float = 0.0):
        """Enhance MANY (normalized + pre-emphasized) waveforms in ONE device pass.

        TPU-native throughput mode for offline enhancement (clean.py
        --batch_utts): all utterances' chunk grids concatenate into a single
        device batch, so short utterances (1-2 chunks each) no longer starve
        the MXU one tiny pass at a time — the reference has no equivalent
        (its loop is one chunk at a time, ref model.py:116-157).

        Per-utterance z freshness matches sequential generate(): the i-th
        utterance consumes the i-th draw of the same per-model PRNG stream and
        all of its chunks share that z row, so outputs equal N sequential
        generate() calls to 1 fp32 ulp (the generator is row-independent in
        eval mode; XLA's fusion plan — hence rounding — depends on the batch
        shape; asserted in tests/test_networks.py).  Returns a list of
        (enhanced_wav, g_c) like N generate() results.
        """
        if not 0.0 <= overlap < 0.5:
            raise ValueError(f"overlap must be in [0, 0.5), got {overlap}")
        # len(), not truthiness: a 2-D ndarray of utterances is a valid input
        if inwavs is None or len(inwavs) == 0:
            return []
        if rng is None:
            if self._gen_rng is None:
                self._gen_rng = jax.random.PRNGKey(self.cfg.seed)
        N = self.cfg.slice_size
        rows, spans, metas, z_rows = [], [], [], []
        for inwav in inwavs:
            wav = np.asarray(inwav, np.float32).reshape(-1)
            T = wav.shape[0]
            if overlap > 0:
                from ..parallel.inference import chunk_grid

                grid, hop, n_chunks = chunk_grid(wav, N, overlap)
                x = grid
            else:
                hop = N
                n_chunks = -(-T // N)
                x = np.zeros((n_chunks * N,), np.float32)
                x[:T] = wav
                x = x.reshape(n_chunks, N, 1)
            spans.append(n_chunks)
            metas.append((T, hop))
            rows.append(x)
            if not self.G.no_z:
                if rng is None:
                    self._gen_rng, k = jax.random.split(self._gen_rng)
                else:
                    rng, k = jax.random.split(rng)
                # device-side: np.asarray(sample_z) + host tile cost one
                # synchronous D2H+H2D round trip PER UTTERANCE
                zrow = self.G.sample_z(k, (1, N, 1))
                z_rows.append(jnp.tile(zrow, (n_chunks, 1, 1)))
        total = sum(spans)
        n_padded = total
        if chunk_buckets and total > 1:
            n_padded = 1 << (total - 1).bit_length()
        x_all = np.concatenate(rows, axis=0)
        if n_padded > total:
            x_all = np.concatenate(
                [x_all, np.zeros((n_padded - total, N, 1), np.float32)], axis=0)
        if not self.G.no_z:
            zb = (z_rows[0] if len(z_rows) == 1
                  else jnp.concatenate(z_rows, axis=0))
            if n_padded > total:
                zb = jnp.concatenate(
                    [zb, jnp.tile(zb[-1:], (n_padded - total, 1, 1))], axis=0)
        else:
            zb = None
        out, hall = self._gfwd_jit()(self.state.g_params, self.state.g_vars,
                                     jnp.asarray(x_all), zb)
        # fetch only the real rows (padding would ride the D2H for nothing)
        out = np.asarray(out[:total])
        enc_keys = [k for k in hall.keys() if k.startswith("enc_") and "zc" not in k]
        g_c_all = np.asarray(
            hall[f"enc_{max(int(k.split('_')[1]) for k in enc_keys)}"][:total])
        results, pos = [], 0
        for (T, hop), n_chunks in zip(metas, spans):
            chunk_out = out[pos: pos + n_chunks]
            if overlap > 0:
                from ..parallel.inference import overlap_add

                c_res = overlap_add(chunk_out, hop, T)
            else:
                c_res = chunk_out.reshape(-1)[:T]
            results.append((de_emphasize_np(c_res, self.preemph),
                            g_c_all[pos: pos + n_chunks]))
            pos += n_chunks
        return results

    def discriminate(self, cwav, nwav, rng=None):
        d_in = jnp.concatenate([cwav, nwav], axis=-1)
        # the reference rolls the phase shift in eval too (discriminator.py:160-172);
        # the fallback key comes from a deterministic per-model stream (cfg.seed)
        # so repeated runs are bit-identical without callers passing keys
        if rng is None:
            if self._disc_rng is None:
                self._disc_rng = jax.random.fold_in(
                    jax.random.PRNGKey(self.cfg.seed), 2)
            self._disc_rng, rng = jax.random.split(self._disc_rng)
        (y, _) = self.D.apply({"params": self.state.d_params, **self.state.d_vars},
                              d_in, train=False, rngs={"phase": rng})
        return y

    # -- training -----------------------------------------------------------
    def _setup_parallel(self):
        cfg = self.cfg
        dp = cfg.dp if cfg.dp and cfg.dp > 1 else 1
        mp = getattr(cfg, "mp", 1) or 1
        if dp > 1 or mp > 1:
            if cfg.batch_size % dp != 0:
                raise ValueError(
                    f"batch_size ({cfg.batch_size}) must be divisible by the "
                    f"data-parallel factor --dp ({dp})")
            from ..parallel import make_mesh, shard_params
            self.mesh = make_mesh(dp, mp)
            self.state = shard_params(self.state, self.mesh)

    def _shard_batch(self, *arrays):
        if self.mesh is None:
            return arrays
        from ..parallel import shard_batch
        return tuple(shard_batch(list(arrays), self.mesh))

    def prepare_train(self, batch_size: Optional[int] = None):
        if self.state is None:
            self.init_state(batch_size=batch_size or 1)
        g_tx, d_tx = self.build_optimizers()
        step = make_segan_train_step(self.G, self.D, g_tx, d_tx, self.cfg.reg_loss,
                                     compute_dtype_of(self.cfg))
        self._raw_step = step
        self._jit_step = jax.jit(step, donate_argnums=(0,))
        self._setup_parallel()
        return self._jit_step

    def prepare_multi_step(self, steps_per_call: int):
        """One dispatched program running `steps_per_call` full train steps via
        lax.scan. Each step's math is IDENTICAL to the single-step program (the
        scan body IS that step); what changes is dispatch granularity — the
        per-dispatch fixed cost (launch + host round trip + batch-independent
        bookkeeping, measured ~24 ms/step at batch 300, BENCH.md r3) is paid
        once per S steps. Inputs gain a leading (S,) axis; l1_weight is per-step
        (the decay schedule advances every batch)."""
        assert self._raw_step is not None, "call prepare_train first"
        step = self._raw_step
        S = int(steps_per_call)

        def multi(state, stacked, rng, l1_w_s):
            # `stacked` = tuple of (S, ...)-leading arrays matching the raw
            # step's batch arguments (clean, noisy, mask[, additive_mask])
            ks = jax.random.split(rng, S)

            def body(st, xs):
                arrs, k, lw = xs
                st, metrics, Genh, z = step(st, *arrs, k, lw)
                return st, (metrics, Genh, z)

            state, (metrics_s, Genh_s, z_s) = jax.lax.scan(
                body, state, (stacked, ks, l1_w_s))
            # last sub-step's tensors for logging/sample parity
            last = jax.tree.map(lambda a: a[-1], metrics_s)
            return state, metrics_s, last, Genh_s[-1], (
                None if z_s is None else z_s[-1])

        self._jit_multi_step = jax.jit(multi, donate_argnums=(0,))
        return self._jit_multi_step

    def train_step_multi(self, *stacked, rng, l1_w_s):
        """Run S stacked steps in one dispatch (see prepare_multi_step).

        `stacked` are the raw step's batch args with a leading (S,) axis —
        (clean, noisy, mask) for SEGAN, plus additive_mask for WSEGAN."""
        stacked = self._shard_batch_multi(*stacked)
        l1_arr = jnp.asarray(l1_w_s, jnp.float32)
        new_state, metrics_s, metrics, Genh, z = self._jit_multi_step(
            self.state, stacked, rng, l1_arr)
        self.state = new_state
        # MFU accounting: flops of the WHOLE S-step program against per-call time
        self._flops_fn = self._jit_multi_step
        self._flops_args = (new_state, stacked, rng, l1_arr)
        return metrics_s, metrics, Genh, z

    @staticmethod
    def _stack_group(batches, extra_keys=()):
        """Stack a list of loader batches into the (S, B, ...) arrays the
        multi-step program consumes (clean/noisy gain the channel dim, mask
        falls back to all-ones); extra_keys stacks additional per-row fields
        (e.g. WSEGAN's additive_mask)."""
        clean = jnp.stack([b["clean"][..., None] for b in batches])
        noisy = jnp.stack([b["noisy"][..., None] for b in batches])
        mask = jnp.stack([
            jnp.asarray(b.get("mask", np.ones((b["clean"].shape[0],),
                                              np.float32)))
            for b in batches])
        extras = tuple(jnp.stack([jnp.asarray(b[k]) for b in batches])
                       for k in extra_keys)
        return (clean, noisy, mask) + extras

    def _shard_batch_multi(self, *arrays):
        if self.mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = NamedSharding(self.mesh, P(None, "data"))  # (S, B, ...) batch axis 1
        return tuple(jax.device_put(a, s) for a in arrays)

    def _install_preempt_handler(self):
        """SIGTERM -> finish the in-flight step, checkpoint, exit cleanly (TPU
        preemption notice / k8s pod eviction safety). Returns a restore()
        callable; no-op when not on the main thread (signals only deliverable
        there)."""
        import signal
        import threading

        self._preempted = False
        if threading.current_thread() is not threading.main_thread():
            return lambda: None

        def _on_term(signum, frame):
            self._preempted = True
            print("[!] SIGTERM: checkpoint + clean shutdown at the next step "
                  "boundary", flush=True)

        try:
            prev = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # non-main interpreter contexts
            return lambda: None
        return lambda: signal.signal(signal.SIGTERM, prev)

    def train_step(self, clean, noisy, mask, rng, l1_weight: float):
        clean, noisy, mask = self._shard_batch(clean, noisy, mask)
        new_state, metrics, Genh, z = self._jit_step(
            self.state, clean, noisy, mask, rng, jnp.float32(l1_weight))
        self.state = new_state
        # arg exemplars for step_flops(): new_state has the same avals/shardings as
        # the (donated) input state, so lower().compile() hits the jit cache
        self._flops_args = (new_state, clean, noisy, mask, rng,
                            jnp.float32(l1_weight))
        return metrics, Genh, z

    def step_flops(self):
        """FLOPs of one fused train step per XLA's compiled cost analysis (cached);
        call after at least one train_step."""
        if self._step_flops is None and getattr(self, "_flops_args", None) is not None:
            from ..utils.profiling import compiled_flops

            fn = getattr(self, "_flops_fn", None) or self._jit_step
            self._step_flops = compiled_flops(fn, *self._flops_args)
        return self._step_flops

    def train(self, cfg: SEGANConfig, dloader, criterion=None,
              l1_init: float = 100.0, l1_dec_step: float = 1e-5,
              l1_dec_epoch: int = 100, log_freq: int = 50, va_dloader=None,
              device=None):
        """The SEGAN training loop (ref model.py:230-437)."""
        from ..utils.logging import TrainLogger

        # multi-host: only the chief writes logs/checkpoints/samples
        is_chief = jax.process_index() == 0
        self.writer = TrainLogger(os.path.join(self.save_path, "train"),
                                  enabled=is_chief)
        self.prepare_train(cfg.batch_size)
        # async: checkpoint D2H + file IO overlap the next epoch's compute
        eoe_g_saver = Saver(cfg.save_path, max_ckpts=3, prefix="EOE_G-",
                            async_write=True)
        eoe_d_saver = Saver(cfg.save_path, max_ckpts=3, prefix="EOE_D-",
                            async_write=True)
        best_saver_g = Saver(cfg.save_path, max_ckpts=3, prefix=f"{self.name}-G-",
                             async_write=True)
        best_saver_d = Saver(cfg.save_path, max_ckpts=3, prefix=f"{self.name}-D-",
                             async_write=True)
        num_batches = len(dloader)
        # resume-aware counters: continue iteration numbering (so checkpoint names
        # never collide with the rotation index) and fast-forward the l1 schedule
        start_step = int(self.state.step) if self.state is not None else 0
        iteration = start_step + 1
        start_epoch = start_step // max(num_batches, 1) + 1
        l1_weight = l1_init
        past = start_step - max(0, (l1_dec_epoch - 1)) * num_batches
        if past > 0:
            l1_weight = max(0.0, l1_init - l1_dec_step * past)
        from ..utils.profiling import StepTimer, device_memory_stats, mfu

        timer = StepTimer()
        profiling = bool(getattr(cfg, "profile", False))
        trace_ctx = None  # device trace over a few post-compile steps
        step_mfu = None
        evals = {}
        noisy_evals = {}
        noisy_samples = None
        clean_samples = None
        z_sample = None
        patience = cfg.patience
        best_val_obj = 0
        rng = jax.random.PRNGKey(cfg.seed + start_step)

        from ..data.loader import device_prefetch

        batch_shard = None
        if self.mesh is not None:
            from ..parallel import batch_sharding

            batch_shard = batch_sharding(self.mesh)
        restore_sig = self._install_preempt_handler()
        # steps_per_call: S full steps per dispatched program (prepare_multi_step
        # lax.scan; per-step math bit-equal — tests/test_train.py::
        # TestMultiStepDispatch). Groups never span an epoch (the ragged tail
        # runs single steps), so EOE eval/ckpt cadence is unchanged; the l1
        # decay advances per sub-step exactly as in single-step dispatch.
        S = max(1, int(getattr(cfg, "steps_per_call", 1)))
        if S > 1 and jax.process_count() > 1:
            print("[!] steps_per_call > 1 is single-process only; using 1")
            S = 1
        if S > 1 and profiling:
            print("[!] --profile needs per-step dispatch; steps_per_call -> 1")
            S = 1
        if S > 1:
            self.prepare_multi_step(S)
        for epoch in range(start_epoch, cfg.epoch + 1):
            timer.start()
            stream = device_prefetch(iter(dloader), sharding=batch_shard)
            bidx = 0
            while bidx < num_batches:
                prev_bidx = bidx
                n_sub = S if num_batches - bidx >= S else 1
                rng, krun = jax.random.split(rng)
                if n_sub > 1:
                    batches = [next(stream) for _ in range(n_sub)]
                    l1_w_s = []
                    for _ in range(n_sub):
                        if epoch >= l1_dec_epoch and l1_weight > 0:
                            l1_weight = max(0.0, l1_weight - l1_dec_step)
                        l1_w_s.append(l1_weight)
                    clean, noisy, mask = self._stack_group(batches)
                    _, metrics, Genh, z = self.train_step_multi(
                        clean, noisy, mask, rng=krun, l1_w_s=l1_w_s)
                    clean, noisy = clean[-1], noisy[-1]  # last sub-batch: samples
                else:
                    if epoch >= l1_dec_epoch and l1_weight > 0:
                        l1_weight = max(0.0, l1_weight - l1_dec_step)
                    batch = next(stream)
                    clean = batch["clean"][..., None]  # (B, T, 1)
                    noisy = batch["noisy"][..., None]
                    mask = batch.get("mask",
                                     np.ones((clean.shape[0],), np.float32))
                    metrics, Genh, z = self.train_step(clean, noisy, mask, krun,
                                                       l1_weight)
                bidx += n_sub
                iteration += n_sub - 1  # +1 more at the bottom of the loop
                if noisy_samples is None:
                    noisy_samples = local_host_rows(noisy, 20)
                    clean_samples = local_host_rows(clean, 20)
                    if z is not None:
                        z_sample = local_host_rows(z, 20)
                if profiling:
                    jax.block_until_ready(metrics)  # accurate per-step timing
                timer.stop()
                if profiling and epoch == start_epoch:
                    # steps 1-2 include compilation; trace steps 3..7, then report
                    # per-step MFU (flops from the compiled executable) + memory
                    from ..utils.profiling import device_trace

                    if bidx == 2:
                        trace_ctx = device_trace(
                            os.path.join(self.save_path, "profile"))
                        trace_ctx.__enter__()
                    elif bidx == 7 and trace_ctx is not None:
                        trace_ctx.__exit__(None, None, None)
                        trace_ctx = None
                        print(f"[profile] device trace written to "
                              f"{os.path.join(self.save_path, 'profile')}")
                        print(f"[profile] memory: {device_memory_stats()}")
                    if bidx >= 3 and step_mfu is None:
                        n_chips = self.mesh.devices.size if self.mesh is not None else 1
                        step_mfu = mfu(self.step_flops(), timer.last, n_chips)
                timer.start()
                if (bidx // log_freq != prev_bidx // log_freq
                        or bidx >= num_batches):
                    m = {k: float(v) for k, v in metrics.items()}
                    mfu_str = (f", mfu: {100 * step_mfu:.1f}%"
                               if step_mfu is not None else "")
                    print(
                        f"(Iter {iteration}) Batch {bidx}/{num_batches} (Epoch {epoch})"
                        f" d_real:{m['d_real']:.4f}, d_fake:{m['d_fake']:.4f},"
                        f" g_adv:{m['g_adv']:.4f}, g_l1:{m['g_l1']:.4f}"
                        f" l1_w: {l1_weight:.2f}, btime: {timer.last:.4f} s,"
                        f" mbtime: {timer.mean:.4f} s{mfu_str}"
                    )
                    self.writer.scalar("D_real", m["d_real"], iteration)
                    self.writer.scalar("D_fake", m["d_fake"], iteration)
                    self.writer.scalar("G_adv", m["g_adv"], iteration)
                    self.writer.scalar("G_l1", m["g_l1"], iteration)
                    self.writer.histogram("Gz", local_host_rows(Genh), iteration)
                    self.writer.histogram("clean", local_host_rows(clean), iteration)
                    self.writer.histogram("noisy", local_host_rows(noisy), iteration)
                    self.writer.weight_norms(self.state.g_params, "Gtotal", iteration)
                    self.writer.weight_norms(self.state.d_params, "Dtotal", iteration)
                    if not cfg.no_train_gen:
                        if is_chief:
                            self.gen_train_samples(clean_samples, noisy_samples, z_sample,
                                               iteration=iteration)
                iteration += 1
                if self._preempted:
                    break

            if self._preempted:
                print(f"[!] preempted at iteration {iteration - 1}: saving "
                      "checkpoint and stopping")
                st_ck = self.state_for_ckpt()  # collective under multi-host TP
                if is_chief:
                    self.save(eoe_g_saver, eoe_d_saver, iteration, state=st_ck)
                break

            if va_dloader is not None:
                # eval_max_samples: batches scored per epoch (1 = reference parity,
                # model.py:469-484; 0 = full valset sweep — cheap on TPU and much
                # less noisy for early stopping)
                ems = int(getattr(cfg, "eval_max_samples", 1)) or len(va_dloader)
                if len(noisy_evals) == 0:
                    evals_, noisy_evals_ = self.evaluate(cfg, va_dloader, log_freq,
                                                         do_noisy=True,
                                                         max_samples=ems)
                    for k, v in noisy_evals_.items():
                        noisy_evals.setdefault(k, []).extend(v)
                        self.writer.scalar(f"noisy-{k}", np.mean(v), epoch)
                else:
                    evals_ = self.evaluate(cfg, va_dloader, log_freq, do_noisy=False,
                                           max_samples=ems)
                for k, v in evals_.items():
                    evals.setdefault(k, []).extend(v)
                    self.writer.scalar(f"Genh-{k}", np.mean(v), epoch)
                val_obj = (np.mean(evals_["covl"]) + np.mean(evals_["pesq"])
                           + np.mean(evals_["ssnr"]))
                self.writer.scalar("Genh-val_obj", val_obj, epoch)
                if val_obj > best_val_obj:
                    print(f"Val obj (COVL + SSNR + PESQ) improved "
                          f"{best_val_obj} -> {val_obj}")
                    best_val_obj = val_obj
                    patience = cfg.patience
                    st_ck = self.state_for_ckpt()  # collective under mh TP
                    if is_chief:
                        self.save(best_saver_g, best_saver_d, iteration,
                                  best_val=True, state=st_ck)
                else:
                    patience -= 1
                    print(f"Val loss did not improve. Patience {patience}/{cfg.patience}")
                    if patience <= 0:
                        print("STOPPING SEGAN TRAIN: OUT OF PATIENCE.")
                        break

            if epoch % max(1, getattr(cfg, "eoe_save_every", 1)) == 0 \
                    or epoch == cfg.epoch:
                st_ck = self.state_for_ckpt()  # collective under multi-host TP
                if is_chief:
                    self.save(eoe_g_saver, eoe_d_saver, iteration, state=st_ck)
        restore_sig()
        for sv in (eoe_g_saver, eoe_d_saver, best_saver_g, best_saver_d):
            sv.flush()  # all checkpoint bytes on disk before train() returns
        self.close_pool()  # don't leak eval workers past the training run

    def state_for_ckpt(self):
        """Checkpoint view of the state. Under multi-host TENSOR parallelism
        the D-head leaves are sharded across hosts (not host-local), so they
        are gathered to replicated here — a COLLECTIVE: when process_count>1
        and the mesh has a model axis, EVERY process must call this (the
        chief-gated save() call sites do). No-op (returns self.state) in all
        other configurations."""
        st = self.state
        if (self.mesh is None or "model" not in self.mesh.axis_names
                or self.mesh.shape.get("model", 1) <= 1):
            return st
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())

        def fix(x):
            if isinstance(x, jax.Array) and not getattr(
                    x.sharding, "is_fully_replicated", True):
                return jax.device_put(x, rep)  # cross-sharding allgather
            return x

        return jax.tree.map(fix, st)

    def save(self, g_saver: Saver, d_saver: Saver, step: int,
             best_val: bool = False, state=None):
        # device arrays are handed to the Saver as-is: an async Saver snapshots them
        # on-device and moves the D2H transfer off the training thread; a sync Saver
        # transfers inside _save_impl (flatten_tree's np.asarray)
        from flax import serialization

        state = state if state is not None else self.state_for_ckpt()
        g_tree = {"params": state.g_params, **state.g_vars}
        g_opt = serialization.to_state_dict(state.g_opt)
        g_saver.save("Generator", step, g_tree, opt_tree=g_opt, best_val=best_val)
        if self.D is not None and state.d_params is not None:
            d_tree = {"params": state.d_params, **state.d_vars}
            d_opt = serialization.to_state_dict(state.d_opt)
            d_saver.save("Discriminator", step, d_tree, opt_tree=d_opt,
                         best_val=best_val)

    def resume(self, save_path: Optional[str] = None) -> int:
        """Resume training from the latest EOE checkpoints (params + vars + optimizer
        state + step). Capability gap closed vs the reference: its Saver.load_weights
        exists (core.py:97-118) but train.py never calls it (SURVEY §5)."""
        from flax import serialization

        save_path = save_path or self.save_path
        g_saver = Saver(save_path, max_ckpts=3, prefix="EOE_G-")
        loaded = g_saver.load_weights()
        if loaded is None:
            print("[!] Nothing to resume from")
            return 0
        g_payload, g_meta = loaded
        g_sd = g_payload["state_dict"]
        g_vars = {k: v for k, v in g_sd.items() if k != "params"}
        step = int(g_meta["step"]) if g_meta else 0
        new = {"g_params": g_sd["params"], "g_vars": g_vars,
               "step": jnp.asarray(step, jnp.int32)}
        if "optimizer" in g_payload:
            from ..utils.checkpoint import restore_opt_state

            new["g_opt"] = restore_opt_state(self.state.g_opt,
                                             g_payload["optimizer"])
        if self.D is not None:
            d_saver = Saver(save_path, max_ckpts=3, prefix="EOE_D-")
            d_loaded = d_saver.load_weights()
            if d_loaded is not None:
                d_payload, _ = d_loaded
                d_sd = d_payload["state_dict"]
                new["d_params"] = d_sd["params"]
                new["d_vars"] = {k: v for k, v in d_sd.items() if k != "params"}
                if "optimizer" in d_payload:
                    from ..utils.checkpoint import restore_opt_state

                    new["d_opt"] = restore_opt_state(self.state.d_opt,
                                                     d_payload["optimizer"])
        new = jax.device_put(new)  # npz leaves are host numpy; keep state on device
        self.state = self.state.replace(**new)
        if jax.process_count() > 1:
            self._verify_multihost_resume_consistency(new)
        print(f"[*] Resumed from step {step}")
        return step

    def _verify_multihost_resume_consistency(self, new: dict):
        """Chief-only checkpoint writes assume save_path is a shared filesystem.
        On per-host disks, a resumed run would restore params on process 0 while
        others init fresh — silently producing an inconsistent 'replicated' global
        array. Cross-check a parameter checksum across processes and fail loudly
        instead."""
        from jax.experimental import multihost_utils

        local = np.float64(0.0)
        for leaf in jax.tree.leaves(new.get("g_params", {})):
            local += float(jnp.sum(jnp.abs(jnp.asarray(leaf, jnp.float32))))
        sums = np.asarray(multihost_utils.process_allgather(np.float64(local)))
        if not np.allclose(sums, sums[0], rtol=1e-6, atol=1e-6):
            raise RuntimeError(
                "multi-host resume inconsistency: parameter checksums differ "
                f"across processes ({sums.tolist()}). save_path must be a shared "
                "filesystem visible to every host (chief writes, all read); copy "
                "the checkpoint directory to every host or mount shared storage.")

    def gen_train_samples(self, clean_samples, noisy_samples, z_sample,
                          iteration=None):
        """Dump sample wavs during training (ref model.py:177-217)."""
        from ..data.wav_io import write_wav

        n = noisy_samples.shape[0]
        zb = None
        if z_sample is not None:
            zb = jnp.asarray(z_sample[:n])
        canvas, _ = self._gfwd_jit()(self.state.g_params, self.state.g_vars,
                                     jnp.asarray(noisy_samples), zb)
        canvas = np.asarray(canvas)
        dif = noisy_samples - clean_samples
        os.makedirs(self.save_path, exist_ok=True)
        for m in range(n):
            m_canvas = de_emphasize_np(canvas[m, :, 0], self.preemph)
            write_wav(os.path.join(self.save_path, f"sample_{iteration}-{m}.wav"),
                      m_canvas, 16000)
            gtruth_path = os.path.join(self.save_path, f"gtruth_{m}.wav")
            if not os.path.exists(gtruth_path):
                write_wav(gtruth_path,
                          de_emphasize_np(clean_samples[m, :, 0], self.preemph), 16000)
                write_wav(os.path.join(self.save_path, f"noisy_{m}.wav"),
                          de_emphasize_np(noisy_samples[m, :, 0], self.preemph), 16000)
                write_wav(os.path.join(self.save_path, f"dif_{m}.wav"),
                          de_emphasize_np(dif[m, :, 0], self.preemph), 16000)

    def close_pool(self):
        """Close/join the cached eval worker pool (it is reused across evaluate()
        calls within one training run; long-lived importers like serve.py must not
        leak worker processes per engine instance)."""
        if self.pool is not None:
            self.pool.close()
            self.pool.join()
            self.pool = None

    def __del__(self):  # last-resort cleanup for interactive / library use
        try:
            self.close_pool()
        except Exception:
            pass

    # -- evaluation -----------------------------------------------------------
    def _local_inference_state(self):
        """(g_params, g_vars) usable for process-LOCAL inference.

        Under multi-host training, state params are globally-replicated arrays
        spanning all processes; jitting them against a host-local batch mixes
        global and local shardings. Each process's addressable shard of a
        replicated array IS the full value, so materialize it and re-place on
        the local default device (device_put once — numpy leaves in the state
        would re-upload per jitted call)."""
        if jax.process_count() <= 1:
            return self.state.g_params, self.state.g_vars

        def localize(a):
            if isinstance(a, jax.Array) and not a.is_fully_addressable:
                return np.asarray(a.addressable_shards[0].data)
            return a
        return jax.device_put(
            jax.tree.map(localize, (self.state.g_params, self.state.g_vars)))

    def evaluate(self, cfg: SEGANConfig, dloader, log_freq: int,
                 do_noisy: bool = False, max_samples: int = 1):
        """Objective eval with PESQ/SSNR/CSIG/CBAK/COVL over a host process pool
        (ref model.py:440-507).

        Multi-host: every process runs the (cheap, on-device) inference on the
        full batch, but the EXPENSIVE host-side composite scoring is sharded —
        process p scores rows r with r % process_count == p — and the
        per-utterance results are exchanged with process_allgather afterwards,
        so all processes return the identical full result set (early stop stays
        in lockstep) at 1/process_count of the scoring cost."""
        from ..metrics import composite_helper

        METRIC_KEYS = ("pesq", "ssnr", "csig", "cbak", "covl")
        evals = {k: [] for k in METRIC_KEYS}
        noisy_evals = {k: [] for k in METRIC_KEYS}
        if self.pool is None:
            self.pool = mp.Pool(cfg.eval_workers)
        nproc, pidx = jax.process_count(), jax.process_index()
        g_params, g_vars = self._local_inference_state()
        all_ret = []
        for bidx, batch in enumerate(dloader, start=1):
            clean = np.asarray(batch["clean"], np.float32)  # (B, T)
            noisy = np.asarray(batch["noisy"], np.float32)
            # only score valid rows: the loader pads the final ragged batch with
            # duplicated rows carrying mask=0
            bmask = np.asarray(batch.get("mask", np.ones(clean.shape[0])))
            n_valid = int(bmask.sum())
            # deterministic per-(step, batch) eval z: every host draws the SAME z,
            # so val_obj (and the early-stop decision it drives) is bit-identical
            # across processes — a per-host np.random draw could desync the pod
            # nested fold_in: (step, bidx) injected separately, so no collisions
            # between neighboring steps on >=1000-batch val loaders and no uint32
            # overflow of a combined 1000*step+bidx encoding at large step counts
            krng = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed + 77),
                                   int(self.state.step)), bidx)
            z = None
            if not self.G.no_z:
                z = self.G.sample_z(krng, (*noisy.shape, 1))
            Genh_d, _ = self._gfwd_jit()(g_params, g_vars,
                                         jnp.asarray(noisy[..., None]), z)
            Genh = np.asarray(Genh_d)[..., 0]
            clean, noisy, Genh = clean[:n_valid], noisy[:n_valid], Genh[:n_valid]
            clean_de = de_emphasize_np(clean, self.preemph)
            genh_de = de_emphasize_np(Genh, self.preemph)
            beg_t = timeit.default_timer()
            rows = [i for i in range(clean.shape[0]) if i % nproc == pidx]
            if do_noisy:
                noisy_de = de_emphasize_np(noisy, self.preemph)
                args = [(clean_de[i], genh_de[i], noisy_de[i]) for i in rows]
            else:
                args = [(clean_de[i], genh_de[i], None) for i in rows]
            all_ret.extend(self.pool.map(composite_helper, args))
            end_t = timeit.default_timer()
            print(f"Time to process eval with {len(rows)} samples"
                  f" : {end_t - beg_t} s")
            if bidx >= max_samples:
                break

        if nproc > 1:
            all_ret = _allgather_eval_results(all_ret, METRIC_KEYS, do_noisy)

        def fill(ret_dict, in_dict):
            for k, v in in_dict.items():
                ret_dict[k].append(v)

        if do_noisy:
            for eval_, noisy_eval_ in all_ret:
                fill(evals, eval_)
                fill(noisy_evals, noisy_eval_)
            return evals, noisy_evals
        for eval_ in all_ret:
            fill(evals, eval_)
        return evals


def _allgather_eval_results(local_ret, keys, do_noisy):
    """Exchange per-utterance metric dicts across processes: pad each process's
    (n_local, n_metrics) block to the pod-max row count, allgather, and rebuild
    the full result list (identical on every process; order is by process then
    row — only means are consumed downstream)."""
    from jax.experimental import multihost_utils

    nk = len(keys) * (2 if do_noisy else 1)

    def row_of(item):
        if do_noisy:
            e, ne = item
            return [e[k] for k in keys] + [ne[k] for k in keys]
        return [item[k] for k in keys]

    local = np.asarray([row_of(r) for r in local_ret],
                       np.float64).reshape(-1, nk)
    counts = np.asarray(
        multihost_utils.process_allgather(np.int64(local.shape[0])))
    max_n = max(int(counts.max()), 1)
    padded = np.full((max_n, nk), np.nan)
    if local.shape[0]:
        padded[: local.shape[0]] = local
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    out = []
    for p in range(gathered.shape[0]):
        for r in range(int(counts[p])):
            row = gathered[p, r]
            e = {k: float(row[i]) for i, k in enumerate(keys)}
            if do_noisy:
                ne = {k: float(row[len(keys) + i]) for i, k in enumerate(keys)}
                out.append((e, ne))
            else:
                out.append(e)
    return out


def _is_torch_ckpt(path: str) -> bool:
    """Heuristic: torch ckpts are zip ('PK') or legacy pickle; ours are npz (also zip!)
    — so sniff for the numpy header inside."""
    import zipfile

    try:
        with zipfile.ZipFile(path) as z:
            names = z.namelist()
            return not any(n.endswith(".npy") or n == "__meta__.npy" for n in names)
    except zipfile.BadZipFile:
        return True  # legacy torch pickle
