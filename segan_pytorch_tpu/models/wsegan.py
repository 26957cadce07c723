"""WSEGAN (whisper-to-voiced) and AEWSEGAN (autoencoder ablation) training engines.

Reference: segan/models/model.py:509-766 (WSEGAN), :769-935 (AEWSEGAN).

WSEGAN differences from SEGAN (all fused into one jitted step here):
- iteration-driven loop resampling a fresh batch each iteration (ref model.py:572-574)
- cost = BCE-with-logits when vanilla_gan else MSE (ref model.py:582-585)
- extra fake pairs: misalign_pair (clean vs shuffled clean, ref :597-604) and interf_pair
  (clean + random square wave @250/1k/4k Hz, ref :606-628); D loss weighted 1/2→1/3→1/4
- G gets an STFT power loss (10·log10|STFT|², n_fft 2048 hop 160 win 320 normalized,
  weight pow_weight, ref :638-654) and an L1 term masked to utterances whose name
  contains 'additive' (ref :657-665)
- xavier init everywhere (wsegan_weights_init, ref :45-60, applied :523-524)
- generate() pads to a multiple of 1024 and runs one full pass (ref :755-766)
"""
from __future__ import annotations

import dataclasses
import os
import timeit
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .segan import (
    SEGAN,
    GANTrainState,
    MUTS,
    cast_tree,
    compute_dtype_of,
    masked_mean,
    masked_mse,
    masked_bce_logits,
    build_optimizer,
    apply_wsegan_weights_init,
    Saver,
)
from ..ops import knobs
from ..ops.signal import de_emphasize_np, make_div_n
from ..ops.stft import power_spectrum_db
from ..parallel import local_host_rows
from ..utils.config import SEGANConfig

_INTERF_FREQS = (250.0, 1000.0, 4000.0)
_INTERF_AMPS = (0.01, 0.05, 0.1, 1.0)


def _square_wave_batch(rng, bsz: int, T: int) -> jax.Array:
    """Random-amplitude/freq square waves (ref model.py:610-624): t=linspace(0,2,32000),
    sq = a * square(2π f t), truncated to T samples."""
    kf, ka = jax.random.split(rng)
    f = jnp.asarray(_INTERF_FREQS)[jax.random.randint(kf, (bsz,), 0, len(_INTERF_FREQS))]
    a = jnp.asarray(_INTERF_AMPS)[jax.random.randint(ka, (bsz,), 0, len(_INTERF_AMPS))]
    t = jnp.linspace(0.0, 2.0, 32000)[:T]  # same grid as the reference
    phase = (f[:, None] * t[None, :]) % 1.0
    sq = jnp.where(phase < 0.5, 1.0, -1.0)
    return (a[:, None] * sq)[:, :, None]  # (B, T, 1)


def make_wsegan_train_step(gen, disc, g_tx, d_tx, cfg: SEGANConfig):
    cost = masked_bce_logits if cfg.vanilla_gan else masked_mse
    misalign = cfg.misalign_pair
    interf = cfg.interf_pair
    pow_weight = cfg.pow_weight
    n_fft = cfg.n_fft
    cdt = compute_dtype_of(cfg)
    # --- perf knobs (measured campaign: BENCH.md r3 WSEGAN table) ---
    # snorm_impl='cached' (cfg field / SEGAN_TPU_SNORM): run the spectral-norm
    # power iteration ONCE per step (first D pass) instead of once per D apply.
    # The reference updates u/v on every forward (torch spectral_norm hook), so
    # per_apply is the parity default; cached diverges only in power-iteration
    # count (u/v converge to the same sigma) but removes the sequential u/v
    # dependency chaining the D passes and lets XLA CSE one weight normalization
    # across all of them. snorm-D only (train=False would change BatchNorm
    # semantics).
    cached_snorm = (knobs.resolve("snorm_impl") == "cached"
                    and disc.norm_type == "snorm")
    # ws_fuse_d=true (cfg field / SEGAN_TPU_WS_FUSE_D): judge all real/fake pairs
    # in ONE grouped apply (per-group phase draws + per-group BN stats via
    # stats_groups; with snorm this also implies one power iteration for the
    # whole fused pass, i.e. cached-like counting). Loss weighting identical to
    # the sequential path.
    fuse_d = knobs.resolve_bool("ws_fuse_d")
    # DFT precision for the power loss: under bf16 compute, Genh is already
    # bf16-quantized before the fp32 cast, so the 1-pass DEFAULT contraction
    # (fp32 accumulation) loses nothing real and is ~6x fewer MXU passes than
    # HIGHEST (measured +3% step throughput, BENCH.md r3). fp32 compute keeps
    # HIGHEST for strict fft parity. stft_precision (cfg field /
    # SEGAN_TPU_STFT_PRECISION) overrides both.
    stft_prec = (knobs.resolve("stft_precision")
                 or ("default" if cdt == jnp.bfloat16 else "highest"))

    def step(state: GANTrainState, clean, noisy, mask, additive_mask, rng, l1_weight):
        kz, kd1, kd2, kd3, kd4, kd5, kshuf, kinterf, kdrop = jax.random.split(rng, 9)
        clean_c = clean.astype(cdt)
        noisy_c = noisy.astype(cdt)
        z = gen.sample_z(kz, noisy.shape)
        z = z.astype(cdt) if z is not None else None

        def gfwd(gp):
            out, newv = gen.apply({"params": cast_tree(gp, cdt), **state.g_vars},
                                  noisy_c, z=z,
                                  train=True, mutable=list(MUTS),
                                  rngs={"dropout": kdrop})
            return out, newv

        (Genh, g_vars_new), g_vjp = jax.vjp(gfwd, state.g_params)

        def build_pairs():
            """(input, label, loss-name, phase-key) for every D judgment this step;
            d_weight follows ref model.py:594,603,627 (1/2 -> misalign 1/3 ->
            interf 1/4)."""
            pairs = [
                (jnp.concatenate([clean_c, noisy_c], -1), 1.0, "d_real", kd1),
                (jnp.concatenate([jax.lax.stop_gradient(Genh), noisy_c], -1),
                 0.0, "d_fake", kd2),
            ]
            d_weight = 0.5
            if misalign:
                perm = jax.random.permutation(kshuf, clean.shape[0])
                pairs.append((jnp.concatenate([clean_c, clean_c[perm]], -1),
                              0.0, "d_fake_shuf", kd4))
                d_weight = 1.0 / 3
            if interf:
                squares = _square_wave_batch(kinterf, clean.shape[0],
                                             clean.shape[1])
                pairs.append((jnp.concatenate(
                    [clean_c + squares.astype(cdt), noisy_c], -1),
                    0.0, "d_fake_inter", kd5))
                d_weight = 1.0 / 4
            return pairs, d_weight

        def d_loss_fn(d_params):
            dp_c = cast_tree(d_params, cdt)
            pairs, d_weight = build_pairs()
            losses = {}
            if fuse_d:
                G = len(pairs)
                big = jnp.concatenate([p[0] for p in pairs], axis=0)
                maskG = jnp.concatenate([mask] * G)
                rngs = {("phase" if g == 0 else f"phase{g + 1}"): pairs[g][3]
                        for g in range(G)}
                (y, _), dvars = disc.apply(
                    {"params": dp_c, **state.d_vars}, big,
                    train=True, mask=maskG, stats_groups=G,
                    mutable=list(MUTS), rngs=rngs)
                B = clean.shape[0]
                d_loss = 0.0
                for g, (_, label, name, _) in enumerate(pairs):
                    losses[name] = cost(y[g * B:(g + 1) * B], label, mask)
                    d_loss = d_loss + losses[name]
                return d_weight * d_loss, (dvars, losses)
            dvars = state.d_vars
            d_loss = 0.0
            for i, (x_, label, name, key) in enumerate(pairs):
                # cached snorm: only the first pass iterates u/v; later passes
                # reuse the updated state (identical normalized weights -> CSE)
                tr = True if (i == 0 or not cached_snorm) else False
                (y, _), dvars = disc.apply({"params": dp_c, **dvars},
                                           x_, train=tr, mask=mask,
                                           mutable=list(MUTS),
                                           rngs={"phase": key})
                losses[name] = cost(y, label, mask)
                d_loss = d_loss + losses[name]
            return d_weight * d_loss, (dvars, losses)

        (d_loss, (d_vars_mid, d_losses)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt_new = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params_new = optax.apply_updates(state.d_params, d_updates)

        clean_pow = power_spectrum_db(clean[..., 0].astype(jnp.float32), n_fft,
                                      precision=stft_prec)

        def g_obj(Genh_):
            (d_fake_, _), m3 = disc.apply(
                {"params": cast_tree(d_params_new, cdt), **d_vars_mid},
                jnp.concatenate([Genh_, noisy_c], -1),
                train=not cached_snorm, mask=mask, mutable=list(MUTS),
                rngs={"phase": kd3})
            g_adv = cost(d_fake_, 1.0, mask)
            genh_pow = power_spectrum_db(Genh_[..., 0].astype(jnp.float32),
                                         n_fft, precision=stft_prec)
            pow_loss = pow_weight * masked_mean(jnp.abs(genh_pow - clean_pow), mask)
            G_cost = g_adv + pow_loss
            amask = additive_mask[:, None, None]
            den_loss = l1_weight * masked_mean(
                jnp.abs(Genh_.astype(jnp.float32) * amask - clean * amask), mask)
            den_loss = jnp.where(l1_weight > 0, den_loss, 0.0)
            G_cost = G_cost + den_loss
            return G_cost, (m3, g_adv, pow_loss, den_loss)

        (g_cost, (d_vars_new, g_adv, pow_loss, den_loss)), dGenh = (
            jax.value_and_grad(g_obj, has_aux=True)(Genh))
        vars_cot = jax.tree.map(jnp.zeros_like, g_vars_new)
        (g_grads,) = g_vjp((dGenh, vars_cot))
        g_updates, g_opt_new = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params_new = optax.apply_updates(state.g_params, g_updates)

        new_state = state.replace(
            g_params=g_params_new, g_vars=g_vars_new, g_opt=g_opt_new,
            d_params=d_params_new, d_vars=d_vars_new, d_opt=d_opt_new,
            step=state.step + 1)
        metrics = {"d_loss": d_loss, "g_loss": g_cost, "g_adv": g_adv,
                   "pow_loss": pow_loss, "den_loss": den_loss, **d_losses}
        return new_state, metrics, Genh.astype(jnp.float32), z

    return step


class WSEGAN(SEGAN):
    name = "WSEGAN"

    def __init__(self, cfg: SEGANConfig, generator=None, discriminator=None):
        super().__init__(cfg, generator, discriminator)
        self.lbd = 1
        self.critic_iters = 1
        self.misalign_pair = cfg.misalign_pair
        self.interf_pair = cfg.interf_pair
        self.pow_weight = cfg.pow_weight
        self.vanilla_gan = cfg.vanilla_gan
        self.n_fft = cfg.n_fft

    def init_state(self, rng=None, batch_size: int = 1):
        state = super().init_state(rng, batch_size)
        # xavier re-init everywhere (ref model.py:523-524 → wsegan_weights_init)
        key = jax.random.PRNGKey(self.cfg.seed + 1)
        kg, kd = jax.random.split(key)
        state = state.replace(
            g_params=apply_wsegan_weights_init(state.g_params, kg),
            d_params=apply_wsegan_weights_init(state.d_params, kd),
        )
        # re-init optimizer states to match fresh params
        g_tx, d_tx = self.build_optimizers()
        state = state.replace(g_opt=g_tx.init(state.g_params),
                              d_opt=d_tx.init(state.d_params))
        self.state = state
        return state

    def prepare_train(self, batch_size: Optional[int] = None):
        if self.state is None:
            self.init_state(batch_size=batch_size or 1)
        g_tx, d_tx = self.build_optimizers()
        step = make_wsegan_train_step(self.G, self.D, g_tx, d_tx, self.cfg)
        self._raw_step = step  # enables the inherited prepare_multi_step
        self._jit_step = jax.jit(step, donate_argnums=(0,))
        self._setup_parallel()
        return self._jit_step

    def train_step(self, clean, noisy, mask, additive_mask, rng, l1_weight: float):
        clean, noisy, mask, additive_mask = self._shard_batch(
            clean, noisy, mask, additive_mask)
        new_state, metrics, Genh, z = self._jit_step(
            self.state, clean, noisy, mask, additive_mask, rng,
            jnp.float32(l1_weight))
        self.state = new_state
        # arg exemplars for step_flops() (bench --engine wsegan MFU)
        self._flops_args = (new_state, clean, noisy, mask, additive_mask, rng,
                            jnp.float32(l1_weight))
        return metrics, Genh, z

    def train(self, cfg: SEGANConfig, dloader, criterion=None, l1_init: float = 100.0,
              l1_dec_step: float = 1e-5, l1_dec_epoch: int = 100, log_freq: int = 50,
              va_dloader=None, device=None):
        """Iteration-driven loop resampling fresh batches (ref model.py:541-753)."""
        from ..utils.logging import TrainLogger

        is_chief = jax.process_index() == 0  # only the chief writes artifacts
        self.writer = TrainLogger(os.path.join(cfg.save_path, "train"),
                                  enabled=is_chief)
        self.prepare_train(cfg.batch_size)
        eoe_g_saver = Saver(cfg.save_path, max_ckpts=3, prefix="EOE_G-",
                            async_write=True)
        eoe_d_saver = Saver(cfg.save_path, max_ckpts=3, prefix="EOE_D-",
                            async_write=True)
        num_batches = len(dloader)
        l1_weight = l1_init
        timings = []
        noisy_samples = clean_samples = z_sample = None
        rng = jax.random.PRNGKey(cfg.seed)

        from ..data.loader import device_prefetch

        batch_shard = None
        if self.mesh is not None:
            from ..parallel import batch_sharding

            batch_shard = batch_sharding(self.mesh)

        def batch_stream():
            while True:
                for b in dloader:
                    # emit the additive-L1 flag (ref model.py:657-665: L1 only on
                    # utterances whose name contains 'additive') as a per-row float32
                    # ndarray BEFORE prefetch: device_prefetch assembles ndarray
                    # fields into global arrays across hosts, so under
                    # process_count>1 the flag gets the same global-batch treatment
                    # as clean/noisy/mask (a per-host Python list would stay local
                    # and shape-mismatch the sharded step)
                    b["additive_mask"] = np.asarray(
                        [1.0 if "additive" in u else 0.0 for u in b["uttname"]],
                        np.float32)
                    yield b

        stream = device_prefetch(batch_stream(), sharding=batch_shard)
        restore_sig = self._install_preempt_handler()
        total_iters = cfg.epoch * num_batches
        # steps_per_call: run S full steps per dispatched program (lax.scan,
        # bit-equal per step — tests/test_train.py::TestMultiStepDispatch);
        # measured +2% step throughput at the canonical batch 150 (BENCH.md r3).
        # Single-process only: stacking multi-host global arrays is not wired.
        S = max(1, int(getattr(cfg, "steps_per_call", 1)))
        if S > 1 and jax.process_count() > 1:
            print("[!] steps_per_call > 1 is single-process only; using 1")
            S = 1
        if S > 1:
            self.prepare_multi_step(S)
        # resume-aware: continue iteration numbering from the restored step so a
        # resumed run executes only the remaining budget and EOE ckpt names carry on
        # (mirrors SEGAN.train; the reference has no resume at all)
        start_iter = int(self.state.step) if self.state is not None else 0
        beg_t = timeit.default_timer()
        iteration = start_iter
        while iteration < total_iters:
            prev_iteration = iteration
            # the scanned program is fixed at S steps: full groups go through
            # it, the ragged tail falls back to single-step dispatches. Groups
            # never cross an epoch boundary, so the EOE checkpoint/eval cadence
            # (crossed(num_batches)) is step-exact
            to_epoch_end = num_batches - (iteration % num_batches)
            n_sub = S if min(total_iters - iteration, to_epoch_end) >= S else 1
            rng, krun = jax.random.split(rng)
            if n_sub > 1:
                batches = [next(stream) for _ in range(n_sub)]
                clean, noisy, mask, amask = self._stack_group(
                    batches, extra_keys=("additive_mask",))
                _, metrics, Genh, z = self.train_step_multi(
                    clean, noisy, mask, amask, rng=krun,
                    l1_w_s=[l1_weight] * n_sub)
                clean, noisy = clean[-1], noisy[-1]  # last sub-batch for samples
                iteration += n_sub
            else:
                batch = next(stream)
                clean = batch["clean"][..., None]
                noisy = batch["noisy"][..., None]
                mask = batch.get("mask",
                                 np.ones((clean.shape[0],), np.float32))
                additive_mask = batch["additive_mask"]
                metrics, Genh, z = self.train_step(clean, noisy, mask,
                                                   additive_mask, krun,
                                                   l1_weight)
                iteration += 1

            def crossed(every: int) -> bool:
                return iteration // every != prev_iteration // every

            end_t = timeit.default_timer()
            timings.append(end_t - beg_t)
            beg_t = timeit.default_timer()
            if noisy_samples is None:
                noisy_samples = local_host_rows(noisy, 20)
                clean_samples = local_host_rows(clean, 20)
                if z is not None:
                    z_sample = local_host_rows(z, 20)
            if crossed(log_freq):
                m = {k: float(v) for k, v in metrics.items()}
                print(f"Iter {iteration}/{total_iters} ({num_batches} bpe)"
                      f" d_loss:{m['d_loss']:.4f}, g_loss: {m['g_loss']:.4f},"
                      f" pow_loss: {m['pow_loss']:.4f}, den_loss: {m['den_loss']:.4f}"
                      f" btime: {timings[-1]:.4f} s, mbtime: {np.mean(timings):.4f} s")
                self.writer.scalar("D_loss", m["d_loss"], iteration)
                self.writer.scalar("G_loss", m["g_loss"], iteration)
                self.writer.scalar("G_adv_loss", m["g_adv"], iteration)
                self.writer.scalar("G_pow_loss", m["pow_loss"], iteration)
                # STFT-power + waveform histograms (ref model.py:703-719); computed
                # on this host's rows only — histograms are diagnostics, not losses
                genh_rows = local_host_rows(Genh)
                clean_rows = local_host_rows(clean)
                self.writer.histogram(
                    "clean_mod_pow",
                    np.asarray(power_spectrum_db(
                        jnp.asarray(clean_rows)[..., 0], self.n_fft)), iteration)
                self.writer.histogram(
                    "Genh_mod_pow",
                    np.asarray(power_spectrum_db(
                        jnp.asarray(genh_rows)[..., 0], self.n_fft)), iteration)
                self.writer.histogram("Gz", genh_rows, iteration)
                self.writer.histogram("clean", clean_rows, iteration)
                self.writer.histogram("noisy", local_host_rows(noisy), iteration)
                self.writer.weight_norms(self.state.g_params, "Gtotal", iteration)
                self.writer.weight_norms(self.state.d_params, "Dtotal", iteration)
                self._log_skip_alphas(iteration)
                if not cfg.no_train_gen:
                    if is_chief:
                        self.gen_train_samples(clean_samples, noisy_samples, z_sample,
                                           iteration=iteration)
            if crossed(num_batches):
                epoch = iteration // num_batches
                if epoch % max(1, getattr(cfg, "eoe_save_every", 1)) == 0 \
                        or iteration >= total_iters:
                    if is_chief:
                        self.save(eoe_g_saver, eoe_d_saver, iteration)
            if self._preempted:
                print(f"[!] preempted at iteration {iteration}: saving "
                      "checkpoint and stopping")
                if is_chief:
                    self.save(eoe_g_saver, eoe_d_saver, iteration)
                break
        restore_sig()
        eoe_g_saver.flush()
        eoe_d_saver.flush()

    def _log_skip_alphas(self, iteration: int):
        """skip-alpha histograms (ref model.py:720-727)."""
        for name, sub in self.state.g_params.items():
            if name.startswith("alpha_") and isinstance(sub, dict) and "skip_k" in sub:
                v = sub["skip_k"]
                if not isinstance(v, dict):
                    self.writer.histogram(f"skip_{name}", np.asarray(v), iteration)

    def generate(self, inwav, z=None, chunk_buckets: bool = False, rng=None,
                 overlap: float = 0.0):
        """Single full pass padded to a multiple of 1024 (ref model.py:755-766).
        z is fresh per utterance (drawn in-forward by the reference generator).
        `overlap` is accepted for interface parity with SEGAN.generate and ignored:
        the WSEGAN path has no chunk boundaries to cross-fade."""
        wav = np.asarray(inwav, np.float32).reshape(-1)
        ori_len = wav.shape[0]
        p_wav = np.asarray(make_div_n(jnp.asarray(wav), 1024))
        x = p_wav[None, :, None]
        zb = None
        if not self.G.no_z:
            t = x.shape[1]
            for p in self.G.poolings:
                t //= p
            if z is None:
                if rng is None:
                    if self._gen_rng is None:
                        self._gen_rng = jax.random.PRNGKey(self.cfg.seed)
                    self._gen_rng, rng = jax.random.split(self._gen_rng)
                zb = jax.random.normal(rng, (1, t, self.G.effective_z_dim))
            else:
                zb = jnp.asarray(z)
        out, hall = self.G.apply({"params": self.state.g_params, **self.state.g_vars},
                                 jnp.asarray(x), z=zb, ret_hid=True, train=False)
        c_res = np.asarray(out)[0, :ori_len, 0]
        c_res = de_emphasize_np(c_res, self.preemph)
        return c_res, hall

    def generate_batch(self, inwavs, chunk_buckets: bool = True, rng=None,
                       overlap: float = 0.0, rngs=None):
        """Batched WSEGAN enhancement (clean.py --batch_utts for the whisper
        variant): utterances are grouped by their make_div_n(1024) padded
        length and each group runs as ONE device pass. Unlike SEGAN's
        chunk-grid batching, rows must share the padded length for the math to
        equal sequential generate() (padding further than make_div_n would
        change deep-layer receptive fields), so only equal-length groups
        coalesce — typical fixed-duration corpora collapse to one group.

        PRNG order matches N sequential generate() calls: the i-th utterance
        consumes the i-th draw of the per-model stream regardless of grouping.
        Returns a list of (enhanced_wav, hall) like N generate() results (hall
        leaves sliced to the row, keeping the leading batch dim of 1).

        rngs: optional per-utterance key list (serving: each request may carry
        its own seed). None entries draw from the per-model stream in order,
        so mixed seeded/unseeded batches match the sequential calls exactly.
        Mutually exclusive with rng (one key split across all utterances).

        chunk_buckets=True pads each group's ROW count to a power of two
        (inert zero rows, outputs discarded) so recompiles are bounded by
        O(log B x distinct padded lengths) instead of one program per exact
        group size; the padded LENGTH axis stays data-dependent by design
        (padding past make_div_n would change deep receptive fields)."""
        if inwavs is None or len(inwavs) == 0:
            return []
        if rng is not None and rngs is not None:
            raise ValueError("pass rng OR rngs, not both")
        wavs = [np.asarray(w, np.float32).reshape(-1) for w in inwavs]
        keys = []
        if not self.G.no_z:
            if rngs is not None:
                if len(rngs) != len(wavs):
                    raise ValueError(f"rngs has {len(rngs)} entries for "
                                     f"{len(wavs)} utterances")
                for r in rngs:
                    if r is None:
                        if self._gen_rng is None:
                            self._gen_rng = jax.random.PRNGKey(self.cfg.seed)
                        self._gen_rng, r = jax.random.split(self._gen_rng)
                    keys.append(r)
            elif rng is None:
                if self._gen_rng is None:
                    self._gen_rng = jax.random.PRNGKey(self.cfg.seed)
                for _ in wavs:
                    self._gen_rng, r = jax.random.split(self._gen_rng)
                    keys.append(r)
            else:
                keys = list(jax.random.split(rng, len(wavs)))
        groups: dict = {}
        for i, w in enumerate(wavs):
            T = w.shape[0]
            L = T + 1024 - (T % 1024)  # make_div_n quirk: full extra N at T%N==0
            groups.setdefault(L, []).append(i)
        results: list = [None] * len(wavs)
        for L, idxs in sorted(groups.items()):
            n = len(idxs)
            rows = n
            if chunk_buckets and n > 1:
                rows = 1 << (n - 1).bit_length()  # next pow2 row bucket
            x = np.zeros((rows, L, 1), np.float32)
            for r_, i in enumerate(idxs):
                x[r_, : wavs[i].shape[0], 0] = wavs[i]
            zb = None
            if not self.G.no_z:
                t = L
                for p in self.G.poolings:
                    t //= p
                zd = self.G.effective_z_dim
                z_rows = [jax.random.normal(keys[i], (1, t, zd))
                          for i in idxs]
                if rows > n:  # inert pad rows: fixed dummy key, outputs dropped
                    pad = jax.random.normal(jax.random.PRNGKey(0),
                                            (rows - n, t, zd))
                    z_rows.append(pad)
                zb = jnp.concatenate(z_rows, axis=0)
            out, hall = self.G.apply(
                {"params": self.state.g_params, **self.state.g_vars},
                jnp.asarray(x), z=zb, ret_hid=True, train=False)
            out = np.asarray(out[:n])  # don't fetch the pad rows
            for r_, i in enumerate(idxs):
                c = de_emphasize_np(out[r_, : wavs[i].shape[0], 0],
                                    self.preemph)
                hall_i = jax.tree.map(lambda a, r=r_: a[r: r + 1], hall)
                results[i] = (c, hall_i)
        return results


def make_ae_train_step(gen, g_tx, cfg: SEGANConfig, use_l1: bool):
    cdt = compute_dtype_of(cfg)

    def step(state: GANTrainState, clean, noisy, mask, rng, l1_weight):
        kz, kdrop = jax.random.split(rng)
        noisy_c = noisy.astype(cdt)
        z = gen.sample_z(kz, noisy.shape)
        z = z.astype(cdt) if z is not None else None

        def loss_fn(gp):
            Genh, newv = gen.apply({"params": cast_tree(gp, cdt), **state.g_vars},
                                   noisy_c, z=z,
                                   train=True, mutable=list(MUTS),
                                   rngs={"dropout": kdrop})
            Genh32 = Genh.astype(jnp.float32)
            if use_l1:
                loss = masked_mean(jnp.abs(Genh32 - clean), mask)
            else:
                loss = masked_mean((Genh32 - clean) ** 2, mask)
            return loss, (newv, Genh32)

        (loss, (g_vars_new, Genh)), g_grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt_new = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params_new = optax.apply_updates(state.g_params, g_updates)
        new_state = state.replace(g_params=g_params_new, g_vars=g_vars_new,
                                  g_opt=g_opt_new, step=state.step + 1)
        return new_state, {"loss": loss}, Genh, z

    return step


class AEWSEGAN(WSEGAN):
    """Autoencoder ablation: no discriminator, pure regression (ref model.py:769-935).

    NOTE: the reference's AEWSEGAN references `self.l1_loss` which only exists in legacy
    configs (a latent crash, ref model.py:823 / SURVEY §2.2); we derive it from
    cfg.legacy_l1_loss when present, else reg_loss == 'l1_loss'.
    """

    name = "AEWSEGAN"

    def __init__(self, cfg: SEGANConfig, generator=None, discriminator=None):
        # G-only step: the Cout=1 output deconv is a larger fraction, and the
        # blocked lowering for that one layer measured +2.1% at canonical batch
        # 150 (BENCH.md r4 matrix: 4962-4988 vs 4846-4896 slices/s/chip) —
        # engine default 'edge-blocked', overridable via cfg.deconv_impl /
        # SEGAN_TPU_DECONV. Resolved into a COPY (never mutate the caller's cfg:
        # a reused cfg object must not leak this default into other engines);
        # self.cfg carries the resolved value, which train.py re-dumps into
        # train.opts after construction.
        if getattr(cfg, "deconv_impl", None) is None:
            resolved = dataclasses.replace(cfg, deconv_impl="edge-blocked")
            resolved._unknown = getattr(cfg, "_unknown", {})
            cfg = resolved
        super().__init__(cfg, generator, discriminator)
        self.D = None
        if cfg.legacy_l1_loss is not None:
            self.use_l1 = bool(cfg.legacy_l1_loss)
        else:
            self.use_l1 = cfg.reg_loss == "l1_loss"

    def init_state(self, rng=None, batch_size: int = 1):
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        kg, kz = jax.random.split(rng)
        from flax.core import unfreeze

        x = jnp.zeros((batch_size, cfg.slice_size, 1), jnp.float32)
        g_variables = unfreeze(self.G.init({"params": kg, "z": kz, "dropout": kz},
                                           x, train=True))
        g_params = g_variables.pop("params")
        g_params = apply_wsegan_weights_init(g_params, jax.random.PRNGKey(cfg.seed + 1))
        g_tx = self._build_g_tx()
        self.state = GANTrainState(
            g_params=g_params, g_vars=g_variables, g_opt=g_tx.init(g_params),
            d_params=None, d_vars=None, d_opt=None, step=jnp.zeros((), jnp.int32))
        return self.state

    def _build_g_tx(self):
        cfg = self.cfg
        if cfg.opt == "rmsprop":
            return build_optimizer("rmsprop", cfg.g_lr)
        # ref model.py:790: Adam betas (0.5, 0.9) for the AE variant
        return build_optimizer("adam", cfg.g_lr, betas=(0.5, 0.9))

    def prepare_train(self, batch_size: Optional[int] = None):
        if self.state is None:
            self.init_state(batch_size=batch_size or 1)
        g_tx = self._build_g_tx()
        step = make_ae_train_step(self.G, g_tx, self.cfg, self.use_l1)
        # raw step kept for prepare_multi_step (same (state, clean, noisy, mask,
        # rng, l1_w) signature as the SEGAN step, so the inherited scan works)
        self._raw_step = step
        self._jit_step = jax.jit(step, donate_argnums=(0,))
        self._setup_parallel()
        return self._jit_step

    def train_step(self, clean, noisy, mask, rng, l1_weight: float):
        clean, noisy, mask = self._shard_batch(clean, noisy, mask)
        new_state, metrics, Genh, z = self._jit_step(
            self.state, clean, noisy, mask, rng, jnp.float32(l1_weight))
        self.state = new_state
        # exemplars for step_flops() (same avals as the donated inputs)
        self._flops_fn = self._jit_step
        self._flops_args = (new_state, clean, noisy, mask, rng,
                            jnp.float32(l1_weight))
        return metrics, Genh, z

    def train(self, cfg: SEGANConfig, dloader, criterion=None, l1_init=100.0,
              l1_dec_step=1e-5, l1_dec_epoch=100, log_freq=50, va_dloader=None,
              device=None):
        from ..utils.logging import TrainLogger

        is_chief = jax.process_index() == 0  # only the chief writes artifacts
        self.writer = TrainLogger(os.path.join(cfg.save_path, "train"),
                                  enabled=is_chief)
        self.prepare_train(cfg.batch_size)
        eoe_g_saver = Saver(cfg.save_path, max_ckpts=3, prefix="EOE_G-",
                            async_write=True)
        num_batches = len(dloader)
        timings = []
        best_val_obj = np.inf
        noisy_samples = clean_samples = z_sample = None
        rng = jax.random.PRNGKey(cfg.seed)

        from ..data.loader import device_prefetch

        def batch_stream():
            while True:
                for b in dloader:
                    yield b

        stream = device_prefetch(batch_stream())
        restore_sig = self._install_preempt_handler()
        total_iters = cfg.epoch * num_batches
        # steps_per_call: same multi-step-per-dispatch machinery as SEGAN/WSEGAN
        # (prepare_multi_step lax.scan; per-step math bit-equal —
        # tests/test_train.py::TestMultiStepDispatch::test_aewsegan). The AE loop
        # is rarely dispatch-bound (one G pass/step) but shares the knob for parity.
        S = max(1, int(getattr(cfg, "steps_per_call", 1)))
        if S > 1 and jax.process_count() > 1:
            print("[!] steps_per_call > 1 is single-process only; using 1")
            S = 1
        if S > 1:
            self.prepare_multi_step(S)
        # resume-aware: same remaining-budget semantics as WSEGAN.train above
        start_iter = int(self.state.step) if self.state is not None else 0
        beg_t = timeit.default_timer()
        iteration = start_iter
        while iteration < total_iters:
            prev_iteration = iteration
            # epoch-aligned groups, same rule as WSEGAN.train above
            to_epoch_end = num_batches - (iteration % num_batches)
            n_sub = S if min(total_iters - iteration, to_epoch_end) >= S else 1
            rng, krun = jax.random.split(rng)
            if n_sub > 1:
                batches = [next(stream) for _ in range(n_sub)]
                clean, noisy, mask = self._stack_group(batches)
                _, metrics, Genh, z = self.train_step_multi(
                    clean, noisy, mask, rng=krun, l1_w_s=[l1_init] * n_sub)
                clean, noisy = clean[-1], noisy[-1]  # last sub-batch for samples
                iteration += n_sub
            else:
                batch = next(stream)
                clean = batch["clean"][..., None]
                noisy = batch["noisy"][..., None]
                mask = batch.get("mask", np.ones((clean.shape[0],), np.float32))
                metrics, Genh, z = self.train_step(clean, noisy, mask, krun,
                                                   l1_init)
                iteration += 1

            def crossed(every: int) -> bool:
                return iteration // every != prev_iteration // every

            end_t = timeit.default_timer()
            timings.append(end_t - beg_t)
            beg_t = timeit.default_timer()
            if noisy_samples is None:
                noisy_samples = local_host_rows(noisy, 20)
                clean_samples = local_host_rows(clean, 20)
                if z is not None:
                    z_sample = local_host_rows(z, 20)
            if crossed(log_freq):
                loss = float(metrics["loss"])
                # power loss logged but not backwarded (ref model.py:842-857)
                genh_pow = np.asarray(power_spectrum_db(
                    jnp.asarray(local_host_rows(Genh))[..., 0], cfg.n_fft))
                clean_pow = np.asarray(power_spectrum_db(
                    jnp.asarray(local_host_rows(clean))[..., 0], cfg.n_fft))
                pow_loss = float(np.mean(np.abs(genh_pow - clean_pow)))
                print(f"Iter {iteration}/{total_iters} ({num_batches} bpe)"
                      f" g_l2_loss:{loss:.4f}, pow_loss: {pow_loss:.4f},"
                      f" btime: {timings[-1]:.4f} s, mbtime: {np.mean(timings):.4f} s")
                self.writer.scalar("g_l2/l1_loss", loss, iteration)
                self.writer.scalar("G_pow_loss", pow_loss, iteration)
                self._log_skip_alphas(iteration)
                if not cfg.no_train_gen:
                    if is_chief:
                        self.gen_train_samples(clean_samples, noisy_samples, z_sample,
                                           iteration=iteration)
                if va_dloader is not None:
                    sd = self.evaluate_sd(cfg, va_dloader)
                    self.writer.scalar("Genh_SD", sd, iteration)
                    if sd < best_val_obj:
                        best_saver = Saver(cfg.save_path, max_ckpts=3,
                                           prefix=f"{self.name}-G-")
                        g_tree = {"params": self.state.g_params,
                                  **self.state.g_vars}
                        if is_chief:
                            best_saver.save("Generator", iteration, g_tree,
                                            best_val=True)
                        best_val_obj = sd
            if crossed(num_batches):
                epoch = iteration // num_batches
                if epoch % max(1, getattr(cfg, "eoe_save_every", 1)) == 0 \
                        or iteration >= total_iters:
                    g_tree = {"params": self.state.g_params,
                              **self.state.g_vars}
                    if is_chief:
                        eoe_g_saver.save("Generator", iteration, g_tree)
            if self._preempted:
                print(f"[!] preempted at iteration {iteration}: saving "
                      "checkpoint and stopping")
                if is_chief:
                    eoe_g_saver.save("Generator", iteration,
                                     {"params": self.state.g_params,
                                      **self.state.g_vars})
                break
        restore_sig()
        eoe_g_saver.flush()

    def evaluate_sd(self, cfg: SEGANConfig, dloader, max_samples: int = 1) -> float:
        """Spectral distortion (dB): mean |log-power(Genh) - log-power(clean)|.

        The reference's AEWSEGAN eval path unpacks SEGAN.evaluate's dicts into scalars
        and would crash (model.py:917-931); this is the working equivalent of the SD (dB)
        metric it intended to track."""
        sds = []
        for bidx, batch in enumerate(dloader, start=1):
            noisy = jnp.asarray(batch["noisy"][..., None])
            clean = jnp.asarray(batch["clean"][..., None])
            Genh = self.infer_G(noisy)
            gp = power_spectrum_db(Genh[..., 0], cfg.n_fft)
            cp = power_spectrum_db(clean[..., 0], cfg.n_fft)
            sds.append(float(jnp.mean(jnp.abs(gp - cp))))
            if bidx >= max_samples:
                break
        return float(np.mean(sds))

    def save(self, g_saver, d_saver, step, best_val: bool = False):
        # device arrays handed over as-is; async Savers snapshot on-device
        g_tree = {"params": self.state.g_params, **self.state.g_vars}
        g_saver.save("Generator", step, g_tree, best_val=best_val)
