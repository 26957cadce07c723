"""Checkpointing: reference-compatible rotating JSON index + npz pytree payloads, and a
torch→JAX converter for the released PyTorch checkpoints.

Reference Saver semantics (segan/models/core.py:11-151):
- index file '{prefix}checkpoints' with {'latest': [...], 'current': name}
- payload files 'weights_{prefix}{model}-{step}.ckpt' holding {'step','state_dict','optimizer'}
- rotation keeps max_ckpts entries; 'best_' prefix on validation improvement
- partial pretrained load filters by key presence + shape match and skips the final
  output layer unless load_last (core.py:120-151; we key the skip by layer name rather
  than dict position, which is equivalent for all reference models)
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# flat <-> nested pytree-of-dicts
# ---------------------------------------------------------------------------
def _leaf_to_np(leaf) -> np.ndarray:
    """np.asarray that also handles multi-host GLOBAL jax arrays: np.asarray on
    an array spanning non-addressable devices raises, but checkpoint state is
    replicated — each process's first addressable shard IS the full value."""
    try:
        import jax
    except Exception:  # numpy-only contexts
        return np.asarray(leaf)
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        shard = leaf.addressable_shards[0]
        arr = np.asarray(shard.data)
        if arr.shape != leaf.shape:
            raise ValueError(
                f"cannot checkpoint a non-replicated global array of shape "
                f"{leaf.shape} (local shard {arr.shape}); gather it first")
        return arr
    return np.asarray(leaf)


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
        return out
    # leaf
    out[prefix[:-1]] = _leaf_to_np(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_pytree(path: str, tree: Any, meta: Optional[dict] = None):
    flat = flatten_tree(tree)
    if meta is not None:
        flat["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_pytree(path: str) -> Tuple[dict, Optional[dict]]:
    data = np.load(path, allow_pickle=False)
    flat = {}
    meta = None
    for k in data.files:
        if k == "__meta__":
            meta = json.loads(bytes(data[k].tobytes()).decode())
        else:
            flat[k] = data[k]
    return unflatten_tree(flat), meta


# ---------------------------------------------------------------------------
# Saver with the reference's rotating JSON index
# ---------------------------------------------------------------------------
class Saver:
    """Rotating-index checkpoint writer (reference core.py:Saver semantics).

    async_write=True overlaps checkpoint IO with training: the caller-side cost is
    one on-device buffer copy (HBM bandwidth, ~ms), and the device->host transfer +
    file write run in a background thread. Measured on the dev-tunnel TPU the
    synchronous EOE save costs ~20 s per model (D2H at ~33 MB/s for params+optimizer)
    — dominating short epochs. On-device copies are donation-safe: the next train
    step donates the *state* buffers, never these snapshots. One write is in flight
    at a time (a new save joins the previous); flush() joins and re-raises any
    background failure."""

    def __init__(self, save_path: str, max_ckpts: int = 5, prefix: str = "",
                 async_write: bool = False):
        self.save_path = save_path
        self.ckpt_path = os.path.join(save_path, f"{prefix}checkpoints")
        self.max_ckpts = max_ckpts
        self.prefix = prefix
        self.async_write = async_write
        self._inflight = None
        self._bg_error = None

    def flush(self):
        """Wait for any in-flight background write; re-raise its failure."""
        if self._inflight is not None:
            self._inflight.join()
            self._inflight = None
        if self._bg_error is not None:
            err, self._bg_error = self._bg_error, None
            raise err

    def save(self, model_name: str, step: int, tree: Any, opt_tree: Any = None,
             best_val: bool = False) -> str:
        if not self.async_write:
            return self._save_impl(model_name, step, tree, opt_tree, best_val)
        import threading

        import jax

        self.flush()

        def snap(t):
            return jax.tree.map(
                lambda a: a.copy() if isinstance(a, jax.Array) else a, t)

        tree_c, opt_c = snap(tree), snap(opt_tree)
        out = os.path.join(
            self.save_path,
            "weights_" + self.prefix + ("best_" if best_val else "")
            + f"{model_name}-{step}.ckpt")

        def run():
            try:
                self._save_impl(model_name, step, tree_c, opt_c, best_val)
            except BaseException as e:  # surfaced on the next save()/flush()
                self._bg_error = e

        self._inflight = threading.Thread(
            target=run, name=f"saver-{self.prefix}{step}", daemon=False)
        self._inflight.start()
        return out

    def _save_impl(self, model_name: str, step: int, tree: Any,
                   opt_tree: Any = None, best_val: bool = False) -> str:
        os.makedirs(self.save_path, exist_ok=True)
        if os.path.exists(self.ckpt_path):
            with open(self.ckpt_path, "r") as f:
                ckpts = json.load(f)
        else:
            ckpts = {"latest": [], "current": []}
        model_path = f"{model_name}-{step}.ckpt"
        if best_val:
            model_path = "best_" + model_path
        model_path = f"{self.prefix}{model_path}"
        latest = ckpts["latest"]
        if len(latest) > 0 and self.max_ckpts is not None and len(latest) > self.max_ckpts:
            todel = latest[0]
            try:
                os.remove(os.path.join(self.save_path, "weights_" + todel))
            except FileNotFoundError:
                # keep the reference's message, but still drop the dangling entry
                # (a crash between payload and index writes must not wedge rotation)
                print("ERROR: ckpt is not there?")
            latest = latest[1:]
        latest += [model_path]
        ckpts["latest"] = latest
        ckpts["current"] = model_path
        # payload FIRST, index second: a crash mid-save leaves an orphan payload
        # (harmless, collected by the next rotation) instead of an index pointing
        # at a checkpoint that does not exist (which would break resume)
        payload = {"state_dict": tree}
        if opt_tree is not None:
            payload["optimizer"] = opt_tree
        out = os.path.join(self.save_path, "weights_" + model_path)
        save_pytree(out, payload, meta={"step": int(step)})
        # np.savez appends .npz; keep the reference-style name by renaming
        if os.path.exists(out + ".npz"):
            os.replace(out + ".npz", out)
        with open(self.ckpt_path, "w") as f:
            f.write(json.dumps(ckpts, indent=2))
        return out

    def read_latest_checkpoint(self):
        self.flush()  # a just-scheduled async write must be visible to readers
        if not os.path.exists(self.ckpt_path):
            print(f"[!] No checkpoint found in {self.save_path}")
            return False
        with open(self.ckpt_path, "r") as f:
            ckpts = json.load(f)
        return ckpts["current"]

    def load_weights(self):
        curr = self.read_latest_checkpoint()
        if curr is False:
            return None
        tree, meta = load_pytree(os.path.join(self.save_path, "weights_" + curr))
        print("[*] Loaded weights")
        return tree, meta


def restore_opt_state(opt_state_template, loaded_dict: dict):
    """Rehydrate an optax state from a (possibly leaf-sparse) loaded dict.

    Empty pytree nodes (optax EmptyState) carry no leaves so they vanish through the
    npz flatten/unflatten round trip; overlay the loaded leaves onto the template's full
    state_dict before flax deserialization.
    """
    from flax import serialization

    template = serialization.to_state_dict(opt_state_template)

    def overlay(tmpl, loaded):
        for k, v in loaded.items():
            if isinstance(v, dict) and isinstance(tmpl.get(k), dict):
                overlay(tmpl[k], v)
            else:
                tmpl[k] = v

    overlay(template, loaded_dict)
    return serialization.from_state_dict(opt_state_template, template)


def filter_merge_state(model_tree: dict, loaded_tree: dict, skip_names=()) -> dict:
    """Partial-load semantics (ref core.py:130-146): keep loaded leaves whose path exists
    in the model with matching shape; skip any path containing a name in skip_names."""
    model_flat = flatten_tree(model_tree)
    loaded_flat = flatten_tree(loaded_tree)
    merged = dict(model_flat)
    n = 0
    for k, v in loaded_flat.items():
        if any(s in k for s in skip_names):
            continue
        if k in model_flat and model_flat[k].shape == v.shape:
            merged[k] = v.astype(model_flat[k].dtype)
            n += 1
    print(f"Current Model keys: {len(model_flat)}")
    print(f"Loading matching keys: {n}")
    if n != len(model_flat):
        print("WARNING: LOADING DIFFERENT NUM OF KEYS")
    return unflatten_tree(merged)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (released segan+_generator.ckpt etc.)
# ---------------------------------------------------------------------------
def _torch_state_dict(ckpt_file: str) -> Dict[str, np.ndarray]:
    import torch

    st = torch.load(ckpt_file, map_location="cpu", weights_only=False)
    if "state_dict" in st:
        st = st["state_dict"]
    out = {}
    for k, v in st.items():
        # legacy naming migration (ref weightG_fmt_converter.py:30-42)
        if "gen_enc" in k:
            k = k.replace("gen_enc", "enc_blocks")
        elif "gen_dec" in k:
            k = k.replace("gen_dec", "dec_blocks").replace("conv", "deconv")
        # torch nn.utils.spectral_norm stores the unnormalized weight as
        # 'weight_orig' (+ power-iteration state weight_u/weight_v); our layers keep
        # the unnormalized tensor under plain 'weight', so rename here and let the
        # per-layer converters route weight_u/weight_v into the 'spectral' collection
        if k.endswith(".weight_orig"):
            k = k[: -len("_orig")]
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            continue  # num_batches_tracked etc. already handled below
    return out


def _snorm_v_to_ours(v: np.ndarray, kind: str, w_shape) -> np.ndarray:
    """Re-permute torch's spectral-norm right-vector `v` into our column order.

    sigma = u^T W v is invariant to how W's columns are flattened, but the stored v
    indexes torch's flattening — torch views Conv1d weight as (Cout, Cin*K) while we
    view (K*Cin, Cout)^T with columns ordered (K, Cin), so Conv1d v must be
    transposed for exact eval-mode parity (torch recomputes W/sigma(u, v) from the
    loaded state).  ConvTranspose1d uses torch's dim=1 view (Cout, Cin*K) on both
    sides (see modules.py:ConvTranspose1d), so its v transfers directly, as do
    Linear ((out, in) view) and PReLU ((N, 1) view)."""
    v = np.asarray(v, np.float32).reshape(-1)
    if kind == "conv":  # torch cols (Cin, K) -> ours (K, Cin)
        _, cin, kw = w_shape
        return v.reshape(cin, kw).T.reshape(-1)
    return v  # deconv / linear / prelu: same column order


def load_torch_generator(ckpt_file: str) -> dict:
    """Convert a torch SEGAN Generator state-dict to our {'params', 'batch_stats'} tree.

    torch layouts: Conv1d weight (Cout, Cin, K) -> ours (K, Cin, Cout);
    ConvTranspose1d weight (Cin, Cout, K) -> ours (K, Cin, Cout);
    alpha skips (1, C, 1) -> (C,); PReLU 'act.weight' (C,) unchanged.
    """
    st = _torch_state_dict(ckpt_file)
    params: dict = {}
    batch_stats: dict = {}
    spectral: dict = {}

    def put(path, arr, root=None):
        node = params if root is None else root
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(arr, np.float32)

    for k, v in st.items():
        parts = k.split(".")
        if parts[0] in ("enc_blocks", "dec_blocks"):
            blk = f"{parts[0]}_{parts[1]}"
            sub = parts[2]
            leaf = parts[3]
            if sub == "conv" and leaf == "weight":
                put([blk, "conv", "weight"], np.transpose(v, (2, 1, 0)))
            elif sub == "deconv" and leaf == "weight":
                put([blk, "deconv", "weight"], np.transpose(v, (2, 0, 1)))
            elif sub in ("conv", "deconv") and leaf == "bias":
                put([blk, sub, "bias"], v)
            elif sub in ("conv", "deconv") and leaf == "weight_u":
                put([blk, sub, "weight_u"], v, root=spectral)
            elif sub in ("conv", "deconv") and leaf == "weight_v":
                w_shape = st[f"{parts[0]}.{parts[1]}.{sub}.weight"].shape
                put([blk, sub, "weight_v"], _snorm_v_to_ours(v, sub, w_shape),
                    root=spectral)
            elif sub == "act":
                put([blk, "act", "weight"], v)
            elif sub == "norm":
                # BatchNorm weight/bias are params; running stats go to batch_stats
                if leaf in ("running_mean", "running_var"):
                    put([blk, "norm", leaf], v, root=batch_stats)
                elif leaf in ("weight", "bias"):
                    put([blk, "norm", leaf], v)
                # num_batches_tracked dropped
        elif parts[0].startswith("alpha_"):
            if len(parts) == 2 and parts[1] == "skip_k":
                put([parts[0], "skip_k"], np.reshape(v, (-1,)))
            elif parts[1] == "skip_k":  # conv skip: alpha_i.skip_k.weight/bias
                if parts[2] == "weight":
                    put([parts[0], "skip_k", "weight"], np.transpose(v, (2, 1, 0)))
                else:
                    put([parts[0], "skip_k", "bias"], v)
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    if spectral:
        out["spectral"] = spectral
    return out


def load_torch_discriminator(ckpt_file: str, pool_slen: int, last_fmaps: int) -> dict:
    """Convert a torch SEGAN Discriminator state-dict to {'params','batch_stats'}.

    The 'none'-head flatten order differs (torch (B, C, T) -> C*T; ours (B, T, C) -> T*C),
    so fc.0's input dimension is permuted accordingly.
    """
    st = _torch_state_dict(ckpt_file)
    params: dict = {}
    batch_stats: dict = {}
    spectral: dict = {}

    def put(root, path, arr, dtype=np.float32):
        node = root
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(arr, dtype)

    for k, v in st.items():
        parts = k.split(".")
        if parts[0] == "enc_blocks":
            blk = f"enc_blocks_{parts[1]}"
            sub, leaf = parts[2], parts[3]
            if sub == "conv" and leaf == "weight":
                put(params, [blk, "conv", "weight"], np.transpose(v, (2, 1, 0)))
            elif sub == "conv" and leaf == "bias":
                put(params, [blk, "conv", "bias"], v)
            elif sub == "conv" and leaf == "weight_u":
                put(spectral, [blk, "conv", "weight_u"], v)
            elif sub == "conv" and leaf == "weight_v":
                w_shape = st[f"enc_blocks.{parts[1]}.conv.weight"].shape
                put(spectral, [blk, "conv", "weight_v"],
                    _snorm_v_to_ours(v, "conv", w_shape))
            elif sub == "act":
                put(params, [blk, "act", "weight"], v)
            elif sub == "norm":
                if leaf in ("weight", "bias"):
                    put(params, [blk, "norm", leaf], v)
                elif leaf in ("running_mean", "running_var"):
                    put(batch_stats, [blk, "norm", leaf], v)
                # num_batches_tracked dropped
        elif parts[0] == "fc" and len(parts) == 3:
            # Sequential head (pool_type='none'): fc.{0,2,4} Linear, fc.{1,3} PReLU
            idx = int(parts[1])
            leaf = parts[2]
            name = f"fc_{idx}"
            if leaf == "weight_u":
                put(spectral, [name, "weight_u"], v)
            elif leaf == "weight_v":
                vv = np.asarray(v, np.float32).reshape(-1)
                if idx == 0:
                    # fc_0's input order differs (torch C*T flatten vs our T*C):
                    # v indexes the Linear's input columns -> permute like the weight
                    vv = vv.reshape(last_fmaps, pool_slen).T.reshape(-1)
                put(spectral, [name, "weight_v"], vv)
            elif idx in (1, 3):  # PReLU
                put(params, [name, "weight"], v)
            elif leaf == "weight":
                w = np.asarray(v)
                if idx == 0:
                    # (256, C*T) -> (256, C, T) -> (256, T, C) -> (T*C, 256)
                    w = w.reshape(w.shape[0], last_fmaps, pool_slen)
                    w = np.transpose(w, (0, 2, 1)).reshape(w.shape[0], -1)
                put(params, [name, "weight"], w.T)
            else:
                put(params, [name, "bias"], v)
        elif parts[0] == "fc" and len(parts) == 2:
            # single Linear head (pool_type conv/gmax/gavg, ref disc.py:124,130,135)
            if parts[1] == "weight":
                put(params, ["fc", "weight"], np.asarray(v).T)
            elif parts[1] in ("weight_u", "weight_v"):
                put(spectral, ["fc", parts[1]], v)
            else:
                put(params, ["fc", "bias"], v)
        elif parts[0] == "mlp":
            # Conv1d -> PReLU -> Conv1d (ref disc.py:139-143)
            idx, leaf = int(parts[1]), parts[2]
            name = f"mlp_{idx}"
            if leaf == "weight_u":
                put(spectral, [name, "weight_u"], v)
            elif leaf == "weight_v":
                w_shape = st[f"mlp.{idx}.weight"].shape
                kind = "conv" if len(w_shape) == 3 else "linear"
                put(spectral, [name, "weight_v"],
                    _snorm_v_to_ours(v, kind, w_shape))
            elif idx == 1:  # PReLU
                put(params, [name, "weight"], v)
            elif leaf == "weight":
                put(params, [name, "weight"], np.transpose(v, (2, 1, 0)))
            else:
                put(params, [name, "bias"], v)
        elif parts[0] in ("pool_conv",):
            if parts[1] == "weight":
                put(params, ["pool_conv", "weight"], np.transpose(v, (2, 1, 0)))
            elif parts[1] in ("weight_u", "weight_v"):
                kind = "conv" if parts[1] == "weight_v" else "linear"
                w_shape = st["pool_conv.weight"].shape
                put(spectral, ["pool_conv", parts[1]],
                    _snorm_v_to_ours(v, "conv", w_shape)
                    if parts[1] == "weight_v" else v)
            else:
                put(params, ["pool_conv", "bias"], v)
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    if spectral:
        out["spectral"] = spectral
    return out


# -- JAX -> torch export (the reverse migration path) -------------------------


def _torch_tensor(x):
    import torch

    # copy=True: jax buffers arrive as non-writable views torch can't own
    return torch.from_numpy(np.array(x, np.float32, copy=True))


def _snorm_v_to_torch(v, kind: str, our_w_shape) -> np.ndarray:
    """Inverse of _snorm_v_to_ours: our column order back to torch's
    flattening (conv: ours (K, Cin) -> torch (Cin, K); others direct)."""
    v = np.asarray(v, np.float32).reshape(-1)
    if kind == "conv":
        kw, cin, _ = our_w_shape
        return v.reshape(kw, cin).T.reshape(-1)
    return v


def _emit_snorm(sd, torch_prefix, spec, v_transform=lambda v: v):
    """Emit torch nn.utils.spectral_norm state (weight_u/weight_v) for one
    wrapped tensor; the unnormalized weight itself is emitted by the caller
    under '<prefix>.weight_orig'."""
    sd[f"{torch_prefix}.weight_u"] = _torch_tensor(spec["weight_u"])
    sd[f"{torch_prefix}.weight_v"] = _torch_tensor(
        v_transform(np.asarray(spec["weight_v"], np.float32).reshape(-1)))


def _export_block(sd, blk_key, torch_prefix, blk, batch_stats, spectral=None):
    """Emit one GConv1DBlock/GDeconv1DBlock in reference naming/layout.

    Inverse of the load_* layout maps: conv (K, Cin, Cout) -> (Cout, Cin, K);
    deconv (K, Cin, Cout) -> ConvTranspose1d's (Cin, Cout, K). Spectral-norm
    wrapped tensors land as weight_orig + weight_u/weight_v (v re-permuted
    back to torch's column flattening for Conv1d)."""
    import torch

    spectral = spectral or {}
    for kind, perm in (("conv", (2, 1, 0)), ("deconv", (1, 2, 0))):
        if kind in blk:
            w = np.asarray(blk[kind]["weight"])
            spec = spectral.get(kind)
            wname = "weight_orig" if spec else "weight"
            sd[f"{torch_prefix}.{kind}.{wname}"] = _torch_tensor(
                np.transpose(w, perm))
            if spec:
                _emit_snorm(sd, f"{torch_prefix}.{kind}", spec,
                            lambda v, k=kind, s=w.shape:
                            _snorm_v_to_torch(v, k, s))
            if "bias" in blk[kind]:
                sd[f"{torch_prefix}.{kind}.bias"] = _torch_tensor(
                    blk[kind]["bias"])
    if "act" in blk:
        sd[f"{torch_prefix}.act.weight"] = _torch_tensor(blk["act"]["weight"])
    if "norm" in blk:
        n = blk["norm"]
        sd[f"{torch_prefix}.norm.weight"] = _torch_tensor(n["weight"])
        sd[f"{torch_prefix}.norm.bias"] = _torch_tensor(n["bias"])
        bs = batch_stats.get("norm", {})
        c = np.asarray(n["weight"]).shape[0]
        sd[f"{torch_prefix}.norm.running_mean"] = _torch_tensor(
            bs.get("running_mean", np.zeros((c,), np.float32)))
        sd[f"{torch_prefix}.norm.running_var"] = _torch_tensor(
            bs.get("running_var", np.ones((c,), np.float32)))
        sd[f"{torch_prefix}.norm.num_batches_tracked"] = torch.tensor(
            0, dtype=torch.int64)


def _blocks_sorted(params, prefix):
    keys = [k for k in params if k.startswith(prefix)]
    return sorted(keys, key=lambda k: int(k.rsplit("_", 1)[1]))


def export_torch_generator(tree: dict, out_file: str, step: int = 0) -> None:
    """Write our Generator tree as a reference-format torch checkpoint
    (torch.save({'step', 'state_dict'}) with the reference's key names and
    layouts) so the upstream repo's clean.py/load_pretrained consume it
    directly (ref core.py:120-151). Inverse of load_torch_generator."""
    import torch

    params = tree["params"]
    batch_stats = tree.get("batch_stats", {})
    spectral = tree.get("spectral", {})
    sd = {}
    for blk_key in _blocks_sorted(params, "enc_blocks_"):
        _export_block(sd, blk_key, f"enc_blocks.{blk_key.rsplit('_', 1)[1]}",
                      params[blk_key], batch_stats.get(blk_key, {}),
                      spectral.get(blk_key))
    for blk_key in _blocks_sorted(params, "dec_blocks_"):
        _export_block(sd, blk_key, f"dec_blocks.{blk_key.rsplit('_', 1)[1]}",
                      params[blk_key], batch_stats.get(blk_key, {}),
                      spectral.get(blk_key))
    for blk_key in _blocks_sorted(params, "alpha_"):
        skip = params[blk_key]["skip_k"]
        if isinstance(skip, dict):  # conv skip: weight (K, Cin, Cout) + bias
            sd[f"{blk_key}.skip_k.weight"] = _torch_tensor(
                np.transpose(np.asarray(skip["weight"]), (2, 1, 0)))
            if "bias" in skip:
                sd[f"{blk_key}.skip_k.bias"] = _torch_tensor(skip["bias"])
        else:  # alpha/constant: (C,) -> torch's (1, C, 1)
            sd[f"{blk_key}.skip_k"] = _torch_tensor(
                np.reshape(np.asarray(skip), (1, -1, 1)))
    torch.save({"step": int(step), "state_dict": sd}, out_file)


def export_torch_discriminator(tree: dict, out_file: str, pool_slen: int,
                               last_fmaps: int, step: int = 0) -> None:
    """Write our Discriminator tree as a reference-format torch checkpoint.
    Inverse of load_torch_discriminator, including the fc.0 flatten-order
    permutation (ours (B, T, C) -> T*C vs torch's (B, C, T) -> C*T); fc keys
    are emitted in ascending index order so the reference's partial-load
    'drop last 2 keys' semantics (ref core.py:130-137) see fc.4 last."""
    import torch

    params = tree["params"]
    batch_stats = tree.get("batch_stats", {})
    spectral = tree.get("spectral", {})
    sd = {}
    for blk_key in _blocks_sorted(params, "enc_blocks_"):
        _export_block(sd, blk_key, f"enc_blocks.{blk_key.rsplit('_', 1)[1]}",
                      params[blk_key], batch_stats.get(blk_key, {}),
                      spectral.get(blk_key))
    if "pool_conv" in params:
        spec = spectral.get("pool_conv")
        w = np.asarray(params["pool_conv"]["weight"])
        wname = "weight_orig" if spec else "weight"
        sd[f"pool_conv.{wname}"] = _torch_tensor(np.transpose(w, (2, 1, 0)))
        if spec:
            _emit_snorm(sd, "pool_conv", spec,
                        lambda v: _snorm_v_to_torch(v, "conv", w.shape))
        if "bias" in params["pool_conv"]:
            sd["pool_conv.bias"] = _torch_tensor(params["pool_conv"]["bias"])
    for name in _blocks_sorted(params, "fc_"):
        idx = int(name.rsplit("_", 1)[1])
        node = params[name]
        spec = spectral.get(name)
        wname = "weight_orig" if spec else "weight"
        if "bias" not in node and np.asarray(node["weight"]).ndim == 1:
            # PReLU between the Linears (fc.1 / fc.3; the ref's snorm-PReLU
            # quirk wraps the slope too, disc.py:121)
            sd[f"fc.{idx}.{wname}"] = _torch_tensor(node["weight"])
            if spec:
                _emit_snorm(sd, f"fc.{idx}", spec)
            continue
        w = np.asarray(node["weight"]).T  # ours (in, out) -> torch (out, in)
        if idx == 0:
            # (256, T*C) -> (256, T, C) -> (256, C, T) -> (256, C*T)
            w = w.reshape(w.shape[0], pool_slen, last_fmaps)
            w = np.transpose(w, (0, 2, 1)).reshape(w.shape[0], -1)
        sd[f"fc.{idx}.{wname}"] = _torch_tensor(w)
        if spec:
            def fc_v(v, i=idx):
                if i == 0:  # inverse of the loader's (C, T) -> (T, C) permute
                    return v.reshape(pool_slen, last_fmaps).T.reshape(-1)
                return v
            _emit_snorm(sd, f"fc.{idx}", spec, fc_v)
        if "bias" in node:
            sd[f"fc.{idx}.bias"] = _torch_tensor(node["bias"])
    if "fc" in params:  # single-Linear heads (conv/gmax/gavg)
        spec = spectral.get("fc")
        wname = "weight_orig" if spec else "weight"
        sd[f"fc.{wname}"] = _torch_tensor(np.asarray(params["fc"]["weight"]).T)
        if spec:
            _emit_snorm(sd, "fc", spec)
        if "bias" in params["fc"]:
            sd["fc.bias"] = _torch_tensor(params["fc"]["bias"])
    for name in _blocks_sorted(params, "mlp_"):
        idx = int(name.rsplit("_", 1)[1])
        node = params[name]
        spec = spectral.get(name)
        wname = "weight_orig" if spec else "weight"
        if np.asarray(node["weight"]).ndim == 3:
            w = np.asarray(node["weight"])
            sd[f"mlp.{idx}.{wname}"] = _torch_tensor(
                np.transpose(w, (2, 1, 0)))
            if spec:
                _emit_snorm(sd, f"mlp.{idx}", spec,
                            lambda v, s=w.shape:
                            _snorm_v_to_torch(v, "conv", s))
            if "bias" in node:
                sd[f"mlp.{idx}.bias"] = _torch_tensor(node["bias"])
        else:  # PReLU
            sd[f"mlp.{idx}.{wname}"] = _torch_tensor(node["weight"])
            if spec:
                _emit_snorm(sd, f"mlp.{idx}", spec)
    torch.save({"step": int(step), "state_dict": sd}, out_file)
