"""Shared inference-engine construction for the enhancement front-ends.

clean.py and serve.py load the model identically (train.opts JSON -> SEGAN/WSEGAN,
torch-ckpt auto-detect, per-utterance z stream seeded from --seed); keeping that in
one place so checkpoint/rng behavior cannot drift between the batch CLI and the
server. Ref for the load protocol: reference clean.py:28-45.
"""
from __future__ import annotations


def build_enhancement_engine(cfg_file: str, g_ckpt: str, seed: int = 111):
    """Returns (cfg, engine) with the generator loaded and the z stream seeded."""
    import jax

    from .cache import enable_compilation_cache
    enable_compilation_cache()

    from .config import load_train_opts
    from ..models import AEWSEGAN, SEGAN, WSEGAN

    cfg = load_train_opts(cfg_file)
    # train.py sets aewsegan with wsegan=False, so check it FIRST: an
    # AEWSEGAN checkpoint served through plain SEGAN would get chunk-grid
    # generate semantics instead of the engine's single make_div_n pass
    # (AEWSEGAN subclasses WSEGAN and inherits its generate/generate_batch).
    if getattr(cfg, "aewsegan", False):
        cls = AEWSEGAN
    elif cfg.wsegan:
        cls = WSEGAN
    else:
        cls = SEGAN
    segan = cls(cfg)
    segan.init_state(jax.random.PRNGKey(seed), batch_size=1)
    # seed the per-utterance z stream (each utterance gets a fresh z, matching the
    # reference's per-utterance in-forward randn, ref model.py:144-146)
    segan._gen_rng = jax.random.PRNGKey(seed)
    segan.g_load_pretrained(g_ckpt, True)
    return cfg, segan
