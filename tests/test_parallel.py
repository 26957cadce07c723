"""Multi-device tests (8 virtual CPU devices): sharded chunk-parallel inference and
overlap-add reconstruction."""
import numpy as np
import pytest

import jax

from segan_pytorch_tpu.utils.config import SEGANConfig
from segan_pytorch_tpu.models import SEGAN
from segan_pytorch_tpu.parallel import (

    make_mesh,
    enhance_sharded,
    chunk_grid,
    overlap_add,
)

pytestmark = pytest.mark.quick


def small_segan(tmpdir, dp=1):
    cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16], genc_poolings=[4, 4],
                      z_dim=16, denc_fmaps=[8, 16], denc_poolings=[4, 4],
                      dpool_slen=64, batch_size=2, dp=dp, save_path=str(tmpdir))
    s = SEGAN(cfg)
    s.init_state(jax.random.PRNGKey(3), batch_size=2)
    return s


class TestChunkGrid:
    def test_grid_no_overlap(self):
        wav = np.arange(2500, dtype=np.float32)
        grid, hop, n = chunk_grid(wav, 1024, 0.0)
        assert (hop, n) == (1024, 3)
        assert grid.shape == (3, 1024, 1)
        np.testing.assert_array_equal(grid[0, :, 0], wav[:1024])
        assert np.all(grid[2, 452:, 0] == 0)  # zero tail pad

    def test_overlap_add_identity(self):
        """Enhancing with identity chunks + overlap-add must reconstruct the input."""
        wav = np.random.RandomState(0).randn(5000).astype(np.float32)
        grid, hop, n = chunk_grid(wav, 1024, 0.5)
        rec = overlap_add(grid, hop, wav.shape[0])
        np.testing.assert_allclose(rec, wav, atol=1e-4)


class TestTensorParallelHead:
    """mp>1: (data, model) mesh with the D head FC Megatron-sharded
    (column-parallel fc_0, row-parallel fc_2 — XLA inserts the 'model' psum).
    Training math must equal the single-device step."""

    def _run(self, tmpdir, dp, mp, steps=3):
        cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32],
                          genc_poolings=[4, 4, 4], z_dim=32,
                          denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                          dpool_slen=16, batch_size=8, dp=dp, mp=mp,
                          save_path=str(tmpdir))
        s = SEGAN(cfg)
        s.init_state(jax.random.PRNGKey(0), batch_size=8)
        s.prepare_train(8)
        rng = np.random.RandomState(7)
        metrics = []
        for i in range(steps):
            clean = rng.randn(8, 1024, 1).astype(np.float32) * 0.1
            noisy = clean + rng.randn(8, 1024, 1).astype(np.float32) * 0.05
            m, _, _ = s.train_step(clean, noisy, np.ones((8,), np.float32),
                                   jax.random.PRNGKey(i), 100.0)
            metrics.append({k: float(v) for k, v in m.items()})
        return metrics, s

    def test_dp4_mp2_matches_single_device(self, tmp_path):
        base, _ = self._run(tmp_path / "base", 1, 1)
        tp, s = self._run(tmp_path / "tp", 4, 2)
        from jax.sharding import PartitionSpec as P

        w0 = s.state.d_params["fc_0"]["weight"]
        assert w0.sharding.spec == P(None, "model")
        assert s.state.d_params["fc_2"]["weight"].sharding.spec == P("model")
        # optimizer moments follow the param sharding (same path/shape rules)
        flat = jax.tree_util.tree_leaves_with_path(s.state.d_opt)
        tp_moments = [x for p, x in flat
                      if "'fc_0'" in jax.tree_util.keystr(p)
                      and getattr(x, "ndim", 0) == 2]
        assert tp_moments and all(
            m.sharding.spec == P(None, "model") for m in tp_moments)
        for b, t in zip(base, tp):
            for key in b:
                assert abs(b[key] - t[key]) <= 2e-3 * (abs(b[key]) + 1e-3), \
                    (key, b[key], t[key])

    def test_mp_only_mesh(self, tmp_path):
        """mp without dp: an 8-way pure model mesh still trains (batch
        replicated over 'model', head sharded)."""
        tp, s = self._run(tmp_path, 1, 8, steps=1)
        assert s.mesh.shape == {"data": 1, "model": 8}
        assert all(np.isfinite(v) for v in tp[0].values())

    def test_tp_checkpoint_roundtrip(self, tmp_path):
        """Sharded params fetch and save like replicated ones (fully
        addressable single-controller), and a fresh engine resumes them."""
        from segan_pytorch_tpu.utils.checkpoint import Saver

        _, s = self._run(tmp_path / "a", 2, 2, steps=1)
        gs = Saver(str(tmp_path / "a"), prefix="EOE_G-")
        ds = Saver(str(tmp_path / "a"), prefix="EOE_D-")
        s.save(gs, ds, 1)
        w_before = np.asarray(s.state.d_params["fc_0"]["weight"])

        cfg2 = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32],
                           genc_poolings=[4, 4, 4], z_dim=32,
                           denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                           dpool_slen=16, batch_size=8, dp=1, mp=1,
                           save_path=str(tmp_path / "a"))
        s2 = SEGAN(cfg2)
        s2.init_state(jax.random.PRNGKey(9), batch_size=8)
        assert s2.resume(str(tmp_path / "a")) == 1
        np.testing.assert_array_equal(
            np.asarray(s2.state.d_params["fc_0"]["weight"]), w_before)

    def test_mp_indivisible_raises(self, tmp_path):
        with pytest.raises(ValueError):
            self._run(tmp_path, 1, 3, steps=0)  # 8 devices % 3 != 0

    def test_make_mesh_misuse_rejected(self):
        # legacy positional axis_names must not be silently read as mp
        with pytest.raises(TypeError):
            make_mesh(4, ("data",))
        with pytest.raises(ValueError):
            make_mesh(2, 2, axis_names=("batch",))

    def test_wsegan_snorm_head_under_tp(self, tmp_path):
        """WSEGAN's spectral-norm D head (power-iteration u/v vars replicated,
        kernel sharded) trains under the 2-D mesh."""
        from segan_pytorch_tpu.models.wsegan import WSEGAN

        cfg = SEGANConfig(slice_size=1024, genc_fmaps=[8, 16, 32],
                          genc_poolings=[4, 4, 4], z_dim=32,
                          denc_fmaps=[8, 16, 32], denc_poolings=[4, 4, 4],
                          dpool_slen=16, batch_size=8, dp=4, mp=2, wsegan=True,
                          gnorm_type="snorm", dnorm_type="snorm", opt="adam",
                          misalign_pair=True, save_path=str(tmp_path))
        w = WSEGAN(cfg)
        w.init_state(jax.random.PRNGKey(1), batch_size=8)
        w.prepare_train(8)
        rng = np.random.RandomState(3)
        clean = rng.randn(8, 1024, 1).astype(np.float32) * 0.1
        noisy = clean + rng.randn(8, 1024, 1).astype(np.float32) * 0.05
        out = w.train_step(clean, noisy, np.ones((8,), np.float32),
                           np.zeros((8,), np.float32), jax.random.PRNGKey(2),
                           100.0)
        metrics = out[0]
        assert all(np.isfinite(float(v)) for v in metrics.values())


class TestShardedInference:
    def test_sharded_matches_single_device(self, tmp_path):
        s = small_segan(tmp_path)
        wav = np.random.RandomState(1).randn(9000).astype(np.float32) * 0.1
        # single device result through the same path
        single = enhance_sharded(s, wav, mesh=None)
        mesh = make_mesh(8)
        sharded = enhance_sharded(s, wav, mesh=mesh)
        assert sharded.shape == (9000,)
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_sharded_with_overlap(self, tmp_path):
        s = small_segan(tmp_path)
        wav = np.random.RandomState(2).randn(6000).astype(np.float32) * 0.1
        mesh = make_mesh(8)
        out = enhance_sharded(s, wav, mesh=mesh, overlap=0.5)
        assert out.shape == (6000,)
        assert np.all(np.isfinite(out))
