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
