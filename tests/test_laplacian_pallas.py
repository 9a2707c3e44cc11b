"""Pallas fused stencil matvec ≡ XLA implementation ≡ scipy oracle
(interpret mode on CPU; the compiled kernel is exercised on real TPU by
bench/verify runs — SURVEY.md §4 device tests)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dpst_tpu.ops import laplacian as lap
from dpst_tpu.ops import matting_oracle as oracle
from dpst_tpu.ops.laplacian_pallas import matvec_pallas, pack_stats

EPS = 1e-5


@pytest.mark.parametrize("hw", [(16, 20), (33, 47), (40, 130)])
def test_pallas_matches_xla(hw):
    r = np.random.default_rng(sum(hw))
    img = r.uniform(0.05, 0.95, hw + (3,)).astype(np.float32)
    stats = lap.precompute_stats(jnp.asarray(img), eps=EPS)
    v = jnp.asarray(r.normal(size=hw + (3,)).astype(np.float32))
    y_xla = np.asarray(lap.matvec_xla(stats, v))
    y_pl = np.asarray(matvec_pallas(stats, v))
    np.testing.assert_allclose(y_pl, y_xla, rtol=1e-4, atol=1e-4)


def test_pallas_matches_oracle():
    r = np.random.default_rng(3)
    img = r.uniform(0.05, 0.95, (16, 20, 3)).astype(np.float32)
    stats = lap.precompute_stats(jnp.asarray(img), eps=EPS)
    v = r.normal(size=(16, 20)).astype(np.float32)
    y_pl = np.asarray(matvec_pallas(stats, jnp.asarray(v)))
    y_ref = oracle.matvec_oracle(img, v, eps=EPS)
    np.testing.assert_allclose(y_pl, y_ref, rtol=1e-3, atol=1e-4)


def test_pallas_rows_sum_to_zero():
    r = np.random.default_rng(4)
    img = r.uniform(0.05, 0.95, (24, 24, 3)).astype(np.float32)
    stats = lap.precompute_stats(jnp.asarray(img), eps=EPS)
    y = np.asarray(matvec_pallas(stats, jnp.ones((24, 24))))
    np.testing.assert_allclose(y, np.zeros_like(y), atol=1e-4)


def test_pack_stats_layout():
    r = np.random.default_rng(5)
    img = r.uniform(0.05, 0.95, (8, 8, 3)).astype(np.float32)
    stats = lap.precompute_stats(jnp.asarray(img), eps=EPS)
    packed = np.asarray(pack_stats(stats))
    assert packed.shape == (14, 8, 8)
    np.testing.assert_allclose(packed[0], img[..., 0])
    np.testing.assert_allclose(packed[12], np.asarray(stats.valid))
    np.testing.assert_allclose(packed[13], np.asarray(stats.win_count))


def test_matvec_dispatch():
    """laplacian.matvec impl= routes to the right implementation."""
    r = np.random.default_rng(6)
    img = r.uniform(0.05, 0.95, (16, 16, 3)).astype(np.float32)
    stats = lap.precompute_stats(jnp.asarray(img), eps=EPS)
    v = jnp.asarray(r.normal(size=(16, 16)).astype(np.float32))
    y_xla = np.asarray(lap.matvec(stats, v, impl="xla"))
    y_pl = np.asarray(lap.matvec(stats, v, impl="pallas"))
    y_auto = np.asarray(lap.matvec(stats, v, impl="auto"))
    np.testing.assert_allclose(y_pl, y_xla, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y_auto, y_xla, rtol=1e-6)  # cpu → xla
    with pytest.raises(ValueError):
        lap.matvec(stats, v, impl="nope")
