"""Matting-Laplacian operator: matrix-free matvec ≡ scipy CSR oracle,
plus the Levin-matrix property tests (SURVEY.md §4: row sums zero, PSD,
linearity) and the custom_vjp gradient identity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpst_tpu.ops import laplacian as lap
from dpst_tpu.ops import matting_oracle as oracle

EPS = 1e-5


@pytest.fixture(scope="module")
def img01(rng=None):
    r = np.random.default_rng(7)
    return r.uniform(0.05, 0.95, (16, 20, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def stats(img01):
    return lap.precompute_stats(jnp.asarray(img01), eps=EPS)


def test_matvec_matches_oracle(img01, stats):
    r = np.random.default_rng(8)
    v = r.normal(size=(16, 20)).astype(np.float32)
    ours = np.asarray(lap.matvec_xla(stats, jnp.asarray(v)))
    ref = oracle.matvec_oracle(img01, v, eps=EPS)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_matvec_multichannel_matches_oracle(img01, stats):
    r = np.random.default_rng(9)
    v = r.normal(size=(16, 20, 3)).astype(np.float32)
    ours = np.asarray(lap.matvec_xla(stats, jnp.asarray(v)))
    ref = oracle.matvec_oracle(img01, v, eps=EPS)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_rows_sum_to_zero(stats):
    """L·1 = 0 — the matting Laplacian annihilates constants."""
    ones = jnp.ones((16, 20))
    y = np.asarray(lap.matvec_xla(stats, ones))
    np.testing.assert_allclose(y, np.zeros_like(y), atol=1e-4)


def test_psd(stats):
    r = np.random.default_rng(10)
    for _ in range(5):
        v = jnp.asarray(r.normal(size=(16, 20)).astype(np.float32))
        quad = float(jnp.sum(v * lap.matvec_xla(stats, v)))
        assert quad >= -1e-4, quad


def test_symmetry(stats):
    r = np.random.default_rng(11)
    u = jnp.asarray(r.normal(size=(16, 20)).astype(np.float32))
    v = jnp.asarray(r.normal(size=(16, 20)).astype(np.float32))
    a = float(jnp.sum(u * lap.matvec_xla(stats, v)))
    b = float(jnp.sum(v * lap.matvec_xla(stats, u)))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_linearity(stats):
    r = np.random.default_rng(12)
    u = jnp.asarray(r.normal(size=(16, 20)).astype(np.float32))
    v = jnp.asarray(r.normal(size=(16, 20)).astype(np.float32))
    lhs = np.asarray(lap.matvec_xla(stats, 2.0 * u + 3.0 * v))
    rhs = np.asarray(2.0 * lap.matvec_xla(stats, u)
                     + 3.0 * lap.matvec_xla(stats, v))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3, atol=1e-5)


def test_photoreal_loss_value(img01, stats):
    r = np.random.default_rng(13)
    img255 = r.uniform(0, 255, (16, 20, 3)).astype(np.float32)
    loss = float(lap.photoreal_loss(stats, jnp.asarray(img255), impl="xla"))
    v = img255 / 255.0
    ref_y = oracle.matvec_oracle(img01, v, eps=EPS)
    expected = float(np.sum(v * ref_y))
    np.testing.assert_allclose(loss, expected, rtol=1e-3)


def test_photoreal_gradient_identity(img01, stats):
    """∂(vᵀLv)/∂img = 2·L·v / 255 — the custom_vjp analytic gradient."""
    r = np.random.default_rng(14)
    img255 = jnp.asarray(
        r.uniform(0, 255, (16, 20, 3)).astype(np.float32))
    grad = jax.grad(
        lambda im: lap.photoreal_loss(stats, im, impl="xla"))(img255)
    v = np.asarray(img255) / 255.0
    expected = 2.0 / 255.0 * oracle.matvec_oracle(img01, v, eps=EPS)
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=1e-3,
                               atol=1e-5)


def test_photoreal_gradient_vs_finite_difference(stats):
    """Spot-check the analytic gradient numerically at a few pixels."""
    r = np.random.default_rng(15)
    img255 = r.uniform(50, 200, (16, 20, 3)).astype(np.float32)
    f = lambda im: float(
        lap.photoreal_loss(stats, jnp.asarray(im), impl="xla"))
    grad = np.asarray(jax.grad(
        lambda im: lap.photoreal_loss(stats, im, impl="xla"))(
            jnp.asarray(img255)))
    h = 0.5
    for (i, j, c) in [(5, 5, 0), (8, 12, 1), (3, 17, 2)]:
        up = img255.copy(); up[i, j, c] += h
        dn = img255.copy(); dn[i, j, c] -= h
        fd = (f(up) - f(dn)) / (2 * h)
        np.testing.assert_allclose(grad[i, j, c], fd, rtol=5e-2, atol=1e-5)


def test_oracle_properties(img01):
    """Sanity on the oracle itself: symmetric, PSD, zero row sums."""
    L = oracle.build_laplacian_csr(img01, eps=EPS)
    d = (L - L.T)
    assert abs(d).max() < 1e-10
    rs = np.asarray(L.sum(axis=1)).ravel()
    np.testing.assert_allclose(rs, np.zeros_like(rs), atol=1e-10)
    r = np.random.default_rng(16)
    for _ in range(3):
        v = r.normal(size=L.shape[0])
        assert v @ (L @ v) >= -1e-8
