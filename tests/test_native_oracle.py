"""Native (C++) matting-Laplacian oracle: equivalence with the scipy CSR
builder, and large-size cross-checks of the device implementations that
the python oracle is too slow to reach (SURVEY.md §2 "Native components":
the reference's one native dependency was scipy.sparse; this is its
host-side counterpart here)."""
import os
import subprocess

import numpy as np
import pytest

from dpst_tpu.ops import matting_oracle as mo

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def ensure_built():
    if not mo.native_available():
        res = subprocess.run(
            [os.path.join(REPO, "tools", "build_native.sh")],
            capture_output=True, text=True)
        if res.returncode != 0:
            pytest.skip(f"native build failed: {res.stderr[-500:]}")
    assert mo.native_available()


def test_native_matches_scipy_csr():
    r = np.random.default_rng(0)
    img = r.uniform(0.05, 0.95, (20, 24, 3))
    v = r.normal(size=(20, 24, 3))
    y_csr = mo.matvec_oracle(img, v, eps=1e-5)
    y_cpp = mo.matvec_native(img, v, eps=1e-5)
    np.testing.assert_allclose(y_cpp, y_csr, rtol=1e-10, atol=1e-12)


def test_native_properties_128():
    """Row sums zero + PSD at a size the scipy builder can't reach."""
    r = np.random.default_rng(1)
    img = r.uniform(0.05, 0.95, (128, 128, 3))
    ones = np.ones((128, 128))
    np.testing.assert_allclose(mo.matvec_native(img, ones),
                               np.zeros((128, 128)), atol=1e-10)
    for _ in range(3):
        v = r.normal(size=(128, 128))
        assert float(np.sum(v * mo.matvec_native(img, v))) >= -1e-9


def test_device_impls_match_native_at_128():
    """XLA and Pallas matvecs vs the independent double-precision C++
    implementation at 128² (beyond the scipy oracle's practical range)."""
    import jax.numpy as jnp
    from dpst_tpu.ops import laplacian as lap
    from dpst_tpu.ops.laplacian_pallas import matvec_pallas

    r = np.random.default_rng(2)
    img = r.uniform(0.05, 0.95, (128, 128, 3)).astype(np.float32)
    v = r.normal(size=(128, 128, 3)).astype(np.float32)
    y_ref = mo.matvec_native(img.astype(np.float64), v, eps=1e-5)
    stats = lap.precompute_stats(jnp.asarray(img), eps=1e-5)
    y_xla = np.asarray(lap.matvec_xla(stats, jnp.asarray(v)))
    y_pl = np.asarray(matvec_pallas(stats, jnp.asarray(v)))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_xla, y_ref, rtol=2e-3,
                               atol=2e-4 * scale)
    np.testing.assert_allclose(y_pl, y_ref, rtol=2e-3,
                               atol=2e-4 * scale)
