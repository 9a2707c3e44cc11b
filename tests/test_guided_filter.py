"""Guided-filter smooth-local-affine post-process (ops/guided_filter.py):
the TPU-native restoration of the DPST lineage's optional CUDA
`smooth_local_affine` (He et al. guided filter formulation)."""
import numpy as np
import jax.numpy as jnp

from dpst_tpu import StylizeConfig, stylize
from dpst_tpu.ops.guided_filter import guided_filter, smooth_local_affine


def _photo(h=40, w=48):
    """Piecewise-smooth 'photo': two flat regions + a gradient."""
    x, y = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
    img = np.stack([x, y, 0.5 * (x + y)], -1).astype(np.float32)
    img[: h // 2, : w // 2] = [0.2, 0.6, 0.3]
    return img


def test_constant_signal_is_fixed_point(rng):
    guide = jnp.asarray(rng.uniform(size=(24, 24, 3)).astype(np.float32))
    p = jnp.full((24, 24, 3), 0.7, jnp.float32)
    q = np.asarray(guided_filter(guide, p, radius=2, eps=1e-4))
    np.testing.assert_allclose(q, 0.7, atol=1e-5)


def test_guide_itself_passes_through(rng):
    """p == guide is exactly representable by the affine model (a=I,
    b=0), so small eps leaves it ~unchanged."""
    guide = jnp.asarray(_photo())
    q = np.asarray(guided_filter(guide, guide, radius=2, eps=1e-6))
    np.testing.assert_allclose(q, np.asarray(guide), atol=5e-3)


def test_noise_is_suppressed_edges_kept(rng):
    """Noise orthogonal to the guide shrinks; guide edges survive."""
    guide = jnp.asarray(_photo())
    noise = rng.normal(0, 0.1, (40, 48, 3)).astype(np.float32)
    p = jnp.clip(guide + noise, 0, 1)
    q = np.asarray(guided_filter(guide, p, radius=3, eps=1e-3))
    resid_in = np.var(np.asarray(p) - np.asarray(guide))
    resid_out = np.var(q - np.asarray(guide))
    assert resid_out < 0.3 * resid_in, (resid_in, resid_out)
    # the region boundary (an edge in the guide) stays sharp
    jump = np.abs(q[10, 23] - q[10, 25]).max()
    assert jump > 0.05


def test_smooth_local_affine_range_and_shape(rng):
    content = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    stylized = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    out = np.asarray(smooth_local_affine(jnp.asarray(content),
                                         jnp.asarray(stylized)))
    assert out.shape == (32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert np.all(np.isfinite(out))


def test_stylize_post_smooth_end_to_end(rng):
    content = (_photo(32, 32) * 255).astype(np.float32)
    style = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    base_cfg = dict(use_segmentation=False, use_photorealism=False,
                    compute_dtype="float32", iterations=8)
    out_plain = stylize(content, style, StylizeConfig(**base_cfg))
    out_smooth = stylize(content, style,
                         StylizeConfig(post_smooth=2, **base_cfg))
    assert out_smooth.shape == out_plain.shape
    assert np.all(np.isfinite(out_smooth))
    assert out_smooth.min() >= 0.0 and out_smooth.max() <= 255.0
    assert not np.allclose(out_smooth, out_plain)
    # post-processed result hews closer to a local affine of the content:
    # high-frequency residual w.r.t. the guided-filtered self shrinks
    from dpst_tpu.ops.guided_filter import smooth_local_affine as sla
    import jax.numpy as jnp
    def roughness(img):
        ref = np.asarray(sla(jnp.asarray(content), jnp.asarray(img)))
        return np.mean((img - ref) ** 2)
    assert roughness(out_smooth) < roughness(out_plain) + 1e-6
