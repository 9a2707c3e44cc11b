"""dpst_tpu — TPU-native automated deep photo style transfer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
aRI0U/automated-deep-photo-style-transfer (see SURVEY.md): content/style
photo in, photorealistic stylized photo out, with automatic semantic
segmentation masks, a matrix-free Pallas matting-Laplacian photorealism
term, NIMA-based style-weight auto-tuning, and the full optimization loop
running device-side.

Public surface:
    stylize(content, style, config=StylizeConfig(...)) -> np.ndarray
    StylizeConfig — all knobs (mirrors the reference CLI flag semantics)
    PRESETS — BASELINE.json configs 1-5
"""
from .api import prepare_constants, stylize
from .config import PRESETS, StylizeConfig


def autotune(*args, **kwargs):
    """NIMA-guided style-weight search — see dpst_tpu.autotune.autotune."""
    from .autotune import autotune as _autotune
    return _autotune(*args, **kwargs)


def stylize_batch(*args, **kwargs):
    """Sharded multi-pair stylization — see dpst_tpu.parallel.batch."""
    from .parallel.batch import stylize_batch as _stylize_batch
    return _stylize_batch(*args, **kwargs)


__all__ = ["stylize", "prepare_constants", "StylizeConfig", "PRESETS",
           "autotune", "stylize_batch"]
__version__ = "0.1.0"
