"""Image I/O and host-side preprocessing.

TPU-native equivalent of the reference's PIL load/save utilities
(SURVEY.md §2 comp.13): images travel to the device exactly once per run as
float32 [0,255] RGB arrays; everything downstream stays on-device.
"""
from __future__ import annotations

import numpy as np

try:
    from PIL import Image
    _HAS_PIL = True
except ImportError:  # pragma: no cover - PIL is baked into the env
    _HAS_PIL = False


def load_image(path_or_array, size: int | tuple[int, int] | None = None,
               ) -> np.ndarray:
    """Load an image as float32 RGB in [0, 255], shape (H, W, 3).

    Accepts a filesystem path or an already-loaded array (HWC uint8/float).
    `size` resizes: an int means "longest side == size, keep aspect, snap to
    multiples of 8" (friendly to VGG pooling + Pallas tiling); a tuple is an
    exact (H, W).
    """
    if isinstance(path_or_array, np.ndarray):
        arr = path_or_array
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        if arr.shape[-1] == 4:
            arr = arr[..., :3]
        arr = arr.astype(np.float32)
        if arr.max() <= 1.0 + 1e-6 and arr.min() >= 0.0:
            arr = arr * 255.0
        if size is not None:
            arr = _resize_np(arr, _target_hw(arr.shape[:2], size))
        return np.ascontiguousarray(arr, dtype=np.float32)

    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable; pass a numpy array instead")
    img = Image.open(path_or_array).convert("RGB")
    if size is not None:
        th, tw = _target_hw((img.height, img.width), size)
        img = img.resize((tw, th), Image.LANCZOS)
    return np.asarray(img, dtype=np.float32)


def save_image(array, path: str) -> None:
    """Save a float [0,255] HWC array as an image file."""
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable; cannot save images")
    Image.fromarray(to_uint8(array)).save(path)


def to_uint8(array) -> np.ndarray:
    # round, don't truncate: a bare uint8 cast would bias every saved
    # pixel by −0.5 on average
    return np.clip(np.rint(np.asarray(array)), 0.0, 255.0).astype(
        np.uint8)


def _target_hw(hw: tuple[int, int], size) -> tuple[int, int]:
    h, w = hw
    if isinstance(size, tuple):
        return int(size[0]), int(size[1])
    # longest side == size, snap both dims to multiples of 8
    scale = float(size) / float(max(h, w))
    th = max(8, int(round(h * scale / 8.0)) * 8)
    tw = max(8, int(round(w * scale / 8.0)) * 8)
    return th, tw


def _resize_np(arr: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """Lanczos resize for float arrays (host-side, used only at load time).

    Resizes each channel in PIL's float32 mode "F" — an array input must
    NOT be quantized to uint8 on the way through (the old uint8
    round-trip perturbed float pipelines even for a same-size "resize",
    which made `stylize(array)` and the batch path disagree at step 0).
    """
    if tuple(arr.shape[:2]) == tuple(hw):
        return arr.astype(np.float32)
    if _HAS_PIL:
        chans = [
            np.asarray(
                Image.fromarray(arr[..., c].astype(np.float32), mode="F")
                .resize((hw[1], hw[0]), Image.LANCZOS),
                dtype=np.float32)
            for c in range(arr.shape[-1])]
        return np.stack(chans, axis=-1)
    # crude fallback: nearest
    h, w = arr.shape[:2]
    ys = np.linspace(0, h - 1, hw[0]).round().astype(int)
    xs = np.linspace(0, w - 1, hw[1]).round().astype(int)
    return arr[ys][:, xs].astype(np.float32)
