"""Dense/CSR matting-Laplacian oracle (numpy/scipy, host-side, test-only).

Direct implementation of Levin's closed-form matting Laplacian exactly as
the reference builds it on CPU (SURVEY.md §2 comp.6): assemble the sparse
N×N matrix entry by entry. Used ONLY to validate the matrix-free TPU
operator in `laplacian.py` / `laplacian_pallas.py` — never on the hot path.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

WIN_RAD = 1
WIN = (2 * WIN_RAD + 1) ** 2  # 9


def build_laplacian_csr(image01: np.ndarray, eps: float = 1e-5
                        ) -> sp.csr_matrix:
    """L as an (H·W)×(H·W) CSR matrix from an (H, W, 3) image in [0, 1].

    Interior 3×3 windows only; per window k:
      W_k[i,j] = δ_ij − (1/9)·(1 + (I_i−μ_k)ᵀ (Σ_k + ε/9·Id)⁻¹ (I_j−μ_k)).
    """
    img = np.asarray(image01, dtype=np.float64)
    h, w, c = img.shape
    assert c == 3
    n = h * w
    idx = np.arange(n).reshape(h, w)

    rows, cols, vals = [], [], []
    eye = np.eye(3)
    for cy in range(WIN_RAD, h - WIN_RAD):
        for cx in range(WIN_RAD, w - WIN_RAD):
            win_idx = idx[cy - WIN_RAD:cy + WIN_RAD + 1,
                          cx - WIN_RAD:cx + WIN_RAD + 1].ravel()
            win_i = img[cy - WIN_RAD:cy + WIN_RAD + 1,
                        cx - WIN_RAD:cx + WIN_RAD + 1].reshape(WIN, 3)
            mu = win_i.mean(axis=0)
            cov = (win_i.T @ win_i) / WIN - np.outer(mu, mu)
            lam = np.linalg.inv(cov + (eps / WIN) * eye)
            d = win_i - mu  # (9, 3)
            wk = np.eye(WIN) - (1.0 / WIN) * (1.0 + d @ lam @ d.T)
            rows.append(np.repeat(win_idx, WIN))
            cols.append(np.tile(win_idx, WIN))
            vals.append(wk.ravel())

    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    lap = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    return lap


def matvec_oracle(image01: np.ndarray, v: np.ndarray,
                  eps: float = 1e-5) -> np.ndarray:
    """y = L·v via the CSR oracle. v: (H, W) or (H, W, C)."""
    h, w = image01.shape[:2]
    lap = build_laplacian_csr(image01, eps)
    if v.ndim == 2:
        return (lap @ v.reshape(-1)).reshape(h, w)
    c = v.shape[-1]
    out = np.stack(
        [(lap @ v[..., i].reshape(-1)).reshape(h, w) for i in range(c)],
        axis=-1)
    return out


# ---------------------------------------------------------------------------
# Native (C++) oracle — independent double-precision implementation
# (native/matting_oracle.cpp, ctypes-loaded). The reference leaned on
# scipy.sparse's C internals for this operator; this is the equivalent
# native host path, fast enough to cross-check the TPU kernels at sizes
# where the python CSR builder above takes minutes.
# ---------------------------------------------------------------------------
import ctypes
import os

_NATIVE_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "build",
    "libmatting_oracle.so")
_native_lib = None


def native_available() -> bool:
    return os.path.exists(_NATIVE_PATH)


def _load_native():
    global _native_lib
    if _native_lib is None:
        lib = ctypes.CDLL(_NATIVE_PATH)
        lib.matting_matvec.restype = ctypes.c_int
        lib.matting_matvec.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double,
        ]
        _native_lib = lib
    return _native_lib


def matvec_native(image01: np.ndarray, v: np.ndarray,
                  eps: float = 1e-5) -> np.ndarray:
    """y = L·v via the C++ oracle (double precision, matrix-free).

    Build once with tools/build_native.sh; `native_available()` gates
    callers (tests fall back to the scipy path when absent)."""
    lib = _load_native()
    squeeze = v.ndim == 2
    if squeeze:
        v = v[..., None]
    h, w, c = v.shape
    img = np.ascontiguousarray(image01, np.float64)
    vv = np.ascontiguousarray(v, np.float64)
    out = np.empty_like(vv)
    ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rc = lib.matting_matvec(ptr(img), ptr(vv), ptr(out), h, w, c,
                            float(eps))
    if rc != 0:
        raise RuntimeError(f"matting_matvec failed with code {rc}")
    return out[..., 0] if squeeze else out
