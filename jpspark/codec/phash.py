"""64-bit DCT perceptual hash (SURVEY F14) — pure NumPy.

Classic pHash recipe: grayscale → 32x32 area-mean resize → 2-D DCT-II →
keep the top-left 8x8 low-frequency block → threshold against the median
(DC term excluded from the median) → 64-bit signature, bit 63 = [0,0].

Deterministic and self-consistent with the fixture generator: the `phash`
column of the images table equals phash64(decode(bytes, fmt)).
"""

from __future__ import annotations

import numpy as np

from .image import gray_f64, resize_area_mean

_N = 32


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT = _dct_matrix(_N)
# bit weights are shape-independent; building them per call cost more
# than the DCT itself on thumbnail-sized inputs (round 7)
_BIT_WEIGHTS = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)


def dct2(a: np.ndarray) -> np.ndarray:
    return _DCT @ a @ _DCT.T


def phash64(px: np.ndarray, gray: np.ndarray | None = None) -> np.int64:
    """HxWx3 uint8 -> int64 pHash. ``gray`` short-circuits the luma pass
    when the caller already holds gray_f64(px) (bit-identical: uint8
    inputs upcast exactly to float64 inside the luma multiply, so the
    former px.astype(float64) pre-pass changed nothing)."""
    g = gray_f64(px) if gray is None else gray
    small = resize_area_mean(g, _N, _N)
    coef = dct2(small)[:8, :8].ravel()
    med = np.median(coef[1:])
    bits = coef > med
    return np.int64(np.uint64(np.sum(_BIT_WEIGHTS[bits])))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 hash arrays."""
    x = (np.asarray(a, dtype=np.int64).astype(np.uint64)
         ^ np.asarray(b, dtype=np.int64).astype(np.uint64))
    # SWAR popcount
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
