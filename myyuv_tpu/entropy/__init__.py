"""Entropy-coding stage: dispatch between native (C++), vectorized, and
per-block oracle implementations.

All implementations speak the same interface over a plane's blocks:

  encode_blocks(coeffs int16 [N, 64|8x8]) -> (chunk_sizes u8[N], content u8[*])
  decode_blocks(chunk_sizes, content)     -> coeffs int16 [N, 64]

and produce/consume reference-compatible per-block Huffman chunks
(SURVEY.md §7; myyuv_lib/myyuv_DCT/Huffman.cpp semantics).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .. import native
from . import reference


def encode_blocks_py(coeffs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-block Python oracle encoder (slow; validation fallback)."""
    coeffs = np.asarray(coeffs).reshape(-1, 64)
    chunks = [reference.encode_block(coeffs[k]) for k in range(coeffs.shape[0])]
    sizes = np.array([len(c) for c in chunks], np.uint8)
    return sizes, np.frombuffer(b"".join(chunks), np.uint8)


def decode_blocks_py(sizes: np.ndarray, content: np.ndarray) -> np.ndarray:
    """Per-block Python oracle decoder (slow; validation fallback)."""
    pos = np.zeros(sizes.size + 1, np.int64)
    np.cumsum(sizes, out=pos[1:])
    raw = content.tobytes()
    return np.stack([reference.decode_block(raw[pos[k]: pos[k + 1]])
                     for k in range(sizes.size)])


def encode_blocks(coeffs: np.ndarray,
                  backend: Optional[str] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Encode quantized blocks into the ragged chunk stream."""
    if backend in (None, "native") and native.available():
        return native.encode_blocks(coeffs)
    if backend == "native":
        raise RuntimeError("native entropy backend unavailable")
    return encode_blocks_py(coeffs)


def decode_blocks(sizes: np.ndarray, content: np.ndarray,
                  backend: Optional[str] = None) -> np.ndarray:
    """Decode the ragged chunk stream into quantized blocks [N, 64]."""
    if backend in (None, "native") and native.available():
        return native.decode_blocks(sizes, content)
    if backend == "native":
        raise RuntimeError("native entropy backend unavailable")
    return decode_blocks_py(sizes, content)
