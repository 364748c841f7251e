"""Quality sweeps and rate-distortion statistics.

The batch-analytics driver of the engine (BASELINE.json config: "4K frame
stream with quality sweep q in {10,30,50,70,90}, per-quality RD curve"):
for each quality, run the device roundtrip step, reduce distortion and the
global symbol histogram (collectives under pjit), and measure the actual
entropy-coded size via the configured entropy backend.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from .. import entropy
from . import batch as eb


def quality_sweep(planes: Sequence[np.ndarray],
                  qualities: Sequence[int] = (10, 30, 50, 70, 90),
                  entropy_backend: Optional[str] = None,
                  precision: str = "exact") -> List[Dict]:
    """Per-quality RD point for one frame's (y, u, v) planes.

    Returns a list of dicts: quality, psnr_y/u/v (dB), compressed_bytes,
    bits_per_pixel, entropy_bits_per_symbol (Shannon bound from the global
    histogram — how close the per-block Huffman gets to optimal).
    """
    y, u, v = [jnp.asarray(p) for p in planes]
    out = []
    npix = planes[0].size + planes[1].size + planes[2].size
    for q in qualities:
        qt_y, qt_u, qt_v = eb.plane_qtables([q, q, q])
        (ry, ru, rv), m = eb.roundtrip_step_jit(y, u, v, qt_y, qt_u, qt_v,
                                                precision=precision)
        cy, cu, cv = eb.encode_planes(y, u, v, qt_y, qt_u, qt_v, precision)
        comp_bytes = 0
        for c in (cy, cu, cv):
            sizes, content = entropy.encode_blocks(
                np.asarray(c).reshape(-1, 64), backend=entropy_backend)
            comp_bytes += int(content.size) + int(sizes.size) + 8
        comp_bytes += 12

        def psnr(sse, n):
            mse = float(sse) / n
            return float(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))

        out.append({
            "quality": int(q),
            "psnr_y_db": round(psnr(m["sse_y"], planes[0].size), 3),
            "psnr_u_db": round(psnr(m["sse_u"], planes[1].size), 3),
            "psnr_v_db": round(psnr(m["sse_v"], planes[2].size), 3),
            "compressed_bytes": comp_bytes,
            "bits_per_pixel": round(8 * comp_bytes / npix, 4),
            "entropy_bits_per_symbol": round(
                float(m["entropy_bits_per_symbol"]), 4),
        })
    return out
