"""Scaling-tail autopsy + ICI projection (VERDICT r3 #5).

The sharded codec is collective-free, so real-pod efficiency is bounded
by PER-CHIP IMBALANCE: the slowest slab's kernels gate the step. This
measures that directly ON THE REAL CHIP: each of the 8 contiguous 4K
block-row slabs (exactly the slabs compress_frame_sharded assigns to an
8-device mesh) is compressed+decompressed alone and its DEVICE time
read from an xplane trace (wall-timing sub-ms executables through the
tunnel is floored by per-execute issue overhead — measured: half-slabs
"cost" more than full slabs); the projected ICI efficiency is mean/max
slab device time.

Also measures the INTERLEAVED assignment (device d takes every 8th
block row) as the candidate mitigation — content statistics even out
across devices, at the price of a host-side row permutation of the
assembled stream (byte order per block unchanged; chunk concatenation
order is a static permutation).

The CPU-mesh strong-scaling loss, by contrast, is host-core contention:
tools/scaling_sweep.py's 4-on-4-cores points measure the box, not the
graph. Output: one JSON line for PERF_NOTES/SCALING analysis.

Usage: python tools/exp_r4scale.py [n_dev]
"""

import functools
import glob
import importlib.util
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.engine import batch as eb  # noqa: E402
from myyuv_tpu.engine import device_stream as ds  # noqa: E402
from myyuv_tpu.engine import sharded_stream as ss  # noqa: E402

NDEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def sync(x):
    np.asarray(x.ravel()[:1])


_SYNC = [0.0]


def _xplane_dump():
    spec = importlib.util.spec_from_file_location(
        "xplane_dump", str(REPO / "tools" / "xplane_dump.py"))
    xd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(xd)
    return xd


XD = None


def device_time(fn, reps=20):
    """Per-rep DEVICE time of fn's executables via an xplane trace."""
    import jax
    out = fn()
    sync(out)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                out = fn()
            sync(out)
        pb = sorted(glob.glob(td + "/plugins/profile/*/*.xplane.pb"))[-1]
        buf = open(pb, "rb").read()
    total = 0.0
    for fno, _, v in XD.fields(buf):
        if fno != 1:
            continue
        name, meta, agg, _ = XD.parse_plane(v)
        if "TPU" not in name:
            continue
        for (lname, mid), ms in agg.items():
            if lname == "XLA Modules" and "slab_" in meta.get(mid, ""):
                total += ms
    return total / reps / 1e3  # seconds per rep


def main():
    import bench

    global XD
    XD = _xplane_dump()
    print("devices:", jax.devices(), flush=True)
    x = jnp.zeros((8, 128), jnp.int32) + 1
    sync(x)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(x)
    _SYNC[0] = (time.perf_counter() - t0) / 5

    planes = bench.get_4k_planes()
    y, u, v = planes
    hy, wy = y.shape
    hc, wc = u.shape
    qts = eb.plane_qtables([50] * 3)

    _, hy_loc = ss._slab_geometry(hy, wy, NDEV)
    _, hc_loc = ss._slab_geometry(hc, wc, NDEV)
    yp = ss._pad_rows(y, 8 * NDEV)
    up = ss._pad_rows(u, 8 * NDEV)
    vp = ss._pad_rows(v, 8 * NDEV)

    # the slab geometry is not a legal standalone frame (chroma rows pad
    # independently), so time the SHARDED per-device bodies directly —
    # exactly the graphs a mesh device runs
    @jax.jit
    def slab_c(y, u, v, qy, qu, qv):
        return ss._compress_planes_body(y, u, v, qy, qu, qv, "exact", 8)

    @functools.partial(jax.jit, static_argnames=())
    def slab_d(A, C, sizes, qy, qu, qv):
        return ss._decompress_planes_body(
            A, C, sizes, qy, qu, qv, hy_loc, wy, hc_loc, wc, "exact")

    def slab_rt(yd, ud, vd):
        A, C, sizes, ok = slab_c(yd, ud, vd, *qts)
        ry, ru, rv, dok = slab_d(A, C, sizes, *qts)
        return ry

    def measure(tag, slabs):
        times = []
        for d, (yd, ud, vd) in enumerate(slabs):
            # upload ONCE: a per-rep h2d of the 2.3 MB slab costs ~50 ms
            # through the tunnel and swamps the ~1 ms kernel time
            yd, ud, vd = (jnp.asarray(yd), jnp.asarray(ud),
                          jnp.asarray(vd))
            sync(yd)
            dt = device_time(
                lambda yd=yd, ud=ud, vd=vd: slab_rt(yd, ud, vd))
            times.append(dt)
            print(f"{tag} slab {d}: {dt*1e3:7.3f} ms", flush=True)
        tmax, tmean = max(times), sum(times) / len(times)
        eff = tmean / tmax
        print(f"{tag}: max {tmax*1e3:.3f} mean {tmean*1e3:.3f} "
              f"-> projected collective-free efficiency {eff:.3f}",
              flush=True)
        return times, eff

    # contiguous slabs (the production sharded assignment)
    cont_slabs = [(yp[d * hy_loc:(d + 1) * hy_loc],
                   up[d * hc_loc:(d + 1) * hc_loc],
                   vp[d * hc_loc:(d + 1) * hc_loc]) for d in range(NDEV)]
    t_cont, eff_cont = measure("contiguous", cont_slabs)

    # interleaved block rows (mitigation candidate)
    def interleave(p, loc):
        rows = p.reshape(-1, 8, p.shape[1])
        return [np.ascontiguousarray(
            rows[d::NDEV].reshape(loc, p.shape[1])) for d in range(NDEV)]

    iy = interleave(yp, hy_loc)
    iu = interleave(up, hc_loc)
    iv = interleave(vp, hc_loc)
    t_int, eff_int = measure(
        "interleaved", list(zip(iy, iu, iv)))

    out = {
        "metric": "slab_imbalance_real_chip", "n_dev": NDEV,
        "timing": "device (xplane), per-slab-alone",
        "contiguous_ms": [round(t * 1e3, 3) for t in t_cont],
        "contiguous_projected_eff": round(eff_cont, 4),
        "interleaved_ms": [round(t * 1e3, 3) for t in t_int],
        "interleaved_projected_eff": round(eff_int, 4)}

    # projections at NDEV//2 from the same measurement: contiguous
    # pairing (d gets half-slabs 2d, 2d+1 — the production assignment)
    # vs mirrored pairing (d gets d and N-1-d — balances monotone
    # content gradients while keeping each half-slab contiguous)
    if NDEV % 2 == 0:
        half = NDEV // 2
        cp = [t_cont[2 * d] + t_cont[2 * d + 1] for d in range(half)]
        mp = [t_cont[d] + t_cont[NDEV - 1 - d] for d in range(half)]
        out["pair_contiguous_eff"] = round(
            (sum(cp) / half) / max(cp), 4)
        out["pair_mirrored_eff"] = round((sum(mp) / half) / max(mp), 4)
        print(f"pairing @{half} dev: contiguous "
              f"{out['pair_contiguous_eff']:.3f} vs mirrored "
              f"{out['pair_mirrored_eff']:.3f}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
