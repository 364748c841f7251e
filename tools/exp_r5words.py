"""Round-5: word-contract roundtrip on the real chip (VERDICT r4 #5).

Verifies the word-contract codec (engine/word_frame) against the
plane-contract path on the golden 4K frame — byte-identical interchange,
pixel-identical reconstruction — then times it: wall slope fps, xplane
device ms, and the scan-batched variant.

Usage: python tools/exp_r5words.py [stage]
  stage: verify | time | scan | all (default: all)
Writes .r5words.json fragments per stage (merged by hand into notes).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from myyuv_tpu.engine import batch as eb  # noqa: E402
from myyuv_tpu.engine import device_stream as ds  # noqa: E402
from myyuv_tpu.engine import word_frame as wf  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".r5words.json")


def _save(frag):
    data = {}
    if os.path.exists(OUT):
        data = json.load(open(OUT))
    data.update(frag)
    json.dump(data, open(OUT, "w"), indent=1)
    print(json.dumps(frag))


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    assert jax.devices()[0].platform != "cpu"
    planes_np = bench.get_4k_planes()
    h, w = planes_np[0].shape
    qts = eb.plane_qtables([50] * 3)
    dev = [jnp.asarray(p) for p in planes_np]
    xw = wf.pack_frame(*dev)
    bench._sync(xw)

    if stage in ("verify", "all"):
        # interchange byte-equality vs the plane contract
        A, C, sizes, total, ok = wf.compress_words(xw, *qts, h=h, w=w)
        cA, cC, csizes, ctotal, cok = ds.compress_frame(*dev, *qts)
        same = (bool(ok) and bool(cok)
                and int(total) == int(ctotal)
                and np.array_equal(np.asarray(sizes), np.asarray(csizes))
                and np.array_equal(np.asarray(A), np.asarray(cA))
                and np.array_equal(np.asarray(C), np.asarray(cC)))
        # roundtrip pixel-equality vs the plane contract
        rxw, rtot, rok = wf.roundtrip_words(xw, *qts, h=h, w=w)
        ry, ru, rv = wf.unpack_frame(rxw, h, w)
        py, pu, pv, pok = ds.decompress_frame(cA, cC, csizes, *qts,
                                              h=h, w=w)
        px_same = (bool(rok) and bool(pok)
                   and np.array_equal(np.asarray(ry), np.asarray(py))
                   and np.array_equal(np.asarray(ru), np.asarray(pu))
                   and np.array_equal(np.asarray(rv), np.asarray(pv)))
        _save({"interchange_identical": same,
               "roundtrip_pixels_identical": px_same,
               "total_bytes": int(total)})

    if stage in ("time", "all"):
        rxw, _, _ = wf.roundtrip_words(xw, *qts, h=h, w=w)
        bench._sync(rxw)
        wall = bench._time(
            lambda: wf.roundtrip_words(xw, *qts, h=h, w=w)[0])
        devms = bench._device_time(
            lambda: wf.roundtrip_words(xw, *qts, h=h, w=w)[0], reps=10)
        _save({"word_roundtrip_wall_ms": round(wall * 1e3, 3),
               "word_roundtrip_fps": round(1 / wall, 1),
               "word_roundtrip_device_ms": round(devms * 1e3, 3)})

    if stage in ("scan", "all"):
        k = 8
        xws = jnp.broadcast_to(xw, (k,) + xw.shape)
        totals, oks = wf.roundtrip_words_scan(xws, *qts, h=h, w=w)
        np.asarray(oks)
        n_calls = 8
        outs = []
        t0 = time.perf_counter()
        for _ in range(n_calls):
            totals, oks = wf.roundtrip_words_scan(xws, *qts, h=h, w=w)
            outs.append(oks)
        for o in outs:
            o.copy_to_host_async()
        okall = all(bool(np.asarray(o).all()) for o in outs)
        dt = time.perf_counter() - t0
        _save({"word_scan_fps": round(n_calls * k / dt, 1),
               "word_scan_ok": okall})
    return 0


if __name__ == "__main__":
    sys.exit(main())
