"""Round-5: word-contract conversions on the real chip.

Validates the value-route relayouts (pack_value_words /
unpack_value_words — weighted-MXU lane->byte combine with no u8
bitcast repack) against the byte route on the 4K golden geometry, then
the fused conversions (bgrx_to_frame / frame_to_bgrx) for exactness vs
the plane-contract chain, then times both chains.

Usage: python tools/exp_r5conv.py [verify|time|all]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from myyuv_tpu.engine import word_frame as wf  # noqa: E402
from myyuv_tpu.kernels import device as kdev  # noqa: E402
from myyuv_tpu.kernels import pallas_dct8 as p8  # noqa: E402


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    assert jax.devices()[0].platform != "cpu"
    planes_np = bench.get_4k_planes()
    h, w = planes_np[0].shape
    y, u, v = [jnp.asarray(p) for p in planes_np]
    out = {}

    if stage in ("verify", "all"):
        jpackv = jax.jit(p8.pack_value_words)
        jpackb = jax.jit(p8.pack_pixel_words)
        a = np.asarray(jpackv(y.astype(jnp.int32)))
        b = np.asarray(jpackb(y))
        out["pack_val_luma_exact"] = bool(np.array_equal(a, b))
        uv = jnp.concatenate([u, v], axis=0)
        a2 = np.asarray(jpackv(uv.astype(jnp.int32)))
        b2 = np.asarray(jpackb(uv))
        out["pack_val_chroma_exact"] = bool(np.array_equal(a2, b2))
        ju = jax.jit(p8.unpack_value_words, static_argnums=(1, 2))
        g = np.asarray(ju(jnp.asarray(b), h, w))
        out["unpack_val_luma_exact"] = bool(
            np.array_equal(g, planes_np[0].astype(np.int32)))
        g2 = np.asarray(ju(jnp.asarray(b2), 2 * (h // 2), w // 2))
        out["unpack_val_chroma_exact"] = bool(np.array_equal(
            g2, np.concatenate([planes_np[1], planes_np[2]])
            .astype(np.int32)))
        # fused conversions vs the plane-contract chain (device exact:
        # the TPU backend honors the runtime-zero FMA guards)
        px = jax.jit(kdev.iyuv_to_bgrx)(y, u, v)
        xw1 = wf.bgrx_to_frame(px)
        yy, uu, vv = jax.jit(kdev.bgrx_to_iyuv)(px)
        xw2 = wf.pack_frame(yy, uu, vv)
        out["bgrx_to_frame_exact"] = bool(
            np.array_equal(np.asarray(xw1), np.asarray(xw2)))
        fr = wf.pack_frame(y, u, v)
        got = wf.frame_to_bgrx(fr, h, w)
        out["frame_to_bgrx_exact"] = bool(
            np.array_equal(np.asarray(got), np.asarray(px)))
        print(json.dumps(out), flush=True)

    if stage in ("time", "all"):
        px = jax.jit(kdev.iyuv_to_bgrx)(y, u, v)
        fr = wf.pack_frame(y, u, v)
        bench._sync(wf.bgrx_to_frame(px))
        bench._sync(wf.frame_to_bgrx(fr, h, w))
        jconv = jax.jit(kdev.bgrx_to_iyuv)

        def chain_ingest():
            return wf.pack_frame(*jconv(px))

        bench._sync(chain_ingest())
        t = {}
        t["bgrx_to_frame_ms"] = round(bench._device_time(
            lambda: wf.bgrx_to_frame(px), reps=10) * 1e3, 3)
        t["conv_plus_pack_ms"] = round(bench._device_time(
            chain_ingest, reps=10) * 1e3, 3)
        t["frame_to_bgrx_ms"] = round(bench._device_time(
            lambda: wf.frame_to_bgrx(fr, h, w), reps=10) * 1e3, 3)

        def chain_preview():
            yy, uu, vv = wf.unpack_frame(fr, h, w)
            return jax.jit(kdev.iyuv_to_bgrx)(yy, uu, vv)

        bench._sync(chain_preview())
        t["unpack_plus_conv_ms"] = round(bench._device_time(
            chain_preview, reps=10) * 1e3, 3)
        print(json.dumps(t), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
