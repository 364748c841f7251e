"""Probe: does Mosaic lane-broadcast [8,1] (and [512,1]) against [8,TP]?"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

F32 = jnp.float32
TP = 256


def kern(x_ref, q_ref, o_ref):
    x = x_ref[...]                        # [64, TP]
    for e in range(8):
        sl = x[8 * e:8 * e + 8, :]
        qv = q_ref[8 * e:8 * e + 8, 0:1]  # [8, 1]
        o_ref[8 * e:8 * e + 8, :] = sl * qv


def main():
    print("devices:", jax.devices(), flush=True)
    x = jnp.asarray(np.random.default_rng(0).random((64, TP), np.float32))
    q = jnp.asarray(np.arange(64, dtype=np.float32).reshape(64, 1) + 1)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((64, TP), F32),
        grid=(1,),
        in_specs=[pl.BlockSpec((64, TP), lambda i: (0, i)),
                  pl.BlockSpec((64, 1), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((64, TP), lambda i: (0, i)),
    )(x, q)
    want = np.asarray(x) * np.asarray(q)
    np.testing.assert_allclose(np.asarray(out), want)
    print("lane-broadcast [8,1]x[8,TP]: OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
