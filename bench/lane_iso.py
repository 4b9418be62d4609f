"""Isolate which int16/int8 op the Mosaic remote compiler rejects.

Each case is a minimal pallas kernel; compile failures are caught and
summarized.  Run on the chip:  python bench/lane_iso.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def try_case(name, build):
    try:
        out = build()
        jax.block_until_ready(out)
        print(f"  {name:<34} OK   {np.asarray(out).ravel()[:4]}",
              flush=True)
        return True
    except Exception as e:
        msg = (str(e).splitlines() or [type(e).__name__])[0][:100]
        print(f"  {name:<34} FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def pcall(kernel, out_dtype, shapes, args):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in shapes],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shapes[0], out_dtype),
    )(*args)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.integers(0, 100, (16, 128), np.int16))
    y16 = jnp.asarray(rng.integers(0, 100, (16, 128), np.int16))
    b16 = jnp.asarray(rng.integers(0, 100, (16, 128), np.int16))
    x8 = jnp.asarray(rng.integers(0, 100, (32, 128), np.int8))

    def add16(a_ref, b_ref, o_ref):
        o_ref[:, :] = a_ref[:, :] + b_ref[:, :]

    try_case("int16 add (16,128)",
             lambda: pcall(add16, jnp.int16, [(16, 128)] * 2, [x16, y16]))

    def where16(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.where(a_ref[:, :] > jnp.int16(5),
                                a_ref[:, :], b_ref[:, :])

    try_case("int16 where (16,128)",
             lambda: pcall(where16, jnp.int16, [(16, 128)] * 2, [x16, y16]))

    def shift16(a_ref, b_ref, o_ref):
        o_ref[:, :] = (a_ref[:, :] >> 2) ^ b_ref[:, :]

    try_case("int16 shift/xor (16,128)",
             lambda: pcall(shift16, jnp.int16, [(16, 128)] * 2, [x16, y16]))

    def rowslice16(a_ref, b_ref, o_ref):
        row = jnp.broadcast_to(a_ref[3, :][None, :], (16, 128))
        o_ref[:, :] = row + b_ref[:, :]

    try_case("int16 row slice+broadcast",
             lambda: pcall(rowslice16, jnp.int16, [(16, 128)] * 2,
                           [b16, x16]))

    def gather16(a_ref, b_ref, o_ref):
        lane = (b_ref[:, :].astype(jnp.int32)) & 127
        row = jnp.broadcast_to(a_ref[0, :][None, :], (16, 128))
        o_ref[:, :] = jnp.take_along_axis(row, lane, axis=1)

    try_case("int16 take_along_axis(i32 idx)",
             lambda: pcall(gather16, jnp.int16, [(16, 128)] * 2,
                           [b16, x16]))

    def gather16b(a_ref, b_ref, o_ref):
        lane = b_ref[:, :] & jnp.int16(127)
        row = jnp.broadcast_to(a_ref[0, :][None, :], (16, 128))
        o_ref[:, :] = jnp.take_along_axis(row, lane, axis=1)

    try_case("int16 take_along_axis(i16 idx)",
             lambda: pcall(gather16b, jnp.int16, [(16, 128)] * 2,
                           [b16, x16]))

    def widen16(a_ref, b_ref, o_ref):
        o_ref[:, :] = (a_ref[:, :].astype(jnp.int32)
                       + b_ref[:, :].astype(jnp.int32)).astype(jnp.int16)

    try_case("int16 widen->i32->narrow",
             lambda: pcall(widen16, jnp.int16, [(16, 128)] * 2, [x16, y16]))

    def add8(a_ref, o_ref):
        o_ref[:, :] = a_ref[:, :] + jnp.int8(3)

    try_case("int8 add (32,128)",
             lambda: pcall(add8, jnp.int8, [(32, 128)], [x8]))

    # gather from an int32 row with int16-packed entries (the packed
    # arm): all-int32 ops, no narrow support needed — sanity only
    x32 = jnp.asarray(rng.integers(0, 1 << 16, (8, 128), np.int32))
    b32 = jnp.asarray(rng.integers(0, 1 << 16, (8, 128), np.int32))

    def packed(a_ref, b_ref, o_ref):
        v = b_ref[:, :] & 2047
        lane = (v >> 1) & 127
        row = jnp.broadcast_to(a_ref[0, :][None, :], (8, 128))
        g = jnp.take_along_axis(row, lane, axis=1)
        o_ref[:, :] = (g >> ((v & 1) << 4)) & 0xFFFF

    try_case("packed16-in-i32 extract",
             lambda: pcall(packed, jnp.int32, [(8, 128)] * 2, [b32, x32]))


if __name__ == "__main__":
    main()
