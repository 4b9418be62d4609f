"""Honest VPU issue-rate calibration for the plan kernel's probe mix.

bench_vpu_ilp in micro_tpu.py is CSE-compromised: its `v*3+1` chains
are affine (foldable) and its probe loop body repeats every 64
iterations (identical idx), so XLA CSE collapses the work and the
Gvop/s numbers are inflated.  This harness mimics the REAL probe
structure of ops/pallas_plan._lut_range — distinct bank rows per
iteration, per-tile idx data, a serial select chain per tile — and
varies only the INTERLEAVE: how many independent tile chains run
through the bank loop together.

  tile-outer (K=1 at a time) == the kernel's default order
  block-K    == K tiles' chains interleaved per bank row
  bank-outer (K=tpc)         == the rejected PHFPFAC_BANK_OUTER order

Chained dispatches (output feeds next input) defeat the tunnel's
identical-dispatch elision; medians over repeats.

Run: python bench/ilp_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

NB = 16  # banks probed per tile chain (a realistic group size)
TILES = 32  # tiles per grid cell (the kernel's tpc)
CELLS = 64  # grid size


def make_fn(block: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(bank_ref, in_ref, out_ref):
        tiles = [in_ref[8 * i:8 * (i + 1), :] for i in range(TILES)]
        accs = []
        for b0 in range(0, TILES, block):
            idxs = tiles[b0:b0 + block]
            lanes = [idx & 127 for idx in idxs]
            banks = [jax.lax.shift_right_logical(idx, 7) & (NB - 1)
                     for idx in idxs]
            acc = [jnp.full((8, 128), -1, jnp.int32) for _ in idxs]
            for k in range(NB):
                row = jnp.broadcast_to(bank_ref[k, :][None, :], (8, 128))
                for i in range(len(idxs)):
                    g = jnp.take_along_axis(row, lanes[i], axis=1)
                    acc[i] = jnp.where(banks[i] == k, g, acc[i])
            accs.extend(acc)
        # feed result back out so the next chained call depends on it
        out = accs[0]
        for a in accs[1:]:
            out = jnp.maximum(out, a)
        for i in range(TILES):
            out_ref[8 * i:8 * (i + 1), :] = out ^ tiles[i]

    def call(banks, x):
        return pl.pallas_call(
            kernel,
            grid=(CELLS,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((TILES * 8, 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((TILES * 8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((CELLS * TILES * 8, 128),
                                           jnp.int32),
        )(banks, x)

    return jax.jit(call)


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    banks = jnp.asarray(
        rng.integers(0, 1 << 20, (NB, 128), dtype=np.int32))
    x0 = jnp.asarray(
        rng.integers(0, 1 << 12, (CELLS * TILES * 8, 128), dtype=np.int32))
    total_probes = NB * TILES * CELLS  # (row,take,where) triples

    for block in (1, 2, 4, 8, 16, 32):
        f = make_fn(block)
        # warmup + chain: output feeds input, defeating elision
        x = f(banks, x0)
        jax.block_until_ready(x)
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(8):
                x = f(banks, x)
            jax.block_until_ready(x)
            reps.append((time.perf_counter() - t0) / 8)
        dt = float(np.median(reps))
        print(f"  block={block:>2}  {dt*1e3:8.3f} ms  "
              f"{total_probes/dt/1e9:6.2f} Gprobe/s  "
              f"({3*total_probes/dt/1e9:6.2f} Gvop/s at 3 vops/probe)",
              flush=True)


if __name__ == "__main__":
    main()
