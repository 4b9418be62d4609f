"""Narrow-lane probe microbench (VERDICT r4 item 2).

The plan kernel's measured issue rate is ~1.5 (8,128)-int32 vops/cycle
on the text regimes and the probe (row-broadcast, take_along_axis,
select) is its dominant ledger line.  This harness asks the ONLY
untested question about that rate: do narrower element types probe
faster per ENTRY?

Arms (all the same logical probe structure as ops/pallas_plan._lut):
  i32     (8,128) int32 tiles over NB int32 bank rows  — the kernel
  i16     (16,128) int16 tiles over NB int16 bank rows — native
          narrow lanes: if Mosaic runs the triple at ~1 op/cycle on
          (16,128) int16, per-entry probe throughput DOUBLES
  i8      (32,128) int8 tiles — same question, 4x lanes
  packed  (8,128) int32 tiles over NB/2 int32 rows holding TWO 16-bit
          entries per word (lane = idx>>1, one hi/lo extract after the
          merge) — the fallback that needs no Mosaic narrow-gather
          support at all, same trick as the nibble side tables
  alu32/alu16/alu8  dependent add/xor/select chains (no gather) —
          separates the VPU's narrow ALU rate from gather support

Protocol: in-trace static repeat (R vs 2R, differenced) — each repeat
feeds the previous accumulator into the next index, so nothing folds
or CSEs; one value fetch per call; medians.  Run on the real chip:

    python bench/lane_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

NB = 16       # banks per probe pass (realistic hot-group span)
WALKERS = 32 * 1024  # per grid cell (matches tpc=32 kernel cells)
CELLS = 2048


def _probe_kernel(dtype, sub: int, reps: int, nb: int, packed: bool):
    """Probe chain kernel: `reps` dependent probe passes per tile."""
    from jax.experimental import pallas as pl  # noqa: F401

    n_tiles = WALKERS // (sub * 128)
    shift = {jnp.int32: 5, jnp.int16: 4, jnp.int8: 3}[dtype]

    def kernel(bank_ref, in_ref, out_ref):
        tiles = [in_ref[sub * i:sub * (i + 1), :] for i in range(n_tiles)]
        mask = dtype((nb * 128) - 1) if not packed else dtype(nb * 128 - 1)
        outs = []
        for i in range(n_tiles):
            idx = tiles[i]
            for r in range(reps):
                v = idx & mask
                if packed:
                    lane = (v >> 1) & 127
                    bank = v >> 8
                else:
                    lane = v & 127
                    bank = v >> 7
                acc = jnp.full((sub, 128), -1, dtype)
                kb = nb // 2 if packed else nb
                for k in range(kb):
                    row = jnp.broadcast_to(
                        bank_ref[k, :][None, :], (sub, 128)
                    )
                    g = jnp.take_along_axis(row, lane.astype(jnp.int32)
                                            if dtype != jnp.int32 else lane,
                                            axis=1)
                    acc = jnp.where(bank == k, g, acc)
                if packed:
                    half = (v & 1) << 4
                    acc = (acc >> half) & 0xFFFF
                # feed the accumulator into the next repeat's index —
                # data-dependent, nothing folds
                idx = (idx + acc + dtype(r + 1))
            outs.append(idx)
        for i in range(n_tiles):
            out_ref[sub * i:sub * (i + 1), :] = outs[i]

    return kernel, n_tiles


def probe_fn(dtype, sub: int, reps: int, packed: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel, n_tiles = _probe_kernel(dtype, sub, reps, NB, packed)
    rows = n_tiles * sub

    def call(banks, x):
        return pl.pallas_call(
            kernel,
            grid=(CELLS,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((CELLS * rows, 128), dtype),
        )(banks, x)

    return jax.jit(call)


def alu_fn(dtype, sub: int, reps: int):
    """Dependent elementwise chain: add, xor, compare-select per rep."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = WALKERS // (sub * 128)
    rows = n_tiles * sub

    def kernel(in_ref, out_ref):
        tiles = [in_ref[sub * i:sub * (i + 1), :] for i in range(n_tiles)]
        outs = []
        for i in range(n_tiles):
            v = tiles[i]
            for r in range(reps):
                a = v + dtype(r + 1)
                b = a ^ v
                v = jnp.where(b > dtype(0), a, b)
            outs.append(v)
        for i in range(n_tiles):
            out_ref[sub * i:sub * (i + 1), :] = outs[i]

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(CELLS,),
            in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((CELLS * rows, 128), dtype),
        )(x)

    return jax.jit(call)


def _time(make, data_args, label: str, unit_count: float):
    """Differenced in-trace repeat timing: (T(2R) - T(R)) / R.

    Chained host dispatches (each call consumes the previous output)
    + ONE scalar value fetch per timing point — block_until_ready is
    NOT a fetch through this rig's async tunnel, and identical
    repeated dispatches can be elided (CLAUDE.md measurement rules)."""
    R = 16
    K = 4  # chained calls per timing point
    try:
        f1, f2 = make(R), make(2 * R)
        x0 = data_args[-1]
        pre = data_args[:-1]

        def run_chain(f):
            y = x0
            t0 = time.perf_counter()
            for _ in range(K):
                y = f(*pre, y)
            _ = int(np.asarray(y[0, 0]))  # real fetch
            return (time.perf_counter() - t0) / K

        run_chain(f1), run_chain(f2)  # compile + warm
        t1 = float(np.median([run_chain(f1) for _ in range(3)]))
        t2 = float(np.median([run_chain(f2) for _ in range(3)]))
        dt = (t2 - t1) / R
        rate = unit_count / dt / 1e9
        print(f"  {label:<28} {dt*1e3:8.3f} ms/pass  {rate:7.2f} G/s",
              flush=True)
        return rate
    except Exception as e:
        msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
        print(f"  {label:<28} FAILED: {type(e).__name__}: {msg}",
              flush=True)
        return None


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # --- ALU arms: narrow elementwise rate -----------------------------
    print("ALU chains (3 dependent elementwise vops per element per rep):")
    for dtype, sub, name in (
        (jnp.int32, 8, "alu32 (8,128)"),
        (jnp.int16, 16, "alu16 (16,128)"),
        (jnp.int8, 32, "alu8 (32,128)"),
    ):
        x = jnp.asarray(
            rng.integers(-100, 100, (CELLS * WALKERS // 128, 128)
                         ).astype(np.dtype(dtype.dtype.name))
        )
        _time(lambda R, d=dtype, s=sub: alu_fn(d, s, R), (x,),
              name, 3 * CELLS * WALKERS)

    # --- probe arms: per-entry gather rate -----------------------------
    # unit = walkers probed per pass (each pays NB (row,take,where)
    # triples in i32/i16/i8, NB/2 + extract in packed)
    print(f"probe chains ({NB} banks per pass):")
    arms = [
        (jnp.int32, 8, False, "probe i32 (8,128)"),
        (jnp.int16, 16, False, "probe i16 (16,128)"),
        (jnp.int8, 32, False, "probe i8 (32,128)"),
        (jnp.int32, 8, True, "probe packed16-in-i32"),
    ]
    base = None
    for dtype, sub, packed, name in arms:
        npdt = np.dtype(dtype.dtype.name)
        hi = min(NB * 128, np.iinfo(npdt).max)
        banks = jnp.asarray(
            rng.integers(0, hi, (NB, 128)).astype(npdt))
        x = jnp.asarray(
            rng.integers(0, hi, (CELLS * WALKERS // 128, 128)
                         ).astype(npdt))
        r = _time(lambda R, d=dtype, s=sub, p=packed: probe_fn(d, s, R, p),
                  (banks, x), name, CELLS * WALKERS)
        if name.endswith("i32 (8,128)"):
            base = r
        elif r and base:
            print(f"      -> {r/base:5.2f}x the i32 walker rate "
                  f"({'half the banks' if packed else 'same banks'})",
                  flush=True)


if __name__ == "__main__":
    main()
