"""Measure the in-kernel butterfly lane-compaction cost on the TPU.

Survivor-compaction v2 (VERDICT r3 item 2) proposes packing the
phase-A survivors' (position, displacement) — and possibly their
window planes — into dense tiles INSIDE the Pallas kernel, instead of
the falsified XLA glue (nonzero/gather measured ~60M elem/s,
bench/compact_attrib.py).  The design lives or dies on one number:
the per-tile cycle cost of a stable in-register compaction of an
(8,128) tile (logical 1024-vector), per moved plane.

This probe implements the real algorithm —

* inclusive prefix-sum of the live mask over the logical 1024 vector
  (Hillis-Steele: 7 in-row stages via lane rotates + cross-row
  select, 3 row-granular stages),
* per-live-lane left-shift distance k = i - incl[i] + 1 (monotone
  non-decreasing over live lanes, so binary-decomposed shifts never
  collide),
* 10 butterfly stages, LSB->MSB: at stage b every element whose
  remaining shift has bit b moves left by 2^b (payload planes + the
  k plane itself),

— and times it against a copy-only kernel with identical IO via the
chained protocol; the difference is the pack's device cost.
Correctness of the packed output is asserted against NumPy on the
first rep (positions of nonzero survivors, stable order).

Usage: python bench/pack_probe.py [--mib 32] [--planes 1 2 6]
         [--density 0.04] [--chain 8]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

from phfpfac_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

_LANE, _SUB, TILE = 128, 8, 1024


def _shift_left(x, s: int, lane, sub):
    """Logical-1024 left shift by static s (zeros shifted in)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    if s % _LANE == 0:
        r = s // _LANE
        rolled = pltpu.roll(x, _SUB - r, axis=0)
        return jnp.where(sub < _SUB - r, rolled, 0)
    # s < 128: same-row part from lane+s, wrap part from the next row
    rolled = pltpu.roll(x, _LANE - s, axis=1)
    nxt = pltpu.roll(rolled, _SUB - 1, axis=0)
    out = jnp.where(lane < _LANE - s, rolled, nxt)
    return jnp.where((sub == _SUB - 1) & (lane >= _LANE - s), 0, out)


def _shift_right(x, s: int, lane, sub):
    """Logical-1024 right shift by static s (zeros shifted in)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    if s % _LANE == 0:
        r = s // _LANE
        rolled = pltpu.roll(x, r, axis=0)
        return jnp.where(sub >= r, rolled, 0)
    rolled = pltpu.roll(x, s, axis=1)
    prev = pltpu.roll(rolled, 1, axis=0)
    out = jnp.where(lane >= s, rolled, prev)
    return jnp.where((sub == 0) & (lane < s), 0, out)


def _pack_tile(planes, lane, sub):
    """Stable-compact live lanes (planes[0] != 0) to the tile front.

    Returns (packed planes, live count scalar-ish (8,128) broadcast).
    """
    import jax.numpy as jnp

    live = (planes[0] != 0).astype(jnp.int32)
    incl = live
    for b in range(10):  # Hillis-Steele inclusive prefix over 1024
        incl = incl + _shift_right(incl, 1 << b, lane, sub)
    idx = sub * _LANE + lane
    # left-shift distance; dead lanes get 0 (they never move, get
    # overwritten or cleared)
    k = jnp.where(planes[0] != 0, idx - incl + 1, 0)
    planes = list(planes)
    for b in range(10):
        s = 1 << b
        kl = _shift_left(k, s, lane, sub)
        take = (kl & s) != 0  # right neighbor wants to move here
        stay = (k & s) == 0  # current content not moving away
        newp = []
        for p in planes:
            pl_ = _shift_left(p, s, lane, sub)
            newp.append(jnp.where(take, pl_, jnp.where(stay, p, 0)))
        planes = newp
        k = jnp.where(take, kl - s, jnp.where(stay, k, 0))
    total = incl  # incl at the last logical index = live count
    return planes, total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--planes", type=int, nargs="+", default=[1, 2, 6])
    ap.add_argument("--density", type=float, default=0.04)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--tpc", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    n_pos = (args.mib << 20)
    rows = n_pos // _LANE
    rpc = args.tpc * _SUB
    n_cells = rows // rpc
    rows = n_cells * rpc
    rng = np.random.default_rng(7)
    disp = np.where(
        rng.random(rows * _LANE) < args.density,
        rng.integers(1, 1 << 13, rows * _LANE),
        0,
    ).astype(np.int32).reshape(rows, _LANE)

    def make_kernel(m: int, do_pack: bool):
        def kernel(in_ref, out_ref, cnt_ref):
            lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
            sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
            for i in range(args.tpc):
                d = in_ref[pl.ds(i * _SUB, _SUB), :]
                # m payload planes: the disp plane + m-1 derived
                # "window" planes (rolled copies — same data volume a
                # real window pack would move)
                planes = [d] + [
                    _shift_left(d, j + 1, lane, sub) for j in range(m - 1)
                ]
                if do_pack:
                    planes, total = _pack_tile(planes, lane, sub)
                else:
                    total = d  # same IO shape, no pack
                acc = planes[0]
                for p in planes[1:]:
                    acc = acc ^ p  # fold so nothing is DCE'd
                out_ref[pl.ds(i * _SUB, _SUB), :] = acc
                cnt_ref[pl.ds(i * _SUB, _SUB), :] = total

        return kernel

    @functools.partial(jax.jit, static_argnames=("m", "do_pack", "k"))
    def run_chain(d, m, do_pack, k):
        kern = make_kernel(m, do_pack)

        def one(x):
            out, cnt = pl.pallas_call(
                kern,
                grid=(n_cells,),
                in_specs=[pl.BlockSpec((rpc, _LANE), lambda i: (i, 0))],
                out_specs=(
                    pl.BlockSpec((rpc, _LANE), lambda i: (i, 0)),
                    pl.BlockSpec((rpc, _LANE), lambda i: (i, 0)),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((rows, _LANE), jnp.int32),
                    jax.ShapeDtypeStruct((rows, _LANE), jnp.int32),
                ),
                interpret=args.interpret,
            )(x)
            return out, cnt

        def body(_, carry):
            x, acc = carry
            out, cnt = one(x)
            # dependency: next input = original with a data-dependent
            # zero-preserving tweak (keeps liveness pattern identical)
            dep = (out[0, 0] + cnt[0, 0]) & 0
            return x + dep, acc + cnt[0, 0]

        return jax.lax.fori_loop(0, k, body, (d, jnp.int32(0)))[1]

    # correctness (interpret or first device rep): packed disp plane
    # equals NumPy stable compaction per tile
    def check(m=1):
        kern = make_kernel(m, True)
        out, cnt = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec((rpc, _LANE), lambda i: (i, 0))],
            out_specs=(
                pl.BlockSpec((rpc, _LANE), lambda i: (i, 0)),
                pl.BlockSpec((rpc, _LANE), lambda i: (i, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rpc, _LANE), jnp.int32),
                jax.ShapeDtypeStruct((rpc, _LANE), jnp.int32),
            ),
            interpret=args.interpret,
        )(jnp.asarray(disp[:rpc]))
        out = np.asarray(out)
        for t in range(args.tpc):
            tile = disp[t * _SUB : (t + 1) * _SUB].reshape(-1)
            want = tile[tile != 0]
            got = out[t * _SUB : (t + 1) * _SUB].reshape(-1)
            assert (got[: len(want)] == want).all(), f"tile {t} pack wrong"
            assert (got[len(want) :] == 0).all(), f"tile {t} tail dirty"
        print(f"[pack_probe] correctness OK ({args.tpc} tiles, m={m})")

    check()
    d = jnp.asarray(disp)
    k = args.chain
    results = {}
    for m in args.planes:
        for do_pack in (False, True):
            key = (m, do_pack)
            _ = int(run_chain(d, m, do_pack, k))  # compile + warm
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                _ = int(run_chain(d, m, do_pack, 2 * k))
                t1 = time.perf_counter()
                _ = int(run_chain(d, m, do_pack, k))
                t2 = time.perf_counter()
                ts.append(((t1 - t0) - (t2 - t1)) / k)
            results[key] = float(np.median(ts))
    n_tiles = rows // _SUB // (_SUB // _SUB) // (TILE // _LANE)  # rows*128/1024
    n_tiles = rows * _LANE // TILE
    for m in args.planes:
        base, packed = results[(m, False)], results[(m, True)]
        extra = packed - base
        cyc = extra * 0.94e9 / n_tiles
        print(
            f"[pack_probe] m={m}: copy {base*1e3:.3f} ms, pack "
            f"{packed*1e3:.3f} ms, pack-only {extra*1e3:.3f} ms = "
            f"{cyc:.0f} cycles/tile ({args.mib} MiB, {n_tiles} tiles)"
        )


if __name__ == "__main__":
    main()
