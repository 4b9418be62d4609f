"""On-device piece attribution for the two-phase compacted scan.

Round-2's compact_diag.py timed isolated pieces by re-shipping the
32 MiB survivor plane through the ~25 MB/s tunnel per dispatch, so
every piece measured a flat ~1.25 s and the round ended with no
device-level attribution of the fused program's glue+B margin
(VERDICT r2, weakness 4).  This harness fixes that with the same
trick bench.py uses: each piece is ONE jitted program that runs
phase A on device and stops after stage k, returning a scalar that
depends on everything computed; calls chain through the ``shift``
scalar and a single value fetch amortizes over the chain.  Stage
deltas are then honest device-time attributions.

Stages (count mode):
  a      phase A pallas kernel only (emit_surv) -> partial.sum()
  live   + live mask + survivor count
  pos    + nonzero/mxu compaction of survivor positions
  disp   + survivor displacement gather
  win    + window-plane gathers (the glue's big term, n_offs passes)
  full   + phase-B kernel + deep-count merge (== production program)

Usage: python bench/compact_attrib.py [--mib 32] [--dict english]
         [--glue nonzero|mxu] [--cut N] [--tpc 32] [--reps 5]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/bench")

from phfpfac_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _stage_fn(stage: str):
    """Build the jitted stage program (statics mirror the production
    _plan_scan_count_compact; ops/pallas_plan.py:870-913)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from phfpfac_tpu.ops.pallas_depth import _common
    from phfpfac_tpu.ops.pallas_plan import (
        _LANE,
        _SUB,
        TILE,
        _compact_positions,
        _make_plan_kernel,
        _make_planb_kernel,
        _specs,
    )

    statics = (
        "steps", "nb_p0", "cb", "p0_miss", "p0_mode", "tpc",
        "cond_from", "grouped", "gmode", "cut", "cap", "tpc_b",
    )

    @functools.partial(jax.jit, static_argnames=statics)
    def run(
        data2d, shift, p0_banks, packed_banks, side_banks,
        *, steps, nb_p0, cb, p0_miss, p0_mode, tpc, cond_from,
        grouped, gmode, cut, cap, tpc_b,
    ):
        n_cells, tpc = _common(data2d, tpc)
        steps_a, steps_b = steps[:cut], steps[cut:]
        kernel = _make_plan_kernel(
            steps=steps_a, nb_p0=nb_p0, cb=cb, p0_miss=p0_miss,
            p0_mode=p0_mode, emit_bitmap=False, tiles_per_cell=tpc,
            cond_from=min(cond_from, cut), grouped=grouped, gmode=gmode,
            emit_surv=True,
        )
        rows_pc = tpc * _SUB
        partial, surv = pl.pallas_call(
            kernel,
            grid=(n_cells,),
            in_specs=_specs(tpc),
            out_specs=(
                pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0)),
                pl.BlockSpec((rows_pc, _LANE), lambda i: (i, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_cells * _SUB, _LANE), jnp.int32),
                jax.ShapeDtypeStruct(
                    (n_cells * rows_pc, _LANE), jnp.int32
                ),
            ),
        )(data2d, data2d, shift.reshape(1), p0_banks, packed_banks,
          side_banks)
        base = partial.sum()
        surv = surv.reshape(-1)
        if stage == "a":
            # surv stays device-resident but unconsumed; XLA cannot DCE
            # the pallas output, so the kernel still writes the plane
            return base + surv[0] * 0

        live = surv != 0
        count = live.sum()
        if stage == "live":
            return base + count * 0 + count

        N = surv.shape[0]
        pos = _compact_positions(live, cap)
        if stage == "pos":
            return base + pos.sum() % 7 + count * 0

        posc = jnp.minimum(pos, N - 1)
        disp_b = jnp.where(pos < N, surv[posc], 0)
        if stage == "disp":
            return base + disp_b.sum() % 7 + count * 0

        flat = data2d.reshape(-1)
        offs_list = sorted({sp.depth0 - 1 for sp in steps_b})
        n_offs = len(offs_list)
        n_t = cap // TILE
        lim = flat.shape[0] - 1
        g_t = jnp.stack(
            [
                flat[jnp.minimum(posc + off, lim)].reshape(
                    n_t, _SUB, _LANE
                )
                for off in offs_list
            ],
            axis=1,
        ).reshape(n_t * n_offs * _SUB, _LANE)
        if stage == "win":
            return base + g_t.sum() % 7 + disp_b.sum() % 7 + count * 0

        d_b = disp_b.reshape(n_t * _SUB, _LANE)
        lim_b = jnp.zeros((n_t * _SUB, _LANE), jnp.int32)
        kernel_b = _make_planb_kernel(
            steps=steps_b,
            plane={o: j for j, o in enumerate(offs_list)},
            n_offs=n_offs, cb=cb, p0_miss=p0_miss, tpc=tpc_b,
            cond_from=0, grouped=grouped, gmode=gmode, seg=False,
        )
        bits_b = pl.pallas_call(
            kernel_b,
            grid=(n_t // tpc_b,),
            in_specs=[
                pl.BlockSpec(
                    (tpc_b * n_offs * _SUB, _LANE), lambda i: (i, 0)
                ),
                pl.BlockSpec((tpc_b * _SUB, _LANE), lambda i: (i, 0)),
                pl.BlockSpec((tpc_b * _SUB, _LANE), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tpc_b * _SUB, _LANE), lambda i: (i, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((n_t * _SUB, _LANE), jnp.int32),
        )(g_t, d_b, lim_b, packed_banks, side_banks)
        ok = pos < N
        deep = jnp.where(
            ok & (pos >= shift), jax.lax.population_count(bits_b.reshape(-1)),
            0,
        ).sum()
        return base + deep

    return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--dict", default="english",
                    choices=["english", "big", "binary"])
    ap.add_argument("--glue", default="nonzero", choices=["nonzero", "mxu"])
    ap.add_argument("--cut", type=int, default=0, help="0 = auto")
    ap.add_argument("--tpc", type=int, default=32)
    ap.add_argument("--tpc-b", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--stages", default="a,live,pos,disp,win,full")
    args = ap.parse_args()

    import os

    os.environ["PHFPFAC_GLUE"] = args.glue
    os.environ["PHFPFAC_COMPACT_AUTO"] = "1"

    from binary import make_signatures
    from corpora import corpus, load_words

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.pallas_depth import staged_rows
    from phfpfac_tpu.ops.pallas_pair import stage_pairs
    from phfpfac_tpu.ops.pallas_plan import (
        _LANE,
        TILE,
        _default_gmode,
        plan_count_scanner,
        resolve_compact,
        resolve_cond_from,
    )
    from phfpfac_tpu.utils.config import PfacConfig

    if args.dict == "binary":
        sigs = make_signatures(5000)
        pats = [Pattern(i + 1, s) for i, s in enumerate(sigs)]
        rng = np.random.default_rng(1)
        data = bytearray(
            rng.integers(0, 256, args.mib << 20, dtype=np.uint8).tobytes()
        )
        for i in range(0, len(data) - 64, 1 << 18):
            s = sigs[i % len(sigs)]
            data[i : i + len(s)] = s
        data = bytes(data)
    else:
        words = load_words(args.dict, cap32=args.dict == "big")
        pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
        data = corpus(args.mib)

    compiled = compile_patterns(pats, PfacConfig(width=4096, num_shards=1))
    shard = compiled.shards[0]
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)

    sc = plan_count_scanner(
        shard, max_steps, tpc=args.tpc, train=data[: 1 << 20],
        compact="off",
    )
    pt = sc.pt
    staged = sc.prepare(padded, n)
    n_pos = staged.shape[0] * _LANE - TILE
    cc = resolve_compact(
        pt, n_pos, args.cut if args.cut else "auto", tpc_b=args.tpc_b
    )
    assert cc is not None, "no compaction cut resolvable for this dict"
    cut, cap = cc
    cond_from = resolve_cond_from(pt, "auto")
    statics = dict(
        steps=pt.steps, nb_p0=pt.p0_banks.shape[0], cb=pt.code_bits,
        p0_miss=pt.p0_miss, p0_mode=pt.p0_mode, tpc=args.tpc,
        cond_from=cond_from, grouped=pt.trained, gmode=_default_gmode(),
        cut=cut, cap=cap, tpc_b=args.tpc_b,
    )
    print(
        f"[attrib] dict={args.dict} mib={args.mib} glue={args.glue} "
        f"cut={cut} cap={cap} ({cap / n_pos:.1%} of positions) "
        f"n_offs={len({sp.depth0 - 1 for sp in pt.steps[cut:]})}",
        flush=True,
    )
    p0 = jnp.asarray(pt.p0_banks)
    m = jnp.asarray(pt.packed_banks)
    s = jnp.asarray(pt.side_banks)

    # plain (uncompacted) reference arm rides the production scanner
    t0 = time.perf_counter()
    seed = sc.scan(staged, jnp.int32(n), jnp.int32(0))
    total = int(np.asarray(seed))
    t_c = time.perf_counter() - t0
    reps = []
    K = 8
    for _ in range(args.reps):
        acc = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(K):
            acc = sc.scan(staged, jnp.int32(n), acc % 2)
        _ = int(np.asarray(acc))
        reps.append((time.perf_counter() - t0) / K)
    base_ms = float(np.median(reps)) * 1e3
    print(
        f"[attrib] plain: {base_ms:.2f} ms ({n / np.median(reps) / 1e9:.3f}"
        f" GB/s) matches={total} compile={t_c:.0f}s",
        flush=True,
    )

    prev = base_ms
    for stage in args.stages.split(","):
        fn = _stage_fn(stage)
        t0 = time.perf_counter()
        seed = fn(staged, jnp.int32(0), p0, m, s, **statics)
        first = int(np.asarray(seed))
        t_c = time.perf_counter() - t0
        reps = []
        for _ in range(args.reps):
            acc = jnp.int32(0)
            t0 = time.perf_counter()
            for _ in range(K):
                acc = fn(staged, acc % 2, p0, m, s, **statics)
            _ = int(np.asarray(acc))
            reps.append((time.perf_counter() - t0) / K)
        ms = float(np.median(reps)) * 1e3
        print(
            f"[attrib] {stage:>5}: {ms:8.2f} ms  (+{ms - prev:7.2f} vs "
            f"prev stage; plain {base_ms:.2f}) first={first} "
            f"compile={t_c:.0f}s",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
