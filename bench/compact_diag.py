"""Breakdown diagnosis of the two-phase compacted scan's cost.

kexp (round 2) measured the fused compacted english scan at ~1049 ms
per dispatch vs 14.7 ms uncompacted and 0.15 ms for the isolated glue
(bench/glue_cal.py) — a ~70x regression the cost model never predicted.
This times each piece of the REAL compacted program separately, on the
real english tables and a real trained survivor plane:

  plain      full uncompacted scan          (baseline, cache-hit)
  compacted  full two-phase scan            (the regression, cache-hit)
  phaseA     phase-A kernel + survivor plane emission only
  glue_pos   nonzero(size=cap) survivor compaction only
  glue_all   + displacement gather + window gather (n_offs) + transpose
  phaseB     _phase_b in full (glue_all + the dense deep kernel)

Chained-dispatch timing throughout (the tunnel elides repeated
identical dispatches): each call consumes the previous call's output —
phase-A pieces chain on the shift scalar like bench/kexp.py, glue/B
pieces alternate the survivor plane with a data-dependent flip-select.

Run: python bench/compact_diag.py [--mib 32] [--reps 5]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

from phfpfac_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import os

os.environ["PHFPFAC_COMPACT_AUTO"] = "1"  # diagnosing the gated path

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tpc", type=int, default=32)
    ap.add_argument("--cond-from", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops import pallas_plan as pp
    from phfpfac_tpu.ops.pallas_plan import (
        _LANE, _SUB, TILE, plan_count_scanner, resolve_compact,
    )
    from phfpfac_tpu.utils.config import PfacConfig

    from corpora import corpus, load_words

    words = load_words("english", cap32=False)
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=4096, num_shards=1)
    compiled = compile_patterns(pats, cfg)
    shard = compiled.shards[0]

    data = corpus(args.mib)
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)

    scan = plan_count_scanner(
        shard, max_steps, tpc=args.tpc, cond_from=args.cond_from,
        train=data[: 1 << 20], compact="auto",
    )
    pt = scan.pt
    dev = scan.prepare(padded, n)
    n_pos = dev.shape[0] * _LANE - TILE
    cc = resolve_compact(pt, n_pos, "auto")
    assert cc is not None, "auto compaction did not engage"
    cut, cap = cc
    print(f"[diag] english mib={args.mib} steps={len(pt.steps)} "
          f"cut={cut} cap={cap} live_frac={pt.live_frac[:cut+2]}",
          flush=True)

    statics = dict(
        steps=pt.steps, nb_p0=pt.p0_banks.shape[0], cb=pt.code_bits,
        p0_miss=pt.p0_miss, p0_mode=pt.p0_mode, interpret=False,
        tpc=args.tpc, cond_from=args.cond_from, grouped=pt.trained,
        gmode=pp._default_gmode(),
    )
    p0, m, s = scan._p0, scan._m, scan._s

    def timed(tag, fn, chain, seed_args, reps=args.reps, K=8):
        """fn(prev_out, *seed_args) -> out; chain derives next input."""
        out = fn(None, *seed_args)
        jax.block_until_ready(out)
        meds = []
        for _ in range(reps):
            o = None
            t0 = time.perf_counter()
            for _ in range(K):
                o = fn(o, *seed_args)
            jax.block_until_ready(o)
            meds.append((time.perf_counter() - t0) / K)
        dt = float(np.median(meds))
        print(f"[diag] {tag:10s} {dt*1e3:9.3f} ms  "
              f"({n/dt/1e9:7.3f} GB/s-equiv)", flush=True)
        return dt

    # --- plain + compacted full scans (cache-hit from kexp) ---------
    timed("plain", lambda o, d: pp._plan_scan_count(
        d, jnp.asarray((0 if o is None else o % 2), jnp.int32),
        p0, m, s, **statics), None, (dev,))

    def full_compact(o, d):
        tot, _cnt = pp._plan_scan_count_compact(
            d, jnp.asarray((0 if o is None else o % 2), jnp.int32),
            p0, m, s, cut=cut, cap=cap, tpc_b=8, **statics)
        return tot
    timed("compacted", full_compact, None, (dev,))

    # --- phase A alone (emit_surv), consumer = both sums ------------
    rows_pc = args.tpc * _SUB

    @functools.partial(jax.jit, static_argnames=())
    def phase_a(d, shift):
        n_cells, tpc = pp._common(d, args.tpc)
        kernel = pp._make_plan_kernel(
            steps=pt.steps[:cut], nb_p0=statics["nb_p0"],
            cb=pt.code_bits, p0_miss=pt.p0_miss, p0_mode=pt.p0_mode,
            emit_bitmap=False, tiles_per_cell=tpc,
            cond_from=min(args.cond_from, cut), grouped=pt.trained,
            gmode=statics["gmode"], seg_bytes=0, halo_bytes=0,
            emit_surv=True,
        )
        partial, surv = pl.pallas_call(
            kernel,
            grid=(n_cells,),
            in_specs=pp._specs(tpc),
            out_specs=(
                pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0)),
                pl.BlockSpec((rows_pc, _LANE), lambda i: (i, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_cells * _SUB, _LANE), jnp.int32),
                jax.ShapeDtypeStruct(
                    (n_cells * rows_pc, _LANE), jnp.int32),
            ),
        )(d, d, shift.reshape(1), p0, m, s)
        return partial.sum(), surv

    def run_a(o, d):
        sh = jnp.asarray((0 if o is None else o % 2), jnp.int32)
        t, _sv = phase_a(d, sh)
        return t
    timed("phaseA", run_a, None, (dev,))

    # real survivor plane for the glue/B pieces
    _t, surv0 = phase_a(dev, jnp.int32(0))
    surv0 = surv0.reshape(-1)
    live_n = int((np.asarray(surv0) != 0).sum())
    print(f"[diag] survivors={live_n} ({live_n/n_pos:.4f} of positions, "
          f"cap={cap})", flush=True)

    # chain: alternate the plane with a flip (data-dependent select on
    # the previous scalar; both arms distinct so XLA cannot fold)
    def alt(surv, prev):
        return jax.lax.select(
            (prev % 2) == 0, surv, jnp.flip(surv))

    offs_list = sorted({sp.depth0 - 1 for sp in pt.steps[cut:]})
    n_offs = len(offs_list)
    offs = jnp.asarray(offs_list, jnp.int32)

    @jax.jit
    def glue_pos(surv, prev):
        sv = alt(surv, prev)
        live = sv != 0
        pos = pp._compact_positions(live, cap)
        return pos.sum()

    timed("glue_pos", lambda o, sv: glue_pos(
        sv, jnp.asarray(0 if o is None else o, jnp.int32)),
        None, (surv0,))

    @jax.jit
    def glue_all(surv, prev):
        sv = alt(surv, prev)
        flat = dev.reshape(-1)
        N = sv.shape[0]
        live = sv != 0
        pos = pp._compact_positions(live, cap)
        posc = jnp.minimum(pos, N - 1)
        disp_b = jnp.where(pos < N, sv[posc], 0)
        g = flat[jnp.minimum(
            posc[:, None] + offs[None, :], flat.shape[0] - 1)]
        n_t = cap // TILE
        g_t = (g.reshape(n_t, _SUB, _LANE, n_offs)
               .transpose(0, 3, 1, 2)
               .reshape(n_t * n_offs * _SUB, _LANE))
        return g_t.sum() + disp_b.sum() + pos.sum()

    timed("glue_all", lambda o, sv: glue_all(
        sv, jnp.asarray(0 if o is None else o, jnp.int32)),
        None, (surv0,))

    @jax.jit
    def glue_1d(surv, prev):
        # the round-2 fix candidate: one 1-D gather per offset + stack
        # (what _phase_b now does) instead of the batched 2-D gather
        sv = alt(surv, prev)
        flat = dev.reshape(-1)
        N = sv.shape[0]
        live = sv != 0
        pos = pp._compact_positions(live, cap)
        posc = jnp.minimum(pos, N - 1)
        disp_b = jnp.where(pos < N, sv[posc], 0)
        n_t = cap // TILE
        lim = flat.shape[0] - 1
        g_t = jnp.stack(
            [flat[jnp.minimum(posc + off, lim)].reshape(n_t, _SUB, _LANE)
             for off in offs_list],
            axis=1,
        ).reshape(n_t * n_offs * _SUB, _LANE)
        return g_t.sum() + disp_b.sum() + pos.sum()

    timed("glue_1d", lambda o, sv: glue_1d(
        sv, jnp.asarray(0 if o is None else o, jnp.int32)),
        None, (surv0,))

    @jax.jit
    def phase_b_full(surv, prev):
        sv = alt(surv, prev)
        bits_b, pos, count = pp._phase_b(
            dev, sv, m, s,
            steps_b=pt.steps[cut:], cb=pt.code_bits,
            p0_miss=pt.p0_miss, interpret=False, grouped=pt.trained,
            gmode=statics["gmode"], seg_bytes=0, halo_bytes=0,
            cap=cap, tpc_b=8,
        )
        return jax.lax.population_count(bits_b).sum() + pos.sum()

    timed("phaseB", lambda o, sv: phase_b_full(
        sv, jnp.asarray(0 if o is None else o, jnp.int32)),
        None, (surv0,))


if __name__ == "__main__":
    main()
