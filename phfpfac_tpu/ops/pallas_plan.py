"""Pallas TPU PFAC kernel over cost-planned hybrid-stride tables.

Walks compile.plan's static step plan: a dense depths-1+2 probe, then
per step either a one-byte (mono) or two-byte (pair + side) probe —
whichever the build-time DP priced cheaper for that depth.  Probe
mechanics match ops.pallas_pair / ops.pallas_depth; the char window
is the staged pair-symbol stream (stage_pairs), advanced by the
step's stride, with mono symbols extracted as ``pair & (2^CB - 1)``.

Same bitmap/count contracts as the other kernels.  Exact mode only.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from phfpfac_tpu.compile.pair import PairUnsupported
from phfpfac_tpu.compile.plan import PlanTables, build_plan_tables
from phfpfac_tpu.compile.tables import ShardTables
from phfpfac_tpu.ops.pallas_depth import _common, staged_rows
from phfpfac_tpu.ops.pallas_pair import stage_pairs
from phfpfac_tpu.ops.pallas_scan import _LANE, _SUB, TILE, _lut


def _probe_merge() -> str:
    """Bank-merge dependency shape (A/B knob, read at trace time).

    "chain" (default): acc = where(bank==k, g, acc) — one serial
    select chain per tile, minimal op count (3/bank).  "tree": mask
    each bank's gather to -1 and combine with a balanced max tree —
    one extra vop per bank but dependency depth log2(nb), exposing
    ILP if the VPU can issue >1 op/cycle (sound: table entries are
    nonnegative, empty slots and the init are -1, and at most one
    bank matches any walker)."""
    import os

    return os.environ.get("PHFPFAC_PROBE_MERGE", "chain")


def _lut_range(banks_ref, idx, acc, lo: int, hi: int, off: int = 0,
               k0: int = 0):
    """_lut restricted to banks [lo, hi), merged into ``acc``."""
    bank = idx >> 7
    lane = idx & (_LANE - 1)
    if _probe_merge() == "tree" and hi - lo >= 4:
        parts = [acc]
        for k in range(lo, hi):
            row = jnp.broadcast_to(banks_ref[off + k, :][None, :], idx.shape)
            g = jnp.take_along_axis(row, lane, axis=1)
            parts.append(jnp.where(bank == k + k0, g, jnp.int32(-1)))
        while len(parts) > 1:
            parts = [
                jnp.maximum(parts[i], parts[i + 1])
                if i + 1 < len(parts) else parts[i]
                for i in range(0, len(parts), 2)
            ]
        return parts[0]
    for k in range(lo, hi):
        row = jnp.broadcast_to(banks_ref[off + k, :][None, :], idx.shape)
        g = jnp.take_along_axis(row, lane, axis=1)
        acc = jnp.where(bank == k + k0, g, acc)
    return acc


def _bank_outer() -> bool:
    """Probe op order (A/B knob, read at trace time).

    Bank-outer reads + broadcasts each bank row ONCE per probe and
    gathers all ``tpc`` tiles from it; the original tile-outer order
    re-reads every row per tile.  MEASURED WORSE on v5e across every
    regime (32 MiB chained: binary 30.9 vs 21.9 ms, big156 16.6 vs
    13.0, english 128 MiB 47.9 vs 39.3) — interleaving ALL 32 tiles'
    probe state blows the vector register file and Mosaic spills.
    Default OFF; ``PHFPFAC_BANK_OUTER=1`` re-enables for A/B.  The
    PAYING order is the middle ground: see _tile_block()."""
    return os.environ.get("PHFPFAC_BANK_OUTER", "0") == "1"


def _tile_block(tpc: int) -> int:
    """Probe-chain interleave width (trace-time knob).

    The per-tile banked probe is a serial select chain (each bank's
    ``where`` depends on the previous), so a lone chain runs at the
    VPU's dependent-op LATENCY, not its issue rate: bench/ilp_probe.py
    measures the (row, take_along_axis, where) triple at 0.27 G/s
    traced tile-by-tile but 1.2-1.8 G/s when 2-8 independent tile
    chains interleave per bank row — Mosaic schedules close to trace
    order, so the interleave must happen at trace level.  Full
    bank-outer (all 32 tiles) spills the register file (measured
    worse, see _bank_outer); small blocks keep the working set a few
    vregs while covering the chain latency.  ``PHFPFAC_TILE_BLOCK``
    overrides for A/B."""
    v = os.environ.get("PHFPFAC_TILE_BLOCK")
    if v:
        return max(1, min(tpc, int(v)))
    return min(tpc, _TILE_BLOCK_DEFAULT)


_TILE_BLOCK_DEFAULT = 1  # flipped after hardware A/B (bench/kexp.py)


def _finish_block(tpc: int) -> int:
    """Interleave width for the verify/update (finish) chains —
    follows _tile_block unless ``PHFPFAC_FINISH_BLOCK`` overrides
    (separate knob so the probe and finish contributions can be
    attributed independently on hardware)."""
    v = os.environ.get("PHFPFAC_FINISH_BLOCK")
    if v:
        return max(1, min(tpc, int(v)))
    return _tile_block(tpc)


def trace_knob_state() -> str:
    """Resolved values of every trace-time knob that alters the
    compiled scan programs.  Part of the AOT artifact key
    (utils/aot._key): an artifact exported under one knob setting
    must never serve a process running another — the knobs change
    kernel code, not just numerics."""
    return repr((
        ("bank_outer", _bank_outer()),
        ("finish_block", os.environ.get("PHFPFAC_FINISH_BLOCK", "")),
        ("fuse", _fuse_windows()),
        ("gfloor", _group_floor()),
        ("glue", _glue_mode()),
        ("gmode", _default_gmode()),
        ("probe_merge", _probe_merge()),
        ("tile_block", os.environ.get("PHFPFAC_TILE_BLOCK",
                                      str(_TILE_BLOCK_DEFAULT))),
    ))


def _lut_multi(banks_ref, idxs, nb: int, off: int = 0, k0: int = 0):
    """pallas_scan._lut over ALL tiles at once, bank-outer order."""
    accs = [jnp.full(idxs[0].shape, -1, dtype=jnp.int32) for _ in idxs]
    return _lut_range_multi(banks_ref, idxs, accs, 0, nb, off, k0)


def _lut_blocked(banks_ref, idxs, nb: int, off: int = 0, k0: int = 0):
    """_lut over all tiles, interleaved in _tile_block()-sized blocks
    (covers the select chain's latency without spilling — see
    _tile_block)."""
    tpc = len(idxs)
    if _bank_outer():
        return _lut_multi(banks_ref, idxs, nb, off, k0)
    bl = _tile_block(tpc)
    if bl <= 1:
        return [_lut(banks_ref, idxs[i], nb, off, k0) for i in range(tpc)]
    out = []
    for b0 in range(0, tpc, bl):
        out.extend(_lut_multi(banks_ref, idxs[b0:b0 + bl], nb, off, k0))
    return out


def _lut_range_multi(banks_ref, idxs, accs, lo: int, hi: int,
                     off: int = 0, k0: int = 0):
    """_lut_range over ALL tiles at once, bank rows read once each."""
    banks = [idx >> 7 for idx in idxs]
    lanes = [idx & (_LANE - 1) for idx in idxs]
    accs = list(accs)
    for k in range(lo, hi):
        row = jnp.broadcast_to(
            banks_ref[off + k, :][None, :], idxs[0].shape
        )
        for i in range(len(idxs)):
            g = jnp.take_along_axis(row, lanes[i], axis=1)
            accs[i] = jnp.where(banks[i] == k + k0, g, accs[i])
    return accs


def _tree_max(xs: list):
    """Balanced pairwise max over tiles: log2(n) dependency depth
    instead of the serial fold's n (the fold's latency chain costs
    ~3 cycles/link on v5e — see _tile_block on why Mosaic does not
    reorder it away)."""
    xs = list(xs)
    while len(xs) > 1:
        xs = [
            jnp.maximum(xs[i], xs[i + 1]) if i + 1 < len(xs) else xs[i]
            for i in range(0, len(xs), 2)
        ]
    return xs[0]


def _group_ends(nb: int, first: int = 4, growth: int = 2) -> list:
    """Geometric bank-group boundaries: [first, ..., nb].

    The grouped scan probes group 0 unconditionally and each further
    group only while some live walker's probe bank lies beyond the
    boundary — with a profile-guided layout the hot classes sit in the
    first group(s), so the expected probed-bank count collapses to the
    HOT working set instead of the table size, at a cost of
    O(log(nb)) group checks worst-case.  ``first`` is sized from the
    trained hot span when known (StepSpec.hot_nb) so the common case
    is ONE group + one pred; ``growth`` trades mispredict cost against
    group-check/compile cost (big tables unroll every group's probes).
    """
    ends, e, size = [], 0, max(first, 2)
    while e < nb:
        e = min(e + size, nb)
        ends.append(e)
        size *= growth
    return ends


from phfpfac_tpu.compile.depth import (  # noqa: E402
    GROUP_MIN_NB as _GROUP_MIN_NB,
    group_floor as _group_floor,
)
# (single knobs shared with the trained DP cost model, compile.depth)

# gmode="capped": number of geometric groups kept as UNROLLED probe
# code before the cold dynamic-bank loop takes over (code size per
# step collapses from O(table banks) to O(hot span))
_UNROLL_GROUPS = 2


def _fuse_windows() -> bool:
    """Fused mono windows (trace-time A/B knob, default ON).

    The staged stream holds PAIR symbols, so the char a mono step at
    offset o+1 needs is already inside the window a mono step at
    offset o read: ``pairsym(o) >> CB``.  Consecutive mono steps with
    consecutive offsets therefore share ONE window build (two lane
    rotates + a select) — the second step pays a single shift and
    skips its symbol masks (its value is already < 2^CB).  With an s0
    prologue the pairing starts at the prologue's own offset-0 read,
    so a pure-mono plan builds HALF the windows.  Two fused conded
    steps also merge into one lax.cond (same pred: walkers only die,
    the shared stale pred is the sound superset the one-pred design
    already relies on)."""
    return os.environ.get("PHFPFAC_FUSE", "1") != "0"


def _pairing(steps, has_w0: bool, fuse: bool) -> dict:
    """Window-fusion pairing (see _fuse_windows): reuse_src[si] = si-1
    when step si takes its chars from step si-1's window value, -1
    when from the prologue's offset-0 window.  Shared by the kernel
    trace and by fresh_window_offsets (multi-plane staging must stage
    exactly the offsets the fused trace actually reads)."""
    reuse_src: dict = {}
    if not fuse:
        return reuse_src
    prev_off = 0 if has_w0 else None
    prev_si = -1
    for si, sp in enumerate(steps):
        off = sp.depth0 - 1
        if (sp.kind == "mono" and prev_off is not None
                and off == prev_off + 1):
            reuse_src[si] = prev_si
            prev_off = None  # the shared window covers only off+1
        elif sp.kind == "mono":
            prev_off, prev_si = off, si
        else:
            # a pair step's window at off covers off and off+1, but
            # the next step starts at off+2 — no overlap
            prev_off = None
    return reuse_src


def fresh_window_offsets(steps, fuse: bool | None = None) -> tuple:
    """Offsets at which the (fused) step trace builds a FRESH window,
    offset 0 (the prologue) included — the plane list for multi-plane
    staging."""
    if fuse is None:
        fuse = _fuse_windows()
    reuse = _pairing(steps, True, fuse)
    offs = {0}
    for si, sp in enumerate(steps):
        if si not in reuse:
            offs.add(sp.depth0 - 1)
    return tuple(sorted(offs))


def _run_steps(
    *, steps, carry, window, d_s, m_ref, s_ref,
    tpc: int, cb: int, emit_bitmap: bool, grouped: bool, gmode: str,
    cond_from: int, p0_miss: int, w0=None, fuse: bool = False,
):
    """Trace the plan's step chain over a carried (disps, outs, alive)
    tuple.  Shared by the full kernel (windows = rolled corpus tiles)
    and the compacted phase-B kernel (windows = gathered survivor
    planes); ``window(i, off)`` and the optional per-walker
    chars-remaining list ``d_s`` are the only differences.

    ``w0`` (full kernel only): the prologue's offset-0 window values,
    offered to a first mono step at offset 1 under ``fuse`` (see
    _fuse_windows)."""
    from jax.experimental import pallas as pl

    cbm = (1 << cb) - 1
    pair_mask = (1 << (2 * cb)) - 1
    any_conds = len(steps) > cond_from
    seg_on = d_s is not None

    def _geom(sp):
        """(symbol mask, fin-bit mask, value shift) for a mono step —
        split steps (col_bits > 0, the s0x d2 table) verify only the
        low symbol bits, with one spare bit keeping the -1 miss
        unaliasable (compile.plan StepSpec.col_bits)."""
        if sp.col_bits:
            return (
                (1 << sp.col_bits) - 1,
                1 << (sp.col_bits + 1),
                sp.col_bits + 2,
            )
        return cbm, 1 << cb, cb + 1

    def any_live(disps):
        """Scalar: does any walker still carry a live displacement?
        Dead walkers carry displacement 0 and live displacements
        are >= the table's dead-zone span (> 0, by construction),
        so one max-tree + scalar compare replaces per-tile
        compare/or chains."""
        return jnp.max(_tree_max(disps)) != p0_miss

    def probe_bounded(ref, idxs, off: int, nb: int, k0: int,
                      hot: int = 0):
        """Banked LUT over ONLY banks [k0, max-live-bank]: with the
        profile-guided layout hot classes sit at low displacements,
        so the dynamic bound collapses the scan to the live working
        set.  Dead walkers carry displacement 0, so their probe
        indices fall in the dead zone below k0's first boundary —
        the bound is a plain unmasked max (no live-masking vops)
        and dead lanes read the -1 init (miss)."""
        mx = jnp.max(_tree_max(idxs))  # max probe idx (dead below k0)
        banks = [idx >> 7 for idx in idxs]
        lanes = [idx & (_LANE - 1) for idx in idxs]
        if gmode == "loop":
            n = jnp.clip((mx >> 7) - k0 + 1, 0, nb)

            def body(k, accs):
                row = jnp.broadcast_to(
                    ref[pl.ds(off + k, 1), :], (_SUB, _LANE)
                )
                kk = k + k0
                return tuple(
                    jnp.where(
                        banks[i] == kk,
                        jnp.take_along_axis(row, lanes[i], axis=1),
                        accs[i],
                    )
                    for i in range(tpc)
                )

            init = tuple(
                jnp.full((_SUB, _LANE), -1, jnp.int32)
                for _ in range(tpc)
            )
            return list(jax.lax.fori_loop(0, n, body, init))
        # "geo"/"capped": unrolled geometric groups behind scalar
        # preds; first group covers the trained hot span, then x3.
        # "capped" additionally truncates the UNROLLED code after
        # a couple of groups and serves the cold tail from ONE
        # dynamic-bank fori_loop: unrolled probe code is O(full
        # table) x tpc — at Snort scale (~2000 banks) that is
        # ~200k vector instructions and the kernel goes
        # instruction-fetch-bound (measured 6x below the vop
        # model) even though the cold groups are almost never
        # probed.  The loop body is O(1) code, fires only when a
        # live walker's probe bank lies past the unrolled span,
        # and scans only up to the max live bank.
        fl = _group_floor()
        # floor >= 2 keeps the +1 mispredict margin over the ceil'd hot
        # span; floor 1 probes EXACTLY the hot span and lets the
        # near-free scalar group pred catch the boundary (gathers cost
        # ~4-6 cycles/bank, the pred ~nothing — bench/lane_probe.py)
        first = max(fl, hot + 1) if fl >= 2 else max(1, hot)
        ends = _group_ends(nb, first=first, growth=3)
        if gmode == "capped" and len(ends) > _UNROLL_GROUPS:
            ends, tail_lo = ends[:_UNROLL_GROUPS], ends[_UNROLL_GROUPS - 1]
        else:
            tail_lo = None

        def range_probe(accs, lo, hi):
            if _bank_outer():
                return tuple(
                    _lut_range_multi(ref, idxs, list(accs), lo, hi,
                                     off, k0)
                )
            bl = _tile_block(tpc)
            if bl > 1:
                out = []
                for b0 in range(0, tpc, bl):
                    out.extend(_lut_range_multi(
                        ref, idxs[b0:b0 + bl], list(accs[b0:b0 + bl]),
                        lo, hi, off, k0,
                    ))
                return tuple(out)
            return tuple(
                _lut_range(ref, idxs[i], accs[i], lo, hi, off, k0)
                for i in range(tpc)
            )

        accs = range_probe(
            tuple(
                jnp.full(idxs[i].shape, -1, jnp.int32)
                for i in range(tpc)
            ),
            0, ends[0],
        )
        for lo, hi in zip(ends[:-1], ends[1:]):
            def probe(accs, lo=lo, hi=hi):
                return range_probe(accs, lo, hi)

            accs = jax.lax.cond(
                mx >= ((k0 + lo) << 7), probe, lambda a: a, accs
            )
        if tail_lo is not None:
            def cold(accs, lo=tail_lo):
                n_hi = jnp.clip((mx >> 7) - k0 + 1, lo, nb)

                def body(k, accs):
                    row = jnp.broadcast_to(
                        ref[pl.ds(off + k, 1), :], (_SUB, _LANE)
                    )
                    kk = k + k0
                    return tuple(
                        jnp.where(
                            banks[i] == kk,
                            jnp.take_along_axis(row, lanes[i], axis=1),
                            accs[i],
                        )
                        for i in range(tpc)
                    )

                return jax.lax.fori_loop(lo, n_hi, body, accs)

            accs = jax.lax.cond(
                mx >= ((k0 + tail_lo) << 7), cold, lambda a: a, accs
            )
        return list(accs)

    def finish(sp, cur, disp, out, g, w, ok2=None, pm=False):
        """Verify probe g (side word w for pair steps), update the
        per-tile output accumulator, chain disp.  No ``g >= 0``
        guard: compile guarantees every real symbol is strictly
        below the sym-field mask (collect_alphabet), so the -1 miss
        can never verify.  ``pm``: cur is already a bare < 2^CB
        symbol (fused second step) — skip the mask."""
        bit0 = sp.depth0 - 1
        if sp.kind == "mono":
            # one masked compare against sym and sym|finbit each:
            # saves an op vs extracting the fin bit separately
            cmask, finm, vsh = _geom(sp)
            sym = cur if (pm and not sp.col_bits) else cur & cmask
            gs = g & ((1 << vsh) - 1)
            fin = gs == (sym | finm)
            hit = (gs == sym) | fin
            if emit_bitmap:
                out = out | jnp.where(fin, jnp.int32(1) << bit0, 0)
            else:
                out = out + fin.astype(jnp.int32)
            disp = jnp.where(
                hit, jax.lax.shift_right_logical(g, vsh), sp.miss
            )
        else:
            # nibble side entries store (code & 7) + 1 — sound via
            # the layout's mod-8 anti-aliasing
            a1 = cur & cbm
            sidx = disp + a1
            if sp.s_nibble:
                nib = (
                    jax.lax.shift_right_logical(w, (sidx & 7) << 2)
                ) & 15
                fin_mid = nib == (a1 & 7) + 1
            else:
                byte = (
                    jax.lax.shift_right_logical(w, (sidx & 3) << 3)
                ) & 255
                fin_mid = byte == a1 + 1
            gs = g & (pair_mask | (1 << (2 * cb)))
            fin_end = gs == (cur | (1 << (2 * cb)))
            hit = (gs == cur) | fin_end
            if ok2 is not None:
                # segment cut between the pair's two chars: the mid
                # completion stands, the end match and chain do not
                hit = hit & ok2
                fin_end = fin_end & ok2
            if emit_bitmap:
                out = (
                    out
                    | jnp.where(fin_mid, jnp.int32(1) << bit0, 0)
                    | jnp.where(fin_end, jnp.int32(1) << (bit0 + 1), 0)
                )
            else:
                out = (
                    out + fin_mid.astype(jnp.int32)
                    + fin_end.astype(jnp.int32)
                )
            disp = jnp.where(
                hit, jax.lax.shift_right_logical(g, 2 * cb + 1), sp.miss
            )
        return disp, out

    def finish_blk(sp, curs, disps, outs, gs, ws, ok2s, pm=False):
        """finish() over a block of tiles, traced OP-WISE (each op for
        every tile in the block before the next op): like the probe's
        _tile_block interleave, this covers the verify/update chain's
        op latency with the neighbours' independent work instead of
        stalling on it (see _tile_block)."""
        m = len(curs)
        bit0 = sp.depth0 - 1
        if sp.kind == "mono":
            cmask, finm, vsh = _geom(sp)
            syms = (
                curs if (pm and not sp.col_bits)
                else [c & cmask for c in curs]
            )
            gss = [g & ((1 << vsh) - 1) for g in gs]
            fins = [gss[i] == (syms[i] | finm) for i in range(m)]
            hits = [(gss[i] == syms[i]) | fins[i] for i in range(m)]
            if emit_bitmap:
                outs = [
                    outs[i] | jnp.where(fins[i], jnp.int32(1) << bit0, 0)
                    for i in range(m)
                ]
            else:
                outs = [outs[i] + fins[i].astype(jnp.int32)
                        for i in range(m)]
            disps = [
                jnp.where(
                    hits[i],
                    jax.lax.shift_right_logical(gs[i], vsh), sp.miss,
                )
                for i in range(m)
            ]
            return disps, outs
        a1s = [c & cbm for c in curs]
        sidxs = [disps[i] + a1s[i] for i in range(m)]
        if sp.s_nibble:
            fms = [
                (jax.lax.shift_right_logical(ws[i], (sidxs[i] & 7) << 2)
                 & 15) == (a1s[i] & 7) + 1
                for i in range(m)
            ]
        else:
            fms = [
                (jax.lax.shift_right_logical(ws[i], (sidxs[i] & 3) << 3)
                 & 255) == a1s[i] + 1
                for i in range(m)
            ]
        gss = [g & (pair_mask | (1 << (2 * cb))) for g in gs]
        fes = [gss[i] == (curs[i] | (1 << (2 * cb))) for i in range(m)]
        hits = [(gss[i] == curs[i]) | fes[i] for i in range(m)]
        if ok2s is not None:
            hits = [hits[i] & ok2s[i] for i in range(m)]
            fes = [fes[i] & ok2s[i] for i in range(m)]
        if emit_bitmap:
            outs = [
                outs[i]
                | jnp.where(fms[i], jnp.int32(1) << bit0, 0)
                | jnp.where(fes[i], jnp.int32(1) << (bit0 + 1), 0)
                for i in range(m)
            ]
        else:
            outs = [
                outs[i] + fms[i].astype(jnp.int32) + fes[i].astype(jnp.int32)
                for i in range(m)
            ]
        disps = [
            jnp.where(
                hits[i],
                jax.lax.shift_right_logical(gs[i], 2 * cb + 1), sp.miss,
            )
            for i in range(m)
        ]
        return disps, outs

    def make_step(si: int, sp, *, from_prev: bool = False,
                  want_curs: bool = False):
        off_chars = sp.depth0 - 1
        bounding = grouped and gmode != "none"
        bound_main = bounding and sp.nb >= _GROUP_MIN_NB
        bound_side = (
            sp.kind == "pair" and bounding and sp.s_nb >= _GROUP_MIN_NB
        )
        # the conds' pred is the liveness AFTER the last unconditional
        # step, computed ONCE and reused: walkers only ever die, so a
        # stale pred is a sound superset (never skips a live cell),
        # and past the auto cond_from the live fraction is flat — the
        # few surviving walkers rarely die mid-tail, so re-computing
        # any_live per conded step bought ~nothing and cost a 32-tile
        # max-reduction per step per cell (~35 vops; big156 paid 9)
        need_alive = any_conds and si == cond_from - 1
        wshift = 3 if sp.s_nibble else 2

        def step(carry, curs_in=None):
            disps, outs = list(carry[0]), list(carry[1])
            if seg_on:
                disps = [
                    jnp.where(d_s[i] > off_chars, disps[i], sp.miss)
                    for i in range(tpc)
                ]
            if from_prev:
                # fused second step: the previous step's window at
                # offset-1 already holds this step's char in its high
                # half — one shift replaces the window build, and the
                # bare < 2^CB value needs no symbol masks (pm=True)
                curs = [
                    jax.lax.shift_right_logical(c, cb) for c in curs_in
                ]
            else:
                curs = [window(i, off_chars) for i in range(tpc)]
            if sp.kind == "mono":
                if sp.col_bits:
                    cm = (1 << sp.col_bits) - 1
                    idxs = [
                        disps[i] + (curs[i] & cm) for i in range(tpc)
                    ]
                elif from_prev:
                    idxs = [disps[i] + curs[i] for i in range(tpc)]
                else:
                    idxs = [
                        disps[i] + (curs[i] & cbm) for i in range(tpc)
                    ]
            else:
                idxs = [disps[i] + curs[i] for i in range(tpc)]
            if bound_main:
                gs = probe_bounded(
                    m_ref, idxs, sp.off, sp.nb, sp.k0,
                    hot=sp.hot_nb,
                )
            else:
                gs = _lut_blocked(m_ref, idxs, sp.nb, sp.off, sp.k0)
            ws = [None] * tpc
            if sp.kind == "pair":
                widxs = [
                    jax.lax.shift_right_logical(
                        disps[i] + (curs[i] & cbm), wshift
                    )
                    for i in range(tpc)
                ]
                if bound_side:
                    ws = probe_bounded(
                        s_ref, widxs, sp.s_off, sp.s_nb,
                        sp.s_k0, hot=sp.s_hot_nb,
                    )
                else:
                    ws = _lut_blocked(s_ref, widxs, sp.s_nb, sp.s_off,
                                      sp.s_k0)
            fb = _finish_block(tpc)
            if fb > 1:
                for b0 in range(0, tpc, fb):
                    sl = slice(b0, b0 + fb)
                    ok2s = None
                    if seg_on and sp.kind == "pair":
                        ok2s = [d_s[i] > off_chars + 1
                                for i in range(b0, min(b0 + fb, tpc))]
                    disps[sl], outs[sl] = finish_blk(
                        sp, curs[sl], disps[sl], outs[sl], gs[sl],
                        ws[sl], ok2s, pm=from_prev,
                    )
            else:
                for i in range(tpc):
                    ok2 = None
                    if seg_on and sp.kind == "pair":
                        ok2 = d_s[i] > off_chars + 1
                    disps[i], outs[i] = finish(
                        sp, curs[i], disps[i], outs[i], gs[i], ws[i],
                        ok2, pm=from_prev,
                    )
            alive = any_live(disps) if need_alive else carry[2]
            out = (tuple(disps), tuple(outs), alive)
            return (out, curs) if want_curs else out

        return step

    # ---- window-fusion pairing (see _fuse_windows / _pairing) -----------
    reuse_src = _pairing(steps, w0 is not None, fuse)

    if any_conds and cond_from == 0:
        carry = (carry[0], carry[1], any_live(list(carry[0])))
    si = 0
    n = len(steps)
    while si < n:
        sp = steps[si]
        if reuse_src.get(si) == -1:
            # first step takes its chars straight from the prologue's
            # offset-0 window values
            body = make_step(si, sp, from_prev=True)
            if si < cond_from:
                carry = body(carry, w0)
            else:
                carry = jax.lax.cond(
                    carry[2], lambda c, b=body: b(c, w0),
                    lambda c: c, carry,
                )
            si += 1
            continue
        fused = si + 1 < n and reuse_src.get(si + 1) == si
        if not fused:
            body = make_step(si, sp)
            if si < cond_from:
                carry = body(carry)
            else:
                carry = jax.lax.cond(carry[2], body, lambda c: c, carry)
            si += 1
            continue
        b1 = make_step(si, sp, want_curs=True)
        b2 = make_step(si + 1, steps[si + 1], from_prev=True)
        if si >= cond_from:
            # both conded: ONE lax.cond wraps the fused pair (same
            # stale pred; the window value never crosses a cond edge)
            def unit(c, b1=b1, b2=b2):
                c, curs = b1(c)
                return b2(c, curs)

            carry = jax.lax.cond(carry[2], unit, lambda c: c, carry)
        else:
            carry, curs = b1(carry)
            if si + 1 >= cond_from:
                # boundary crossing: the unconditional first step's
                # window value is closed over by the second's cond body
                carry = jax.lax.cond(
                    carry[2], lambda c, b=b2, w=curs: b(c, w),
                    lambda c: c, carry,
                )
            else:
                carry = b2(carry, curs)
        si += 2
    return carry


def _make_plan_kernel(
    *,
    steps: tuple,  # tuple[StepSpec]
    nb_p0: int, cb: int, p0_miss: int, p0_mode: str,
    emit_bitmap: bool, tiles_per_cell: int, cond_from: int,
    grouped: bool = False, gmode: str = "geo",
    seg_bytes: int = 0, halo_bytes: int = 0,
    emit_surv: bool = False, stage16: bool = False,
    planes: tuple = (),
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tpc = tiles_per_cell
    cbm = (1 << cb) - 1
    # multi-plane staged input (stage_planes): the pair stream
    # pre-shifted at every fresh window offset, cell-major — window()
    # becomes one VMEM block read, no rotates/select/halo
    mp = bool(planes)
    assert not (mp and stage16), "multi-plane staging is int32-only"
    pidx = {off: j for j, off in enumerate(planes)}
    # segment truncation (reference master_kernel.cu:141-144): walks may
    # read only chars below segment_end + halo.  Chars past input_size
    # die via the staging pad, so the in-kernel limit needs no
    # input_size term.  seg_bytes == 0 = exact mode.
    seg_on = seg_bytes > 0
    if seg_on:
        assert seg_bytes & (seg_bytes - 1) == 0, "segment must be 2^k"

    def kernel(in_ref, halo_ref, shift_ref, p0_ref, m_ref, s_ref, *refs):
        cell = pl.program_id(0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)

        rpc = _SUB * tpc
        if stage16:
            # int16-staged input: widen the cell's block (plus its int32
            # halo rows) into an int32 VMEM scratch ONCE — tile reads,
            # window rolls and re-read discipline below are unchanged,
            # while the HBM->VMEM stream that fed in_ref is half-width.
            *out_refs, buf_ref = refs
            buf_ref[pl.ds(0, rpc), :] = in_ref[:].astype(jnp.int32)
            buf_ref[pl.ds(rpc, _SUB), :] = halo_ref[:]
        else:
            out_refs = refs
        d_s = None
        if seg_on:
            # chars-remaining-before-cut per walker: a step consuming
            # char offset o is allowed iff d > o (one compare per step)
            d_s = []
            for i in range(tpc):
                pos = (cell * tpc + i) * TILE + sub * _LANE + lane
                lim = (pos & ~(seg_bytes - 1)) + (seg_bytes + halo_bytes)
                d_s.append(lim - pos)

        def tile_a(i: int):
            if mp:
                return in_ref[pl.ds(pidx[0] * rpc + i * _SUB, _SUB), :]
            if stage16:
                return buf_ref[pl.ds(i * _SUB, _SUB), :]
            return in_ref[pl.ds(i * _SUB, _SUB), :]

        def tile_b(i: int):
            if stage16:
                # halo rows sit directly after the cell's rpc rows in
                # the scratch, so even the last tile's +1-row read is
                # one contiguous slice
                return buf_ref[pl.ds(i * _SUB + 1, _SUB), :]
            if i < tpc - 1:
                return in_ref[pl.ds(i * _SUB + 1, _SUB), :]
            return jnp.concatenate(
                [in_ref[pl.ds(rpc - _SUB + 1, _SUB - 1), :],
                 halo_ref[0:1, :]], axis=0
            )

        def window(i: int, off: int):
            """Tile i's pair-symbol stream at position p+off.

            Two static lane rotates + one static-mask select over the
            tile's row blocks, which are RE-READ from the VMEM ref
            inside each step body: ref reads are effect-ordered, so a
            long plan's windows cannot all be hoisted ahead of the
            early-exit conds (pure-value windows were — 20-step plans
            spilled the whole window set and ran 2x slower)."""
            if mp:
                # pre-shifted plane: one block read, no rotates
                return in_ref[pl.ds(pidx[off] * rpc + i * _SUB, _SUB), :]
            if off == 0:
                return tile_a(i)
            ra = pltpu.roll(tile_a(i), _LANE - off, axis=1)
            rb = pltpu.roll(tile_b(i), _LANE - off, axis=1)
            return jnp.where(lane < _LANE - off, ra, rb)

        # prologue (offset 0): dense depths-1+2 probe, or a 1-bank
        # code-indexed s0 probe for wide alphabets.  p0_miss is THE
        # plan-wide dead sentinel (compile.plan builds every table
        # strictly below it).
        disps, outs = [], []
        curs0 = [tile_a(i) for i in range(tpc)]
        if p0_mode == "dense":
            probe0 = curs0
        elif p0_mode == "s0x":
            # two-byte-addressed prologue: p0x[(code1 << S_bits) |
            # (code2 >> 6)] — the high bits of the SECOND char choose
            # the split d2 sub-row (compile.plan "s0x split prologue")
            sb = cb - 6
            probe0 = [
                ((c & cbm) << sb)
                | ((jax.lax.shift_right_logical(c, cb + 6))
                   & ((1 << sb) - 1))
                for c in curs0
            ]
        else:
            probe0 = [c & cbm for c in curs0]
        vs0 = _lut_blocked(p0_ref, probe0, nb_p0)
        for i in range(tpc):
            if p0_mode == "dense":
                v = vs0[i]
                alive = v >= 0
                fin1 = alive & ((v & 1) == 1)
                fin2 = alive & ((v & 2) == 2)
                if seg_on:
                    fin2 = fin2 & (d_s[i] > 1)
                if emit_bitmap:
                    outs.append(
                        fin1.astype(jnp.int32) | jnp.where(fin2, 2, 0)
                    )
                else:
                    outs.append(
                        fin1.astype(jnp.int32) + fin2.astype(jnp.int32)
                    )
                disps.append(
                    jnp.where(
                        alive, jax.lax.shift_right_logical(v, 2), p0_miss
                    )
                )
            else:
                v = vs0[i]
                alive = v >= 0
                fin1 = alive & ((v & 1) == 1)
                outs.append(fin1.astype(jnp.int32))
                disps.append(
                    jnp.where(
                        alive, jax.lax.shift_right_logical(v, 1), p0_miss
                    )
                )

        carry = _run_steps(
            steps=steps, carry=(tuple(disps), tuple(outs), jnp.bool_(True)),
            window=window, d_s=d_s, m_ref=m_ref, s_ref=s_ref,
            tpc=tpc, cb=cb, emit_bitmap=emit_bitmap, grouped=grouped,
            gmode=gmode, cond_from=cond_from, p0_miss=p0_miss,
            w0=curs0, fuse=_fuse_windows(),
        )
        outs = carry[1]

        if emit_bitmap:
            if emit_surv:
                cnt_ref, bits_ref, surv_ref = out_refs
            else:
                cnt_ref, bits_ref = out_refs
            for i in range(tpc):
                cnt_ref[pl.ds(i * _SUB, _SUB), :] = (
                    jax.lax.population_count(outs[i])
                )
                bits_ref[pl.ds(i * _SUB, _SUB), :] = outs[i]
        else:
            if emit_surv:
                partial_ref, surv_ref = out_refs
            else:
                (partial_ref,) = out_refs
            shift = shift_ref[0]
            parts = []
            for i in range(tpc):
                pos = (cell * tpc + i) * TILE + sub * _LANE + lane
                parts.append(jnp.where(pos >= shift, outs[i], 0))
            # balanced add tree: the serial fold's 32-link latency
            # chain costs real cycles (see _tree_max)
            while len(parts) > 1:
                parts = [
                    parts[i] + parts[i + 1] if i + 1 < len(parts)
                    else parts[i]
                    for i in range(0, len(parts), 2)
                ]
            partial_ref[:, :] = parts[0]
        if emit_surv:
            # displacements entering the first phase-B step (0 = dead):
            # the compacted continuation picks these up after the glue
            for i in range(tpc):
                surv_ref[pl.ds(i * _SUB, _SUB), :] = carry[0][i]

    return kernel


_STATICS = (
    "steps", "nb_p0", "cb", "p0_miss", "p0_mode", "interpret", "tpc",
    "cond_from", "grouped", "gmode", "seg_bytes", "halo_bytes", "stage16",
    "planes",
)


def resolve_cond_from(pt: PlanTables, cond_from) -> int:
    """"auto" -> the first step whose trained live-walker fraction
    drops below ~3 walkers per 32k-position cell (1e-4): earlier conds
    would never skip, later ones leave dead cells paying full steps.
    Untrained tables keep the measured english default (4)."""
    if cond_from != "auto":
        return int(cond_from)
    if not pt.live_frac:
        return 4
    for i, f in enumerate(pt.live_frac):
        if f < 1e-4:
            return max(i, 1)
    return 4


# cost-model sweeps (bench/costsim.py --compact-sweep) put the optimum
# cut where ~4-7% of walkers survive: earlier, the glue gathers too
# many; later, phase A keeps paying dominant deep steps.  The pow2 cap
# bucket adds up to 2x on top of the margin; overflow falls back.
_COMPACT_MARGIN = 2.5  # cap = margin x trained survivor estimate
_COMPACT_MAX_FRAC = 0.05  # cut where <= ~5% of walkers survive

# Round-2 hardware measurement (bench/r2_results.log): the fused
# two-phase program runs ~70x SLOWER than the plain scan on the real
# v5e (english 32 MiB: 1049 ms vs 14.7 ms) even though the isolated
# glue times at 0.15 ms (bench/glue_cal.py) — see bench/compact_diag.py
# for the piece-by-piece breakdown.  Until the regression is fixed
# in-kernel, "auto" engages only with explicit opt-in; explicit
# (cut, cap) / int cuts are untouched (tests, tuning, diagnosis).
_AUTO_OPT_IN = "PHFPFAC_COMPACT_AUTO"


def resolve_compact(pt: PlanTables, n_pos: int, compact="auto",
                    tpc_b: int = 8):
    """Choose the two-phase cut: -> (cut_step, cap) or None.

    "auto" cuts at the first step whose trained live-walker fraction
    drops to ~5% (_COMPACT_MAX_FRAC) — early enough that most
    deep-step vops move to the compacted phase, late enough that the
    survivor cap (and with it the glue's gather traffic) stays a few
    % of the corpus.  The cap carries a 2.5x margin
    (_COMPACT_MARGIN) over the trained estimate, plus up to 2x from
    pow2 bucketing; the TRUE count is returned by the scan so callers
    rescan uncompacted on overflow (train/scan corpus mismatch),
    never losing matches."""
    if compact in (None, 0, "off", False):
        return None
    block = tpc_b * TILE
    if isinstance(compact, tuple):  # explicit (cut, cap) — tests/tuning
        cut, cap = compact
        assert cap % block == 0
        return (cut, cap) if 1 <= cut < len(pt.steps) else None
    if isinstance(compact, int) and not isinstance(compact, bool):
        cut = compact
        frac = (
            pt.live_frac[cut]
            if pt.trained and cut < len(pt.live_frac) else _COMPACT_MAX_FRAC
        )
    else:
        if os.environ.get(_AUTO_OPT_IN) != "1":
            return None  # measured regression — see _AUTO_OPT_IN note
        if not pt.trained or not pt.live_frac:
            return None
        cut = None
        for i, f in enumerate(pt.live_frac):
            if i >= 1 and f <= _COMPACT_MAX_FRAC:
                cut = i
                break
        if cut is None:
            return None
        frac = pt.live_frac[cut]
    if not (1 <= cut < len(pt.steps)):
        return None
    cap = max(_COMPACT_MARGIN * frac * n_pos, 2 * block)
    # bucket to powers of two (bounds recompiles across input sizes)
    b = block
    while b < cap:
        b <<= 1
    cap = b
    if cap * 2 >= n_pos:
        return None  # survivors too dense for compaction to pay
    return cut, cap


def _default_gmode() -> str:
    """Bounded-scan strategy for big tables: "capped" = geometric
    groups with only the first _UNROLL_GROUPS unrolled, cold tail via
    one dynamic-bank fori_loop (default — keeps probe CODE O(hot
    span), which is what lets Snort-scale tables run at the vop model
    instead of instruction-fetch-bound); "geo" = fully unrolled
    geometric groups behind scalar preds (measured 1.31 vs 0.90 GB/s
    unbounded on english 8 MiB, but ~200k instructions at Snort
    scale); "loop" = fori_loop over ALL banks with a dynamic bound
    (measured FAR slower as the main path — dynamic row loads defeat
    Mosaic pipelining — which is why "capped" fires its loop only for
    cold spills); "none" = unbounded full scans (diagnostic)."""
    import os

    return os.environ.get("PHFPFAC_GMODE", "capped")


def _specs(tpc, stage16: bool = False, n_planes: int = 0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if n_planes:
        # multi-plane staging: one block per cell carrying every
        # pre-shifted plane; the halo slot gets a dead (8,128) view
        return [
            pl.BlockSpec(
                (n_planes * tpc * _SUB, _LANE), lambda i: (i, 0)
            ),
            pl.BlockSpec((_SUB, _LANE), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
    if stage16:
        # int16 main block; halo comes from the separately staged
        # int32 per-cell halo array (stage_pairs16), not from a second
        # view of the main array
        return [
            pl.BlockSpec((tpc * _SUB, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
    return [
        pl.BlockSpec((tpc * _SUB, _LANE), lambda i: (i, 0)),
        pl.BlockSpec((_SUB, _LANE), lambda i, t=tpc: (i * t + t, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=_STATICS)
def _plan_scan_bitmap(
    data2d, s0_dummy, p0_banks, packed_banks, side_banks,
    *, steps, nb_p0, cb, p0_miss, p0_mode, interpret, tpc, cond_from,
    grouped=False, gmode="geo", seg_bytes=0, halo_bytes=0,
    stage16=False,  # accepted for statics-dict symmetry; bitmap paths stage int32
    planes=(),
):
    from jax.experimental import pallas as pl

    if planes:
        n_cells = data2d.shape[0] // (len(planes) * tpc * _SUB)
    else:
        n_cells, tpc = _common(data2d, tpc)
    kernel = _make_plan_kernel(
        steps=steps, nb_p0=nb_p0, cb=cb, p0_miss=p0_miss, p0_mode=p0_mode,
        emit_bitmap=True, tiles_per_cell=tpc, cond_from=cond_from,
        grouped=grouped, gmode=gmode, seg_bytes=seg_bytes,
        halo_bytes=halo_bytes, planes=planes,
    )
    rows_pc = tpc * _SUB
    cnt, bits = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=_specs(tpc, n_planes=len(planes)),
        out_specs=(
            pl.BlockSpec((rows_pc, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((rows_pc, _LANE), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_cells * rows_pc, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((n_cells * rows_pc, _LANE), jnp.int32),
        ),
        interpret=interpret,
    )(data2d, data2d, s0_dummy, p0_banks, packed_banks, side_banks)
    return cnt.reshape(-1), bits.reshape(-1)


def _make_planb_kernel(
    *, steps: tuple, plane: dict, n_offs: int, cb: int, p0_miss: int,
    tpc: int, cond_from: int, grouped: bool, gmode: str, seg: bool,
):
    """Compacted phase-B kernel: finish the deep steps over survivor
    tiles.  Each grid cell covers ``tpc`` tiles of 1024 survivors;
    inputs are the glue's gathered window planes (one (8,128) block
    per tile per step offset), the survivors' carried displacements,
    and (segment mode) their chars-remaining-before-cut."""
    from jax.experimental import pallas as pl

    def kernel(g_ref, d_ref, lim_ref, m_ref, s_ref, bits_ref):
        def window(i: int, off: int):
            # survivor windows were gathered by position in the glue;
            # re-read per step body (same hoisting discipline as the
            # full kernel's rolled windows)
            return g_ref[pl.ds((i * n_offs + plane[off]) * _SUB, _SUB), :]

        d_s = None
        if seg:
            d_s = [
                lim_ref[pl.ds(i * _SUB, _SUB), :] for i in range(tpc)
            ]
        disps = [d_ref[pl.ds(i * _SUB, _SUB), :] for i in range(tpc)]
        outs = [jnp.zeros((_SUB, _LANE), jnp.int32) for _ in range(tpc)]
        carry = _run_steps(
            steps=steps, carry=(tuple(disps), tuple(outs), jnp.bool_(True)),
            window=window, d_s=d_s, m_ref=m_ref, s_ref=s_ref,
            tpc=tpc, cb=cb, emit_bitmap=True, grouped=grouped,
            gmode=gmode, cond_from=cond_from, p0_miss=p0_miss,
        )
        for i in range(tpc):
            bits_ref[pl.ds(i * _SUB, _SUB), :] = carry[1][i]

    return kernel


def _glue_mode() -> str:
    """Survivor-compaction strategy for the glue (A/B knob, read at
    trace time).  "nonzero" (default): jnp.nonzero = one cumsum over
    every position — XLA lowers big cumsums to a log-pass associative
    scan, whose HBM traffic may dominate the glue.  "mxu": in-block
    survivor ranks via ONE (256,256) triangular matmul per block row
    (0/1 vectors, sums <= 256: exact in bf16 on the MXU) + a short
    block-level cumsum — O(1) elementwise passes over the corpus
    regardless of size."""
    import os

    return os.environ.get("PHFPFAC_GLUE", "nonzero")


def _compact_positions(live, cap: int):
    """Positions of the first ``cap`` True lanes, ascending, padded
    with N (the drop sentinel) — both strategies return identical
    arrays (tests/test_plan.py pins them)."""
    N = live.shape[0]
    if _glue_mode() != "mxu":
        return jnp.nonzero(
            live, size=cap, fill_value=N
        )[0].astype(jnp.int32)
    B = 256
    assert N % B == 0
    lv = live.reshape(N // B, B).astype(jnp.bfloat16)
    incl = jnp.dot(
        lv, jnp.triu(jnp.ones((B, B), jnp.bfloat16))
    )  # incl[i, j] = # live lanes <= j in block i (exact: <= 256)
    counts = incl[:, -1].astype(jnp.int32)
    starts = jnp.cumsum(counts) - counts  # short scan: N/256 elements
    dest = starts[:, None] + (incl.astype(jnp.int32)
                              - lv.astype(jnp.int32))
    dest = jnp.where(live.reshape(N // B, B), dest, cap + B)
    return (
        jnp.full((cap,), N, jnp.int32)
        .at[dest.reshape(-1)]
        .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    )


def _phase_b(
    data2d, surv, packed_banks, side_banks,
    *, steps_b, cb, p0_miss, interpret, grouped, gmode,
    seg_bytes, halo_bytes, cap, tpc_b,
):
    """XLA glue + phase-B dispatch: compact live walkers out of the
    phase-A survivor plane, gather their window planes from the staged
    pair stream, finish the deep steps densely, and return the
    per-survivor deep bits with their positions (for the scatter
    merge) and the true survivor count (host overflow check).

    The TPU analog of per-walker gating the roofline asks for: the
    vector unit cannot skip dead lanes in place, so survivors are
    MOVED to dense tiles instead (nonzero + gather at HBM speed), and
    the deep steps pay O(survivors), not O(positions)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert cap % (tpc_b * TILE) == 0 and cap > 0
    N = surv.shape[0]
    flat = data2d.reshape(-1)
    live = surv != 0
    count = live.sum()
    pos = _compact_positions(live, cap)
    posc = jnp.minimum(pos, N - 1)
    disp_b = jnp.where(pos < N, surv[posc], 0)
    offs_list = sorted({sp.depth0 - 1 for sp in steps_b})
    n_offs = len(offs_list)
    # window planes: staged pair symbols at pos+off.  The staged
    # stream has a spare tile past the last position (staged_rows) and
    # step offsets are < 32, so the clip only guards filler rows.
    # ONE 1-D gather per offset, NOT a single (cap, n_offs) batched
    # gather: XLA lowers the batched form through a slow per-element
    # path (round-2 hardware: the fused compacted scan ran 70x slower
    # than its parts; bench/compact_diag.py), while plain 1-D gathers
    # ride the fast gather engine (bench/glue_cal.py: 8.4M gathers in
    # ~0.15 ms).  Stacking on a new axis also replaces the big
    # (n_t, SUB, LANE, n_offs) transpose with n_offs sequential copies.
    n_t = cap // TILE
    lim = flat.shape[0] - 1
    g_t = jnp.stack(
        [
            flat[jnp.minimum(posc + off, lim)].reshape(n_t, _SUB, _LANE)
            for off in offs_list
        ],
        axis=1,
    ).reshape(n_t * n_offs * _SUB, _LANE)
    d_b = disp_b.reshape(n_t * _SUB, _LANE)
    if seg_bytes:
        lim = (pos & ~(seg_bytes - 1)) + (seg_bytes + halo_bytes) - pos
        lim_b = lim.reshape(n_t * _SUB, _LANE)
    else:
        lim_b = jnp.zeros((n_t * _SUB, _LANE), jnp.int32)
    # cond_from=0: even the first deep step sits behind the liveness
    # cond, so the cap's FILLER tiles (cap is 2.5-5x the estimate) pay
    # one any_live reduction and nothing else
    kernel_b = _make_planb_kernel(
        steps=steps_b, plane={o: j for j, o in enumerate(offs_list)},
        n_offs=n_offs, cb=cb, p0_miss=p0_miss, tpc=tpc_b, cond_from=0,
        grouped=grouped, gmode=gmode, seg=seg_bytes > 0,
    )
    bits_b = pl.pallas_call(
        kernel_b,
        grid=(n_t // tpc_b,),
        in_specs=[
            pl.BlockSpec((tpc_b * n_offs * _SUB, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((tpc_b * _SUB, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((tpc_b * _SUB, _LANE), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tpc_b * _SUB, _LANE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_t * _SUB, _LANE), jnp.int32),
        interpret=interpret,
    )(g_t, d_b, lim_b, packed_banks, side_banks)
    return bits_b.reshape(-1), pos, count


_STATICS_C = _STATICS + ("cut", "cap", "tpc_b")


@functools.partial(jax.jit, static_argnames=_STATICS_C)
def _plan_scan_bitmap_compact(
    data2d, s0_dummy, p0_banks, packed_banks, side_banks,
    *, steps, nb_p0, cb, p0_miss, p0_mode, interpret, tpc, cond_from,
    grouped=False, gmode="geo", seg_bytes=0, halo_bytes=0,
    cut=0, cap=0, tpc_b=8, stage16=False, planes=(),
):
    """Two-phase compacted bitmap scan.  Returns (cnt, bits, count):
    ``count`` is the TRUE survivor total at the cut — the caller must
    rescan uncompacted when count > cap (fallback, never silent
    truncation)."""
    assert not planes, "compacted scans use the position-linear staging"
    from jax.experimental import pallas as pl

    n_cells, tpc = _common(data2d, tpc)
    steps_a, steps_b = steps[:cut], steps[cut:]
    kernel = _make_plan_kernel(
        steps=steps_a, nb_p0=nb_p0, cb=cb, p0_miss=p0_miss, p0_mode=p0_mode,
        emit_bitmap=True, tiles_per_cell=tpc,
        cond_from=min(cond_from, cut), grouped=grouped, gmode=gmode,
        seg_bytes=seg_bytes, halo_bytes=halo_bytes, emit_surv=True,
    )
    rows_pc = tpc * _SUB
    shape = jax.ShapeDtypeStruct((n_cells * rows_pc, _LANE), jnp.int32)
    cnt, bits, surv = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=_specs(tpc),
        out_specs=tuple(
            pl.BlockSpec((rows_pc, _LANE), lambda i: (i, 0))
            for _ in range(3)
        ),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(data2d, data2d, s0_dummy, p0_banks, packed_banks, side_banks)
    cnt, bits = cnt.reshape(-1), bits.reshape(-1)
    bits_b, pos, count = _phase_b(
        data2d, surv.reshape(-1), packed_banks, side_banks,
        steps_b=steps_b, cb=cb, p0_miss=p0_miss, interpret=interpret,
        grouped=grouped, gmode=gmode, seg_bytes=seg_bytes,
        halo_bytes=halo_bytes, cap=cap, tpc_b=tpc_b,
    )
    # shallow and deep length bits live in disjoint bit ranges, so
    # scatter-ADD is exactly bitwise OR; filler rows (pos == N) drop
    bits = bits.at[pos].add(bits_b, mode="drop")
    cnt = cnt.at[pos].add(
        jax.lax.population_count(bits_b), mode="drop"
    )
    return cnt, bits, count


@functools.partial(jax.jit, static_argnames=_STATICS_C)
def _plan_scan_count_compact(
    data2d, shift, p0_banks, packed_banks, side_banks,
    *, steps, nb_p0, cb, p0_miss, p0_mode, interpret, tpc, cond_from,
    grouped=False, gmode="geo", seg_bytes=0, halo_bytes=0,
    cut=0, cap=0, tpc_b=8, stage16=False, planes=(),
):
    """Two-phase compacted count scan.  Returns (total, count)."""
    assert not planes, "compacted scans use the position-linear staging"
    from jax.experimental import pallas as pl

    n_cells, tpc = _common(data2d, tpc)
    steps_a, steps_b = steps[:cut], steps[cut:]
    kernel = _make_plan_kernel(
        steps=steps_a, nb_p0=nb_p0, cb=cb, p0_miss=p0_miss, p0_mode=p0_mode,
        emit_bitmap=False, tiles_per_cell=tpc,
        cond_from=min(cond_from, cut), grouped=grouped, gmode=gmode,
        seg_bytes=seg_bytes, halo_bytes=halo_bytes, emit_surv=True,
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
            jax.ShapeDtypeStruct((n_cells * rows_pc, _LANE), jnp.int32),
        ),
        interpret=interpret,
    )(data2d, data2d, shift.reshape(1), p0_banks, packed_banks, side_banks)
    bits_b, pos, count = _phase_b(
        data2d, surv.reshape(-1), packed_banks, side_banks,
        steps_b=steps_b, cb=cb, p0_miss=p0_miss, interpret=interpret,
        grouped=grouped, gmode=gmode, seg_bytes=seg_bytes,
        halo_bytes=halo_bytes, cap=cap, tpc_b=tpc_b,
    )
    ok = pos < surv.size  # filler rows excluded
    deep = jnp.where(
        ok & (pos >= shift), jax.lax.population_count(bits_b), 0
    ).sum()
    return partial.sum() + deep, count


@functools.partial(jax.jit, static_argnames=_STATICS + ("k",))
def _plan_scan_count_chain(
    data2d, shift, p0_banks, packed_banks, side_banks,
    *, k, steps, nb_p0, cb, p0_miss, p0_mode, interpret, tpc, cond_from,
    grouped=False, gmode="geo", seg_bytes=0, halo_bytes=0, stage16=False,
    planes=(),
):
    """``k`` dependent count scans in ONE dispatch (lax.fori_loop):
    each iteration's shift parity depends on the previous total, so
    the loop is a true on-device dependency chain.  Timing ``k``
    chained scans this way excludes the host/tunnel per-dispatch cost
    the same way the reference's cudaEvent span excludes its launch
    overhead (master_kernel.cu:400-423)."""
    st = dict(
        steps=steps, nb_p0=nb_p0, cb=cb, p0_miss=p0_miss, p0_mode=p0_mode,
        interpret=interpret, tpc=tpc, cond_from=cond_from, grouped=grouped,
        gmode=gmode, seg_bytes=seg_bytes, halo_bytes=halo_bytes,
        stage16=stage16, planes=planes,
    )

    def body(_, acc):
        return _plan_scan_count(
            data2d, (acc + shift) % 2, p0_banks, packed_banks,
            side_banks, **st,
        )

    return jax.lax.fori_loop(0, k, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=_STATICS_C + ("k",))
def _plan_scan_count_compact_chain(
    data2d, shift, p0_banks, packed_banks, side_banks,
    *, k, steps, nb_p0, cb, p0_miss, p0_mode, interpret, tpc, cond_from,
    grouped=False, gmode="geo", seg_bytes=0, halo_bytes=0,
    cut=0, cap=0, tpc_b=8, stage16=False, planes=(),
):
    """Chained compacted count scans; returns (last total, max true
    survivor count across the chain) for the overflow check."""
    assert not planes, "compacted scans use the position-linear staging"
    st = dict(
        steps=steps, nb_p0=nb_p0, cb=cb, p0_miss=p0_miss, p0_mode=p0_mode,
        interpret=interpret, tpc=tpc, cond_from=cond_from, grouped=grouped,
        gmode=gmode, seg_bytes=seg_bytes, halo_bytes=halo_bytes,
        cut=cut, cap=cap, tpc_b=tpc_b,
    )

    def body(_, carry):
        acc, om = carry
        total, count = _plan_scan_count_compact(
            data2d, (acc + shift) % 2, p0_banks, packed_banks,
            side_banks, **st,
        )
        return total, jnp.maximum(om, count)

    return jax.lax.fori_loop(0, k, body, (jnp.int32(0), jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=_STATICS)
def _plan_scan_count(
    data2d, shift, p0_banks, packed_banks, side_banks,
    *, steps, nb_p0, cb, p0_miss, p0_mode, interpret, tpc, cond_from,
    grouped=False, gmode="geo", seg_bytes=0, halo_bytes=0, stage16=False,
    planes=(),
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if stage16:
        d16, halo32 = data2d
        n_cells, tpc = _common(d16, tpc)
    elif planes:
        d16 = halo32 = None
        # staged at a fixed (pre-adjusted) tpc; rows = cells x planes
        # x rows-per-cell exactly
        n_cells = data2d.shape[0] // (len(planes) * tpc * _SUB)
    else:
        d16 = halo32 = None
        n_cells, tpc = _common(data2d, tpc)
    kernel = _make_plan_kernel(
        steps=steps, nb_p0=nb_p0, cb=cb, p0_miss=p0_miss, p0_mode=p0_mode,
        emit_bitmap=False, tiles_per_cell=tpc, cond_from=cond_from,
        grouped=grouped, gmode=gmode, seg_bytes=seg_bytes,
        halo_bytes=halo_bytes, stage16=stage16, planes=planes,
    )
    rpc = tpc * _SUB
    call = functools.partial(
        pl.pallas_call,
        kernel,
        grid=(n_cells,),
        out_specs=pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_cells * _SUB, _LANE), jnp.int32),
        interpret=interpret,
    )
    if stage16:
        partial = call(
            in_specs=_specs(tpc, stage16=True),
            scratch_shapes=[pltpu.VMEM((rpc + _SUB, _LANE), jnp.int32)],
        )(d16, halo32, shift.reshape(1), p0_banks, packed_banks,
          side_banks)
    else:
        partial = call(in_specs=_specs(tpc, n_planes=len(planes)))(
            data2d, data2d, shift.reshape(1), p0_banks, packed_banks,
            side_banks,
        )
    return partial.sum()


def _dispatch(name: str, fn, args: tuple, statics: dict):
    """Scan-program dispatch through the AOT artifact store (fresh
    processes skip trace+lowering; utils/aot.py).  Interpret mode
    keeps the direct path — its eager execution has no trace cost."""
    if statics.get("interpret"):
        return fn(*args, **statics)
    from phfpfac_tpu.utils.aot import aot_call

    return aot_call(name, fn, args, statics)


def _eager_if(interpret: bool):
    """Interpret-mode scans run EAGERLY (jax.disable_jit): jitting the
    interpreter means XLA compiles the kernel's giant unrolled HLO —
    minutes of CPU compile per table geometry, and wide plans have
    crashed the compiler outright (libgcc unwind segfault = stack
    exhaustion).  Eager execution of the same ops is robust and, for
    the one-shot shapes tests use, faster.  Real-TPU scans keep jit."""
    import contextlib

    return jax.disable_jit() if interpret else contextlib.nullcontext()


class PlanShardScanner:
    """Bitmap-mode hybrid-stride scanner for one shard (exact mode)."""

    def __init__(self, shard: ShardTables, *, interpret: bool = False,
                 tpc: int = 32, cond_from="auto", train=None,
                 compact="auto", pt=None):
        # ``pt``: a previously built (possibly deserialized, format v3)
        # PlanTables — skips the trie + plan build entirely
        self.pt: PlanTables = (
            pt if pt is not None else build_plan_tables(shard, train=train)
        )
        self.shard = shard
        self.interpret = interpret
        self.tpc = tpc
        self.cond_from = resolve_cond_from(self.pt, cond_from)
        self.compact = compact
        # multi-plane staging (stage_planes): see PlanCountScan — the
        # bitmap path shares the kernel machinery; incompatible with
        # the compacted scan's position-linear glue
        self.multiplane = os.environ.get("PHFPFAC_MULTIPLANE", "0") == "1"
        if self.multiplane:
            self.compact = "off"
        self._code = jnp.asarray(self.pt.code_of)

    def _statics(self):
        pt = self.pt
        return dict(
            steps=pt.steps, nb_p0=pt.p0_banks.shape[0], cb=pt.code_bits,
            p0_miss=pt.p0_miss, p0_mode=pt.p0_mode,
            interpret=self.interpret, tpc=self.tpc,
            cond_from=self.cond_from, grouped=pt.trained,
            gmode=_default_gmode(),
        )

    def scan(self, data_padded, input_size, cfg, max_steps):
        _cnt, _bits, verify = self.scan_async(
            data_padded, input_size, cfg, max_steps
        )
        return verify()

    def scan_async(self, data_padded, input_size, cfg, max_steps):
        """Dispatch-only variant for pipelined callers: returns
        (cnt, bits, verify).  ``verify()`` (call it at RESOLVE time,
        after/with the bits fetch) checks the compacted scan's true
        survivor count and, on cap overflow, rescans uncompacted and
        returns the corrected (cnt, bits); otherwise it returns the
        originals.  No device sync happens before verify()."""
        seg, halo = 0, 0
        if cfg.truncation == "segment":
            # the in-kernel cut needs a power-of-two segment (one
            # and-not per tile); other geometries fall back
            if cfg.segment_bytes & (cfg.segment_bytes - 1):
                raise PairUnsupported("segment size must be a power of 2")
            seg, halo = cfg.segment_bytes, cfg.halo_bytes
        n_pos = len(data_padded) - max_steps
        n_rows = staged_rows(n_pos)
        if self.multiplane:
            from phfpfac_tpu.ops.pallas_pair import stage_planes

            n_tiles, tpc = n_rows // _SUB - 1, self.tpc
            while n_tiles % tpc:
                tpc //= 2
            offsets = fresh_window_offsets(self.pt.steps)
            planes = stage_planes(
                jnp.asarray(data_padded),
                jnp.asarray(np.int32(input_size)),
                self._code, n_rows=n_rows, cb=self.pt.code_bits,
                rpc=tpc * _SUB, offsets=offsets,
            )
            return self._scan_async(
                planes, seg, halo, planes_off=offsets, tpc=tpc
            )
        data2d = stage_pairs(
            jnp.asarray(data_padded), jnp.asarray(np.int32(input_size)),
            self._code, n_rows=n_rows, cb=self.pt.code_bits,
        )
        return self._scan_async(data2d, seg, halo)

    def _scan_async(self, data2d, seg, halo, planes_off=(), tpc=None):
        def plain():
            st = self._statics()
            if planes_off:
                st["tpc"] = tpc
            with _eager_if(self.interpret):
                return _dispatch(
                    "plan_bitmap", _plan_scan_bitmap,
                    (data2d, jnp.zeros(1, jnp.int32),
                     jnp.asarray(self.pt.p0_banks),
                     jnp.asarray(self.pt.packed_banks),
                     jnp.asarray(self.pt.side_banks)),
                    dict(seg_bytes=seg, halo_bytes=halo,
                         planes=planes_off, **st),
                )

        if planes_off:
            cnt, bits = plain()
            return cnt, bits, lambda: (cnt, bits)
        n_pos = data2d.shape[0] * _LANE - TILE
        cc = resolve_compact(self.pt, n_pos, self.compact)
        if cc is None:
            cnt, bits = plain()
            return cnt, bits, lambda: (cnt, bits)
        cut, cap = cc
        with _eager_if(self.interpret):
            cnt, bits, count = _dispatch(
                "plan_bitmap_compact", _plan_scan_bitmap_compact,
                (data2d, jnp.zeros(1, jnp.int32),
                 jnp.asarray(self.pt.p0_banks),
                 jnp.asarray(self.pt.packed_banks),
                 jnp.asarray(self.pt.side_banks)),
                dict(seg_bytes=seg, halo_bytes=halo, cut=cut, cap=cap,
                     **self._statics()),
            )

        def verify(cnt=cnt, bits=bits):
            if int(count) <= cap:
                return cnt, bits
            # trained estimate was wrong for THIS corpus: rescan
            # uncompacted (correctness over speed, never truncation)
            return plain()

        return cnt, bits, verify


class PlanCountScan:
    """Count-mode hybrid-stride scan (bench protocol: prepare + scan)."""

    def __init__(self, shard: ShardTables, max_steps: int, *,
                 interpret: bool = False, tpc: int = 32, cond_from="auto",
                 train=None, compact="auto", stage16=None, pt=None,
                 multiplane=None):
        # ``pt``: a pre-built PlanTables (forced step kinds, loaded
        # format-v3 tables) — skips the trie + plan build
        self.pt = (
            pt if pt is not None else build_plan_tables(shard, train=train)
        )
        self.max_steps = max_steps
        self.interpret = interpret
        self.tpc = tpc
        self.cond_from = resolve_cond_from(self.pt, cond_from)
        self.compact = compact
        # 16-bit staged input (stage_pairs16): halves HBM->VMEM input
        # streaming at the cost of one int16->int32 scratch widen per
        # cell (~3 vops/tile).  A/B knob; plain count path only (the
        # compacted scan re-reads the staged stream in its glue).
        if stage16 is None:
            stage16 = os.environ.get("PHFPFAC_STAGE16") == "1"
        self.stage16 = bool(stage16)
        if self.stage16:
            self.compact = "off"
        # multi-plane staging (stage_planes): pre-shifted input planes
        # turn every window build into one block read — measured r5:
        # english 32 MiB 6.44 -> 5.86 ms at tpc=64, big156 7.14 ->
        # 5.84; costs len(planes) x input HBM footprint (gate off for
        # huge-table dictionaries where the extra VMEM block pressure
        # regresses — full466k measured WORSE)
        if multiplane is None:
            multiplane = os.environ.get("PHFPFAC_MULTIPLANE", "0") == "1"
        self.multiplane = bool(multiplane) and not self.stage16
        self._mp_offsets: tuple = ()
        self._mp_tpc = self.tpc
        # device scalars of each compacted scan's true survivor count;
        # callers drain via check_overflow() AFTER timing (one fetch),
        # keeping the chained-dispatch protocol sync-free
        self._surv_counts = []
        self._surv_caps = []
        self._code = jnp.asarray(self.pt.code_of)
        self._p0 = jnp.asarray(self.pt.p0_banks)
        self._m = jnp.asarray(self.pt.packed_banks)
        self._s = jnp.asarray(self.pt.side_banks)

    def prepare(self, data_padded, input_size):
        n_pos = len(data_padded) - self.max_steps
        n_rows = staged_rows(n_pos)
        if self.multiplane:
            from phfpfac_tpu.ops.pallas_pair import stage_planes

            n_tiles, tpc = n_rows // _SUB - 1, self.tpc
            while n_tiles % tpc:
                tpc //= 2
            self._mp_tpc = tpc
            self._mp_offsets = fresh_window_offsets(self.pt.steps)
            staged = stage_planes(
                jnp.asarray(data_padded),
                jnp.asarray(np.int32(input_size)),
                self._code, n_rows=n_rows, cb=self.pt.code_bits,
                rpc=tpc * _SUB, offsets=self._mp_offsets,
            )
            return {"planes": staged}
        if self.stage16:
            from phfpfac_tpu.ops.pallas_pair import stage_pairs16

            # replicate _common's tpc adjustment so the halo blocks
            # match the kernel's rows-per-cell exactly
            n_tiles, tpc = n_rows // _SUB - 1, self.tpc
            while n_tiles % tpc:
                tpc //= 2
            if (tpc * _SUB) % 16 == 0:  # int16 native tile is (16,128)
                return stage_pairs16(
                    jnp.asarray(data_padded),
                    jnp.asarray(np.int32(input_size)),
                    self._code, n_rows=n_rows, cb=self.pt.code_bits,
                    rpc=tpc * _SUB,
                )
            # THIS input's geometry can't tile to 16 rows: int32-stage
            # it per-call WITHOUT flipping the instance flag (a reused
            # scanner would otherwise silently stay int32 for later
            # inputs that do tile — ADVICE r4); the counter lets A/B
            # harnesses detect mixed-staging runs
            self.stage16_fallbacks = getattr(
                self, "stage16_fallbacks", 0
            ) + 1
        return stage_pairs(
            jnp.asarray(data_padded), jnp.asarray(np.int32(input_size)),
            self._code, n_rows=n_rows, cb=self.pt.code_bits,
        )

    def scan(self, staged, input_size, shift):
        pt = self.pt
        is16 = isinstance(staged, tuple)
        is_mp = isinstance(staged, dict)
        statics = dict(
            steps=pt.steps, nb_p0=pt.p0_banks.shape[0], cb=pt.code_bits,
            p0_miss=pt.p0_miss, p0_mode=pt.p0_mode,
            interpret=self.interpret,
            tpc=self._mp_tpc if is_mp else self.tpc,
            cond_from=self.cond_from, grouped=pt.trained,
            gmode=_default_gmode(), stage16=is16,
            planes=self._mp_offsets if is_mp else (),
        )
        if is_mp:
            staged = staged["planes"]
            rows = staged.shape[0] // len(self._mp_offsets)
        else:
            rows = (staged[0] if is16 else staged).shape[0]
        n_pos = rows * _LANE - TILE
        cc = (
            None if (is16 or is_mp)
            else resolve_compact(pt, n_pos, self.compact)
        )
        if cc is not None:
            cut, cap = cc
            with _eager_if(self.interpret):
                total, count = _dispatch(
                    "plan_count_compact", _plan_scan_count_compact,
                    (staged, jnp.asarray(shift, jnp.int32),
                     self._p0, self._m, self._s),
                    dict(cut=cut, cap=cap, **statics),
                )
            self._surv_counts.append(count)
            self._surv_caps.append(cap)
            return total
        with _eager_if(self.interpret):
            return _dispatch(
                "plan_count", _plan_scan_count,
                (staged, jnp.asarray(shift, jnp.int32),
                 self._p0, self._m, self._s),
                statics,
            )

    def scan_chain(self, staged, input_size, shift, k: int):
        """``k`` dependent scans in ONE dispatch (see
        _plan_scan_count_chain).  Returns the last scan's total; the
        compacted path records the chain's max survivor count for
        check_overflow().  Timing protocol: per-scan device time =
        (T(2k) - T(k)) / k, which cancels dispatch + fetch costs the
        reference's cudaEvent kernel span also excludes."""
        pt = self.pt
        is16 = isinstance(staged, tuple)
        is_mp = isinstance(staged, dict)
        statics = dict(
            steps=pt.steps, nb_p0=pt.p0_banks.shape[0], cb=pt.code_bits,
            p0_miss=pt.p0_miss, p0_mode=pt.p0_mode,
            interpret=self.interpret,
            tpc=self._mp_tpc if is_mp else self.tpc,
            cond_from=self.cond_from, grouped=pt.trained,
            gmode=_default_gmode(), k=k, stage16=is16,
            planes=self._mp_offsets if is_mp else (),
        )
        if is_mp:
            staged = staged["planes"]
            rows = staged.shape[0] // len(self._mp_offsets)
        else:
            rows = (staged[0] if is16 else staged).shape[0]
        n_pos = rows * _LANE - TILE
        cc = (
            None if (is16 or is_mp)
            else resolve_compact(pt, n_pos, self.compact)
        )
        args = (staged, jnp.asarray(shift, jnp.int32),
                self._p0, self._m, self._s)
        if cc is not None:
            cut, cap = cc
            with _eager_if(self.interpret):
                total, count = _dispatch(
                    "plan_count_compact_chain",
                    _plan_scan_count_compact_chain, args,
                    dict(cut=cut, cap=cap, **statics),
                )
            self._surv_counts.append(count)
            self._surv_caps.append(cap)
            return total
        with _eager_if(self.interpret):
            return _dispatch(
                "plan_count_chain", _plan_scan_count_chain, args, statics,
            )

    def check_overflow(self) -> bool:
        """True if ANY compacted scan since the last check overflowed
        its survivor cap (its count result is then a truncation —
        callers must rerun those inputs with compact=0).  The margins
        are reduced on DEVICE and fetched once (each host fetch costs
        ~40 ms through the tunnel); keeps scan() itself dispatch-only."""
        counts, caps = self._surv_counts, self._surv_caps
        self._surv_counts, self._surv_caps = [], []
        if not counts:
            return False
        over = jnp.stack(
            [c - cap for c, cap in zip(counts, caps)]
        ).max()
        return int(over) > 0

    def __call__(self, data_padded, input_size, shift):
        return self.scan(self.prepare(data_padded, input_size),
                         input_size, shift)


def plan_count_scanner(shard: ShardTables, max_steps: int, *,
                       interpret: bool = False, tpc: int = 32,
                       cond_from="auto", train=None,
                       compact="auto", stage16=None,
                       pt=None, multiplane=None) -> PlanCountScan:
    return PlanCountScan(
        shard, max_steps, interpret=interpret, tpc=tpc, cond_from=cond_from,
        train=train, compact=compact, stage16=stage16, pt=pt,
        multiplane=multiplane,
    )
