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
    GROUP_FLOOR as _GROUP_FLOOR,
    GROUP_MIN_NB as _GROUP_MIN_NB,
)
# (single knobs shared with the trained DP cost model, compile.depth)

# gmode="capped": number of geometric groups kept as UNROLLED probe
# code before the cold dynamic-bank loop takes over (code size per
# step collapses from O(table banks) to O(hot span))
_UNROLL_GROUPS = 2


def _make_plan_kernel(
    *,
    steps: tuple,  # tuple[StepSpec]
    nb_p0: int, cb: int, p0_miss: int, p0_mode: str,
    emit_bitmap: bool, tiles_per_cell: int, cond_from: int,
    grouped: bool = False, gmode: str = "geo",
    seg_bytes: int = 0, halo_bytes: int = 0,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tpc = tiles_per_cell
    cbm = (1 << cb) - 1
    pair_mask = (1 << (2 * cb)) - 1
    any_conds = len(steps) > cond_from
    # segment truncation (reference master_kernel.cu:141-144): walks may
    # read only chars below segment_end + halo.  Chars past input_size
    # die via the staging pad, so the in-kernel limit needs no
    # input_size term.  seg_bytes == 0 = exact mode.
    seg_on = seg_bytes > 0
    if seg_on:
        assert seg_bytes & (seg_bytes - 1) == 0, "segment must be 2^k"

    def kernel(in_ref, halo_ref, shift_ref, p0_ref, m_ref, s_ref, *out_refs):
        cell = pl.program_id(0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)

        rpc = _SUB * tpc
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
            return in_ref[pl.ds(i * _SUB, _SUB), :]

        def tile_b(i: int):
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
        for i in range(tpc):
            cur = tile_a(i)
            if p0_mode == "dense":
                v = _lut(p0_ref, cur, nb_p0)
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
                v = _lut(p0_ref, cur & cbm, nb_p0)
                alive = v >= 0
                fin1 = alive & ((v & 1) == 1)
                outs.append(fin1.astype(jnp.int32))
                disps.append(
                    jnp.where(
                        alive, jax.lax.shift_right_logical(v, 1), p0_miss
                    )
                )

        def any_live(disps):
            """Scalar: does any walker still carry a live displacement?
            Dead walkers carry displacement 0 and live displacements
            are >= the table's dead-zone span (> 0, by construction),
            so one max-tree + scalar compare replaces per-tile
            compare/or chains."""
            t = disps[0]
            for d in disps[1:]:
                t = jnp.maximum(t, d)
            return jnp.max(t) != p0_miss

        def probe_bounded(ref, idxs, off: int, nb: int, k0: int,
                          hot: int = 0):
            """Banked LUT over ONLY banks [k0, max-live-bank]: with the
            profile-guided layout hot classes sit at low displacements,
            so the dynamic bound collapses the scan to the live working
            set.  Dead walkers carry displacement 0, so their probe
            indices fall in the dead zone below k0's first boundary —
            the bound is a plain unmasked max (no live-masking vops)
            and dead lanes read the -1 init (miss)."""
            t = idxs[0]
            for m in idxs[1:]:
                t = jnp.maximum(t, m)
            mx = jnp.max(t)  # scalar: max probe idx (dead stay below k0)
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
            ends = _group_ends(nb, first=max(_GROUP_FLOOR, hot + 1), growth=3)
            if gmode == "capped" and len(ends) > _UNROLL_GROUPS:
                ends, tail_lo = ends[:_UNROLL_GROUPS], ends[_UNROLL_GROUPS - 1]
            else:
                tail_lo = None
            accs = tuple(
                _lut_range(
                    ref, idxs[i],
                    jnp.full(idxs[i].shape, -1, jnp.int32),
                    0, ends[0], off, k0,
                )
                for i in range(tpc)
            )
            for lo, hi in zip(ends[:-1], ends[1:]):
                def probe(accs, lo=lo, hi=hi):
                    return tuple(
                        _lut_range(ref, idxs[i], accs[i], lo, hi, off, k0)
                        for i in range(tpc)
                    )

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

        def finish(sp, cur, disp, out, g, w, ok2=None):
            """Verify probe g (side word w for pair steps), update the
            per-tile output accumulator, chain disp.  No ``g >= 0``
            guard: compile guarantees every real symbol is strictly
            below the sym-field mask (collect_alphabet), so the -1 miss
            can never verify."""
            bit0 = sp.depth0 - 1
            if sp.kind == "mono":
                # one masked compare against sym and sym|finbit each:
                # saves an op vs extracting the fin bit separately
                sym = cur & cbm
                gs = g & (cbm | (1 << cb))
                fin = gs == (sym | (1 << cb))
                hit = (gs == sym) | fin
                if emit_bitmap:
                    out = out | jnp.where(fin, jnp.int32(1) << bit0, 0)
                else:
                    out = out + fin.astype(jnp.int32)
                disp = jnp.where(
                    hit, jax.lax.shift_right_logical(g, cb + 1), sp.miss
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

        def make_step(si: int, sp):
            off_chars = sp.depth0 - 1
            bounding = grouped and gmode != "none"
            bound_main = bounding and sp.nb >= _GROUP_MIN_NB
            bound_side = (
                sp.kind == "pair" and bounding and sp.s_nb >= _GROUP_MIN_NB
            )
            # the NEXT cond's pred is this step's post-update liveness,
            # carried as a scalar so skipped steps pay nothing
            need_alive = any_conds and si >= cond_from - 1
            wshift = 3 if sp.s_nibble else 2

            def step(carry):
                disps, outs = list(carry[0]), list(carry[1])
                if seg_on:
                    disps = [
                        jnp.where(d_s[i] > off_chars, disps[i], sp.miss)
                        for i in range(tpc)
                    ]
                curs = [window(i, off_chars) for i in range(tpc)]
                if sp.kind == "mono":
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
                    gs = [
                        _lut(m_ref, idxs[i], sp.nb, sp.off, sp.k0)
                        for i in range(tpc)
                    ]
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
                        ws = [
                            _lut(s_ref, widxs[i], sp.s_nb, sp.s_off,
                                 sp.s_k0)
                            for i in range(tpc)
                        ]
                for i in range(tpc):
                    ok2 = None
                    if seg_on and sp.kind == "pair":
                        ok2 = d_s[i] > off_chars + 1
                    disps[i], outs[i] = finish(
                        sp, curs[i], disps[i], outs[i], gs[i], ws[i], ok2
                    )
                alive = any_live(disps) if need_alive else carry[2]
                return (tuple(disps), tuple(outs), alive)

            return step

        alive0 = jnp.bool_(True)
        if any_conds and cond_from == 0:
            alive0 = any_live(disps)
        carry = (tuple(disps), tuple(outs), alive0)
        for si, sp in enumerate(steps):
            body = make_step(si, sp)
            if si < cond_from:
                carry = body(carry)
            else:
                carry = jax.lax.cond(carry[2], body, lambda c: c, carry)
        outs = carry[1]

        if emit_bitmap:
            cnt_ref, bits_ref = out_refs
            for i in range(tpc):
                cnt_ref[pl.ds(i * _SUB, _SUB), :] = (
                    jax.lax.population_count(outs[i])
                )
                bits_ref[pl.ds(i * _SUB, _SUB), :] = outs[i]
        else:
            (partial_ref,) = out_refs
            shift = shift_ref[0]
            acc = jnp.zeros((_SUB, _LANE), jnp.int32)
            for i in range(tpc):
                pos = (cell * tpc + i) * TILE + sub * _LANE + lane
                acc = acc + jnp.where(pos >= shift, outs[i], 0)
            partial_ref[:, :] = acc

    return kernel


_STATICS = (
    "steps", "nb_p0", "cb", "p0_miss", "p0_mode", "interpret", "tpc",
    "cond_from", "grouped", "gmode", "seg_bytes", "halo_bytes",
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


def _specs(tpc):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
):
    from jax.experimental import pallas as pl

    n_cells, tpc = _common(data2d, tpc)
    kernel = _make_plan_kernel(
        steps=steps, nb_p0=nb_p0, cb=cb, p0_miss=p0_miss, p0_mode=p0_mode,
        emit_bitmap=True, tiles_per_cell=tpc, cond_from=cond_from,
        grouped=grouped, gmode=gmode, seg_bytes=seg_bytes,
        halo_bytes=halo_bytes,
    )
    rows_pc = tpc * _SUB
    cnt, bits = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=_specs(tpc),
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


@functools.partial(jax.jit, static_argnames=_STATICS)
def _plan_scan_count(
    data2d, shift, p0_banks, packed_banks, side_banks,
    *, steps, nb_p0, cb, p0_miss, p0_mode, interpret, tpc, cond_from,
    grouped=False, gmode="geo", seg_bytes=0, halo_bytes=0,
):
    from jax.experimental import pallas as pl

    n_cells, tpc = _common(data2d, tpc)
    kernel = _make_plan_kernel(
        steps=steps, nb_p0=nb_p0, cb=cb, p0_miss=p0_miss, p0_mode=p0_mode,
        emit_bitmap=False, tiles_per_cell=tpc, cond_from=cond_from,
        grouped=grouped, gmode=gmode, seg_bytes=seg_bytes,
        halo_bytes=halo_bytes,
    )
    partial = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=_specs(tpc),
        out_specs=pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_cells * _SUB, _LANE), jnp.int32),
        interpret=interpret,
    )(data2d, data2d, shift.reshape(1), p0_banks, packed_banks, side_banks)
    return partial.sum()


class PlanShardScanner:
    """Bitmap-mode hybrid-stride scanner for one shard (exact mode)."""

    def __init__(self, shard: ShardTables, *, interpret: bool = False,
                 tpc: int = 32, cond_from="auto", train=None):
        self.pt: PlanTables = build_plan_tables(shard, train=train)
        self.shard = shard
        self.interpret = interpret
        self.tpc = tpc
        self.cond_from = resolve_cond_from(self.pt, cond_from)
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
        seg, halo = 0, 0
        if cfg.truncation == "segment":
            # the in-kernel cut needs a power-of-two segment (one
            # and-not per tile); other geometries fall back
            if cfg.segment_bytes & (cfg.segment_bytes - 1):
                raise PairUnsupported("segment size must be a power of 2")
            seg, halo = cfg.segment_bytes, cfg.halo_bytes
        n_pos = len(data_padded) - max_steps
        data2d = stage_pairs(
            jnp.asarray(data_padded), jnp.asarray(np.int32(input_size)),
            self._code, n_rows=staged_rows(n_pos), cb=self.pt.code_bits,
        )
        return _plan_scan_bitmap(
            data2d, jnp.zeros(1, jnp.int32),
            jnp.asarray(self.pt.p0_banks),
            jnp.asarray(self.pt.packed_banks),
            jnp.asarray(self.pt.side_banks),
            seg_bytes=seg, halo_bytes=halo,
            **self._statics(),
        )


class PlanCountScan:
    """Count-mode hybrid-stride scan (bench protocol: prepare + scan)."""

    def __init__(self, shard: ShardTables, max_steps: int, *,
                 interpret: bool = False, tpc: int = 32, cond_from="auto",
                 train=None):
        self.pt = build_plan_tables(shard, train=train)
        self.max_steps = max_steps
        self.interpret = interpret
        self.tpc = tpc
        self.cond_from = resolve_cond_from(self.pt, cond_from)
        self._code = jnp.asarray(self.pt.code_of)
        self._p0 = jnp.asarray(self.pt.p0_banks)
        self._m = jnp.asarray(self.pt.packed_banks)
        self._s = jnp.asarray(self.pt.side_banks)

    def prepare(self, data_padded, input_size):
        n_pos = len(data_padded) - self.max_steps
        return stage_pairs(
            jnp.asarray(data_padded), jnp.asarray(np.int32(input_size)),
            self._code, n_rows=staged_rows(n_pos), cb=self.pt.code_bits,
        )

    def scan(self, staged, input_size, shift):
        pt = self.pt
        return _plan_scan_count(
            staged, jnp.asarray(shift, jnp.int32),
            self._p0, self._m, self._s,
            steps=pt.steps, nb_p0=pt.p0_banks.shape[0], cb=pt.code_bits,
            p0_miss=pt.p0_miss, p0_mode=pt.p0_mode,
            interpret=self.interpret, tpc=self.tpc,
            cond_from=self.cond_from, grouped=pt.trained,
            gmode=_default_gmode(),
        )

    def __call__(self, data_padded, input_size, shift):
        return self.scan(self.prepare(data_padded, input_size),
                         input_size, shift)


def plan_count_scanner(shard: ShardTables, max_steps: int, *,
                       interpret: bool = False, tpc: int = 32,
                       cond_from="auto", train=None) -> PlanCountScan:
    return PlanCountScan(
        shard, max_steps, interpret=interpret, tpc=tpc, cond_from=cond_from,
        train=train,
    )
