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


def _lut_range(banks_ref, idx, acc, lo: int, hi: int, off: int = 0,
               k0: int = 0):
    """_lut restricted to banks [lo, hi), merged into ``acc``."""
    bank = idx >> 7
    lane = idx & (_LANE - 1)
    for k in range(lo, hi):
        row = jnp.broadcast_to(banks_ref[off + k, :][None, :], idx.shape)
        g = jnp.take_along_axis(row, lane, axis=1)
        acc = jnp.where(bank == k + k0, g, acc)
    return acc


def _group_ends(nb: int, first: int = 4) -> list:
    """Geometric bank-group boundaries: [4, 12, 28, 60, ..., nb].

    The grouped scan probes group 0 unconditionally and each further
    group only while some live walker's probe bank lies beyond the
    boundary — with a profile-guided layout the hot classes sit in the
    first group(s), so the expected probed-bank count collapses to the
    HOT working set instead of the table size, at a cost of
    O(log(nb)) group checks worst-case.
    """
    ends, e, size = [], 0, first
    while e < nb:
        e = min(e + size, nb)
        ends.append(e)
        size *= 2
    return ends


from phfpfac_tpu.compile.depth import GROUP_MIN_NB as _GROUP_MIN_NB  # noqa: E402
# (single knob shared with the trained DP cost model, compile.depth)


def _make_plan_kernel(
    *,
    steps: tuple,  # tuple[StepSpec]
    nb_p0: int, cb: int, p0_miss: int, p0_mode: str,
    emit_bitmap: bool, tiles_per_cell: int, cond_from: int,
    tile_major: bool = False, grouped: bool = False,
):
    from jax.experimental import pallas as pl

    tpc = tiles_per_cell
    cbm = (1 << cb) - 1
    pair_mask = (1 << (2 * cb)) - 1

    def kernel(in_ref, halo_ref, shift_ref, p0_ref, m_ref, s_ref, *out_refs):
        cell = pl.program_id(0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)

        rpc = _SUB * tpc
        block = in_ref[:]
        a_s = [block[i * _SUB : (i + 1) * _SUB, :] for i in range(tpc)]
        b_s = [
            block[i * _SUB + 1 : (i + 1) * _SUB + 1, :]
            for i in range(tpc - 1)
        ]
        b_s.append(
            jnp.concatenate(
                [block[rpc - _SUB + 1 : rpc, :], halo_ref[0:1, :]], axis=0
            )
        )
        pos_s = [
            (cell * tpc + i) * TILE + sub * _LANE + lane for i in range(tpc)
        ]

        # prologue (offset 0): dense depths-1+2 probe, or a 1-bank
        # code-indexed s0 probe for wide alphabets.  p0_miss is THE
        # plan-wide dead sentinel (compile.plan builds every table
        # strictly below it).
        curs, disps, cnts, bitss = [], [], [], []
        for i in range(tpc):
            cur = a_s[i]
            if p0_mode == "dense":
                v = _lut(p0_ref, cur, nb_p0)
                alive = v >= 0
                fin1 = alive & ((v & 1) == 1)
                fin2 = alive & ((v & 2) == 2)
                cnts.append(fin1.astype(jnp.int32) + fin2.astype(jnp.int32))
                if emit_bitmap:
                    bitss.append(
                        fin1.astype(jnp.int32) | jnp.where(fin2, 2, 0)
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
                cnts.append(fin1.astype(jnp.int32))
                if emit_bitmap:
                    bitss.append(fin1.astype(jnp.int32))
                disps.append(
                    jnp.where(
                        alive, jax.lax.shift_right_logical(v, 1), p0_miss
                    )
                )
            curs.append(cur)

        # per-step window geometry (lane roll + boundary-column refill)
        geoms = []
        offset = 0
        for sp in steps:
            n_adv = (sp.depth0 - 1) - offset  # chars to advance (1 or 2)
            offset = sp.depth0 - 1
            geoms.append((
                (lane + n_adv) & (_LANE - 1),          # lane_next
                lane >= (_LANE - n_adv),                # at_tail
                (jnp.broadcast_to(                      # bcol_idx
                    jnp.int32(offset - _LANE), (_SUB, _LANE)
                ) + lane) & (_LANE - 1),
            ))

        def tile_advance(geom, b_i, cur):
            """Advance one tile's pair-symbol window by the step stride."""
            lane_next, at_tail, bcol_idx = geom
            rolled = jnp.take_along_axis(cur, lane_next, axis=1)
            bcol = jnp.take_along_axis(b_i, bcol_idx, axis=1)
            return jnp.where(at_tail, bcol, rolled)

        def main_idx(sp, cur, disp):
            return disp + (cur & cbm if sp.kind == "mono" else cur)

        def tile_finish(sp, cur, disp, cnt, bits, g, w_pre=None):
            """Verify the main-table probe result ``g``, probe the side
            table (pair steps; ``w_pre`` = grouped-scan result), update
            cnt/bits, chain disp."""
            bit0 = sp.depth0 - 1
            if sp.kind == "mono":
                sym = cur & cbm
                hit = (g >= 0) & ((g & cbm) == sym)
                fin = hit & ((g & (1 << cb)) != 0)
                cnt = cnt + fin.astype(jnp.int32)
                if emit_bitmap:
                    bits = bits | jnp.where(fin, jnp.int32(1) << bit0, 0)
                disp = jnp.where(
                    hit, jax.lax.shift_right_logical(g, cb + 1), sp.miss
                )
            else:
                # nibble side entries store (code & 7) + 1 — sound via
                # the layout's mod-8 anti-aliasing
                a1 = cur & cbm
                sidx = disp + a1
                if sp.s_nibble:
                    w = w_pre if w_pre is not None else _lut(
                        s_ref, jax.lax.shift_right_logical(sidx, 3),
                        sp.s_nb, sp.s_off, sp.s_k0,
                    )
                    nib = (
                        jax.lax.shift_right_logical(w, (sidx & 7) << 2)
                    ) & 15
                    fin_mid = nib == (a1 & 7) + 1
                else:
                    w = w_pre if w_pre is not None else _lut(
                        s_ref, jax.lax.shift_right_logical(sidx, 2),
                        sp.s_nb, sp.s_off, sp.s_k0,
                    )
                    byte = (
                        jax.lax.shift_right_logical(w, (sidx & 3) << 3)
                    ) & 255
                    fin_mid = byte == a1 + 1
                hit = (g >= 0) & ((g & pair_mask) == cur)
                fin_end = hit & ((g & (1 << (2 * cb))) != 0)
                cnt = (
                    cnt + fin_mid.astype(jnp.int32)
                    + fin_end.astype(jnp.int32)
                )
                if emit_bitmap:
                    bits = (
                        bits
                        | jnp.where(fin_mid, jnp.int32(1) << bit0, 0)
                        | jnp.where(fin_end, jnp.int32(1) << (bit0 + 1), 0)
                    )
                disp = jnp.where(
                    hit, jax.lax.shift_right_logical(g, 2 * cb + 1), sp.miss
                )
            return disp, cnt, bits

        def tile_step(sp, geom, b_i, cur, disp, cnt, bits):
            """One walk step for ONE (8,128) tile; returns the new
            (cur, disp, cnt, bits)."""
            cur = tile_advance(geom, b_i, cur)
            g = _lut(m_ref, main_idx(sp, cur, disp), sp.nb, sp.off, sp.k0)
            disp, cnt, bits = tile_finish(sp, cur, disp, cnt, bits, g)
            return cur, disp, cnt, bits

        if tile_major:
            # steps INNER, tiles outer: one tile's carry stays live
            # through the walk and the early exit is per 1024-position
            # tile.  MEASURED SLOWER on v5e (english 32 MiB: 0.57 vs
            # 1.12 GB/s, and 4x the Mosaic compile time) — the per-
            # tile conds and per-tile bank reloads cost more than the
            # big-carry scheduling they replace.  Kept as an
            # experiment knob; default stays step-major.
            cnts_o, bitss_o = [], []
            for i in range(tpc):
                c = (curs[i], disps[i], cnts[i]) + (
                    (bitss[i],) if emit_bitmap else ()
                )
                for si, sp in enumerate(steps):
                    def body(c, sp=sp, g=geoms[si], i=i):
                        r = tile_step(
                            sp, g, b_s[i], c[0], c[1], c[2],
                            c[3] if emit_bitmap else None,
                        )
                        return r[:4] if emit_bitmap else r[:3]

                    if si < cond_from:
                        c = body(c)
                    else:
                        c = jax.lax.cond(
                            jnp.any(c[1] != p0_miss), body, lambda c: c, c
                        )
                cnts_o.append(c[2])
                bitss_o.append(c[3] if emit_bitmap else None)
            cnts, bitss = cnts_o, bitss_o
        else:
            carry = (tuple(curs), tuple(disps), tuple(cnts)) + (
                (tuple(bitss),) if emit_bitmap else ()
            )
            # count mode excludes the bitmap tiles from the carry —
            # lax.cond copies every carried vreg on a skipped step
            for si, sp in enumerate(steps):
                use_groups = grouped and sp.nb >= _GROUP_MIN_NB

                def step(carry, sp=sp, g=geoms[si], use_groups=use_groups):
                    curs, disps, cnts = (
                        list(carry[0]), list(carry[1]), list(carry[2])
                    )
                    bitss = list(carry[3]) if emit_bitmap else None
                    if use_groups:
                        # phase A: advance windows, compute probe idxs
                        idxs, widxs = [], []
                        group_side = (
                            sp.kind == "pair" and sp.s_nb >= _GROUP_MIN_NB
                        )
                        wshift = 3 if sp.s_nibble else 2
                        for i in range(tpc):
                            curs[i] = tile_advance(g, b_s[i], curs[i])
                            idxs.append(main_idx(sp, curs[i], disps[i]))
                            if group_side:
                                widxs.append(
                                    jax.lax.shift_right_logical(
                                        disps[i] + (curs[i] & cbm), wshift
                                    )
                                )
                        # phase B: grouped main-table scan.  Group 0
                        # unconditional; each later group runs only
                        # while some LIVE walker's bank lies beyond
                        # the boundary (dead walkers carry the miss
                        # sentinel, whose bank is past every table).
                        ends = _group_ends(sp.nb)
                        accs = tuple(
                            _lut_range(
                                m_ref, idxs[i],
                                jnp.full(idxs[i].shape, -1, jnp.int32),
                                0, ends[0], sp.off, sp.k0,
                            )
                            for i in range(tpc)
                        )
                        for lo, hi in zip(ends[:-1], ends[1:]):
                            def probe(accs, lo=lo, hi=hi):
                                return tuple(
                                    _lut_range(
                                        m_ref, idxs[i], accs[i], lo, hi,
                                        sp.off, sp.k0,
                                    )
                                    for i in range(tpc)
                                )

                            bnd = (sp.k0 + lo) << 7
                            pend = (disps[0] != sp.miss) & (idxs[0] >= bnd)
                            for i in range(1, tpc):
                                pend = pend | (
                                    (disps[i] != sp.miss) & (idxs[i] >= bnd)
                                )
                            accs = jax.lax.cond(
                                jnp.any(pend), probe, lambda a: a, accs
                            )
                        # grouped SIDE scan (pair steps with big side
                        # tables): same structure over the packed words
                        waccs = [None] * tpc
                        if group_side:
                            s_ends = _group_ends(sp.s_nb)
                            waccs = tuple(
                                _lut_range(
                                    s_ref, widxs[i],
                                    jnp.full(
                                        widxs[i].shape, -1, jnp.int32
                                    ),
                                    0, s_ends[0], sp.s_off, sp.s_k0,
                                )
                                for i in range(tpc)
                            )
                            for lo, hi in zip(s_ends[:-1], s_ends[1:]):
                                def sprobe(waccs, lo=lo, hi=hi):
                                    return tuple(
                                        _lut_range(
                                            s_ref, widxs[i], waccs[i],
                                            lo, hi, sp.s_off, sp.s_k0,
                                        )
                                        for i in range(tpc)
                                    )

                                bnd = (sp.s_k0 + lo) << 7
                                pend = (
                                    (disps[0] != sp.miss)
                                    & (widxs[0] >= bnd)
                                )
                                for i in range(1, tpc):
                                    pend = pend | (
                                        (disps[i] != sp.miss)
                                        & (widxs[i] >= bnd)
                                    )
                                waccs = jax.lax.cond(
                                    jnp.any(pend), sprobe, lambda a: a,
                                    waccs,
                                )
                        # phase C: verify + update per tile
                        for i in range(tpc):
                            disps[i], cnts[i], new_bits = tile_finish(
                                sp, curs[i], disps[i], cnts[i],
                                bitss[i] if emit_bitmap else None,
                                accs[i], w_pre=waccs[i],
                            )
                            if emit_bitmap:
                                bitss[i] = new_bits
                    else:
                        for i in range(tpc):
                            r = tile_step(
                                sp, g, b_s[i], curs[i], disps[i], cnts[i],
                                bitss[i] if emit_bitmap else None,
                            )
                            curs[i], disps[i], cnts[i] = r[0], r[1], r[2]
                            if emit_bitmap:
                                bitss[i] = r[3]
                    out = (tuple(curs), tuple(disps), tuple(cnts))
                    return out + ((tuple(bitss),) if emit_bitmap else ())

                if si < cond_from:
                    carry = step(carry)
                else:
                    # p0_miss is the plan-wide sentinel: valid whether
                    # the previous step ran or was itself skipped
                    alive = carry[1][0] != p0_miss
                    for dsp in carry[1][1:]:
                        alive = alive | (dsp != p0_miss)
                    carry = jax.lax.cond(
                        jnp.any(alive), step, lambda c: c, carry
                    )
            cnts = carry[2]
            bitss = carry[3] if emit_bitmap else None
        if emit_bitmap:
            cnt_ref, bits_ref = out_refs
            for i in range(tpc):
                cnt_ref[pl.ds(i * _SUB, _SUB), :] = cnts[i]
                bits_ref[pl.ds(i * _SUB, _SUB), :] = bitss[i]
        else:
            (partial_ref,) = out_refs
            shift = shift_ref[0]
            acc = jnp.zeros((_SUB, _LANE), jnp.int32)
            for i in range(tpc):
                acc = acc + jnp.where(pos_s[i] >= shift, cnts[i], 0)
            partial_ref[:, :] = acc

    return kernel


_STATICS = (
    "steps", "nb_p0", "cb", "p0_miss", "p0_mode", "interpret", "tpc",
    "cond_from", "tile_major", "grouped",
)


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
    tile_major=False, grouped=False,
):
    from jax.experimental import pallas as pl

    n_cells, tpc = _common(data2d, tpc)
    kernel = _make_plan_kernel(
        steps=steps, nb_p0=nb_p0, cb=cb, p0_miss=p0_miss, p0_mode=p0_mode,
        emit_bitmap=True, tiles_per_cell=tpc, cond_from=cond_from,
        tile_major=tile_major, grouped=grouped,
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
    tile_major=False, grouped=False,
):
    from jax.experimental import pallas as pl

    n_cells, tpc = _common(data2d, tpc)
    kernel = _make_plan_kernel(
        steps=steps, nb_p0=nb_p0, cb=cb, p0_miss=p0_miss, p0_mode=p0_mode,
        emit_bitmap=False, tiles_per_cell=tpc, cond_from=cond_from,
        tile_major=tile_major, grouped=grouped,
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
                 tpc: int = 32, cond_from: int = 4,
                 tile_major: bool = False, train=None):
        # the tile-major experiment path has no grouped-scan support;
        # training would silently lose its effect there
        if tile_major and train is not None:
            raise ValueError("tile_major does not support trained tables")
        self.pt: PlanTables = build_plan_tables(shard, train=train)
        self.shard = shard
        self.interpret = interpret
        self.tpc = tpc
        self.cond_from = cond_from
        self.tile_major = tile_major
        self._code = jnp.asarray(self.pt.code_of)

    def _statics(self):
        pt = self.pt
        return dict(
            steps=pt.steps, nb_p0=pt.p0_banks.shape[0], cb=pt.code_bits,
            p0_miss=pt.p0_miss, p0_mode=pt.p0_mode,
            interpret=self.interpret, tpc=self.tpc,
            cond_from=self.cond_from, tile_major=self.tile_major,
            grouped=pt.trained,
        )

    def scan(self, data_padded, input_size, cfg, max_steps):
        if cfg.truncation == "segment":
            raise PairUnsupported("segment truncation needs stride-1")
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
            **self._statics(),
        )


class PlanCountScan:
    """Count-mode hybrid-stride scan (bench protocol: prepare + scan)."""

    def __init__(self, shard: ShardTables, max_steps: int, *,
                 interpret: bool = False, tpc: int = 32, cond_from: int = 4,
                 tile_major: bool = False, train=None):
        if tile_major and train is not None:
            raise ValueError("tile_major does not support trained tables")
        self.pt = build_plan_tables(shard, train=train)
        self.max_steps = max_steps
        self.interpret = interpret
        self.tpc = tpc
        self.cond_from = cond_from
        self.tile_major = tile_major
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
            cond_from=self.cond_from, tile_major=self.tile_major,
            grouped=pt.trained,
        )

    def __call__(self, data_padded, input_size, shift):
        return self.scan(self.prepare(data_padded, input_size),
                         input_size, shift)


def plan_count_scanner(shard: ShardTables, max_steps: int, *,
                       interpret: bool = False, tpc: int = 32,
                       cond_from: int = 4, train=None) -> PlanCountScan:
    return PlanCountScan(
        shard, max_steps, interpret=interpret, tpc=tpc, cond_from=cond_from,
        train=train,
    )
