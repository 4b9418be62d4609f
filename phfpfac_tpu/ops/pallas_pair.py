"""Pallas TPU PFAC kernel over stride-2 (pair) depth tables.

The fastest path for compact-alphabet dictionaries (compile.pair):
two input bytes per probe, so both multiplicative costs of the
banked-LUT walk drop by ~2x versus ops.pallas_depth — total table
banks (only even-depth classes materialize) and walk steps (fixed
per-step overhead, early-exit checks).

Per pair step k (depths 2k+1 and 2k+2):
    idx  = disp + pair;         g = lut(P_k, idx)
    hit  = g >= 0 and (g & pair_mask) == pair
    fin_end = hit and (g >> 2CB) & 1;   disp' = hit ? g >> (2CB+1) : MISS
    sidx = disp + (pair >> CB);  w = lut(S_k, sidx >> 2)   # 4 B/word
    fin_mid = ((w >> ((sidx & 3) * 8)) & 255) == (pair >> CB) + 1

The staged device input holds PAIR SYMBOLS per position
(``code[i] << CB | code[i+1]``), computed once per corpus per
dictionary alphabet (stage_pairs).  Bytes outside the dictionary
alphabet and past input_size carry the reserved miss code, so no
bounds masking is needed anywhere (cf. ops.pallas_depth PAD_CHAR).

Bitmap semantics are unchanged (bit t == match of length t+1), so
ops.bitmap.decode_bitmap recovers pattern ids as usual.  Segment
truncation is NOT supported here (a stride-2 walk cannot reproduce
master_kernel.cu:141-144 mid-pair cuts exactly); callers use the
stride-1 depth kernel for that parity mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phfpfac_tpu.compile.pair import PairTables, PairUnsupported, build_pair_tables
from phfpfac_tpu.compile.tables import ShardTables
from phfpfac_tpu.ops.pallas_depth import _common, staged_rows
from phfpfac_tpu.ops.pallas_scan import _LANE, _SUB, TILE, _lut


@functools.partial(jax.jit, static_argnames=("n_rows", "cb"))
def stage_pairs(data, input_size, code_of, *, n_rows: int, cb: int):
    """uint8 stream -> (n_rows, 128) int32 pair-symbol device format."""
    L = n_rows * _LANE
    miss_code = jnp.max(code_of)  # code_of maps unused bytes to sigma
    codes = jnp.full((L,), 0, jnp.int32).at[: data.shape[0]].set(
        jnp.take(code_of, data.astype(jnp.int32))
    )
    codes = jnp.where(
        jnp.arange(L, dtype=jnp.int32) < input_size, codes, miss_code
    )
    nxt = jnp.concatenate([codes[1:], jnp.full((1,), miss_code, jnp.int32)])
    # pair symbol = (second << CB) | first — see compile.pair
    pairs = (nxt << cb) | codes
    return pairs.reshape(n_rows, _LANE)


@functools.partial(
    jax.jit, static_argnames=("n_rows", "cb", "rpc", "offsets")
)
def stage_planes(data, input_size, code_of, *, n_rows: int, cb: int,
                 rpc: int, offsets: tuple):
    """Multi-plane staged input: the pair-symbol stream PRE-SHIFTED at
    every window offset the fused step trace reads (ops.pallas_plan
    .fresh_window_offsets), laid out cell-major:

        [cell 0: plane(off_0) rows, plane(off_1) rows, ...][cell 1: ...]

    so one BlockSpec block per grid cell carries every plane and the
    kernel's window(i, off) is a single VMEM block read — zero lane
    rotates, zero selects, no halo tile (each plane carries its own
    shift).  Costs len(offsets) x the input stream's HBM footprint
    and DMA traffic; the traffic is hidden behind the VPU-bound scan
    (measured r4: even 2x-narrower staging saved nothing because the
    stream is already fully double-buffered) and the footprint is the
    staging buffer only.  One-time staging cost, excluded from kernel
    timing exactly like the reference's H2D copies
    (master_kernel.cu:400-423)."""
    pairs = stage_pairs(data, input_size, code_of, n_rows=n_rows, cb=cb)
    flat = pairs.reshape(-1)
    n_cells = (n_rows - _SUB) // rpc
    L = n_cells * rpc * _LANE
    planes = jnp.stack(
        [
            jax.lax.dynamic_slice(flat, (off,), (L,))
            for off in offsets
        ]
    ).reshape(len(offsets), n_cells, rpc, _LANE)
    return (
        planes.transpose(1, 0, 2, 3)
        .reshape(n_cells * len(offsets) * rpc, _LANE)
    )


@functools.partial(jax.jit, static_argnames=("n_rows", "cb", "rpc"))
def stage_pairs16(data, input_size, code_of, *, n_rows: int, cb: int,
                  rpc: int):
    """16-bit staged pair stream + per-cell int32 halo blocks.

    Same pair symbols as ``stage_pairs`` (2*cb <= 14 bits, so int16 is
    lossless) stored half-width, halving the scan's HBM->VMEM input
    streaming.  The per-cell halo rows are materialized separately as
    int32 ``(_SUB, 128)`` blocks because an 8-row int16 block would
    straddle the (16, 128) native tile; ``rpc`` is the kernel's
    rows-per-cell (tpc * _SUB).  One-time staging cost, excluded from
    kernel timing exactly like the reference's H2D copies
    (master_kernel.cu:400-423)."""
    pairs = stage_pairs(data, input_size, code_of, n_rows=n_rows, cb=cb)
    d16 = pairs.astype(jnp.int16)
    n_cells = (n_rows - _SUB) // rpc
    halo = pairs[rpc:]
    halo = jnp.pad(halo, ((0, n_cells * rpc - halo.shape[0]), (0, 0)))
    halo = halo.reshape(n_cells, rpc, _LANE)[:, :_SUB]
    return d16, halo.reshape(n_cells * _SUB, _LANE)


def _make_pair_kernel(
    *,
    n_pair_steps: int,
    p_offs: tuple, p_nbs: tuple, p_k0s: tuple,
    s_offs: tuple, s_nbs: tuple, s_k0s: tuple,
    nb_p0: int, cb: int, disp_miss: int, s_nibbles: tuple,
    emit_bitmap: bool, tiles_per_cell: int, cond_from: int,
):
    from jax.experimental import pallas as pl

    tpc = tiles_per_cell
    pair_mask = (1 << (2 * cb)) - 1
    fin_bit = 1 << (2 * cb)
    val_shift = 2 * cb + 1

    def kernel(in_ref, halo_ref, shift_ref, p0_ref, p_ref, s_ref, *out_refs):
        cell = pl.program_id(0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
        lane_next2 = (lane + 2) & (_LANE - 1)
        at_tail = lane >= (_LANE - 2)
        lane_par = lane & 1  # 126 -> 0, 127 -> 1 for the halo refill

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

        # pair step 0: dense depths-1+2 probe
        curs, disps, cnts, bitss = [], [], [], []
        for i in range(tpc):
            cur = a_s[i]
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
                jnp.where(alive, jax.lax.shift_right_logical(v, 2), disp_miss)
            )
            curs.append(cur)

        # carry excludes the bitmap tiles in count mode — lax.cond
        # copies every carried vreg per skipped step, a real cost
        carry = (tuple(curs), tuple(disps), tuple(cnts)) + (
            (tuple(bitss),) if emit_bitmap else ()
        )

        def one_step(carry, k):
            po, pn, pk0 = p_offs[k - 1], p_nbs[k - 1], p_k0s[k - 1]
            so, sn, sk0 = s_offs[k - 1], s_nbs[k - 1], s_k0s[k - 1]
            curs, disps, cnts = (
                list(carry[0]), list(carry[1]), list(carry[2])
            )
            bitss = list(carry[3]) if emit_bitmap else None
            for i in range(tpc):
                rolled = jnp.take_along_axis(curs[i], lane_next2, axis=1)
                bidx = jnp.broadcast_to(
                    jnp.int32(2 * k - 2), (_SUB, _LANE)
                ) + lane_par
                bcol = jnp.take_along_axis(b_s[i], bidx, axis=1)
                cur = jnp.where(at_tail, bcol, rolled)
                disp = disps[i]
                # odd-completion (side) probe: fin for depth 2k+1.
                # Nibble mode stores (code & 7) + 1, sound because the
                # layout forbids cross-row mod-8 aliases (compile.pair)
                a1 = cur & ((1 << cb) - 1)
                sidx = disp + a1
                if s_nibbles[k - 1]:
                    w = _lut(s_ref, jax.lax.shift_right_logical(sidx, 3),
                             sn, so, sk0)
                    nib = (
                        jax.lax.shift_right_logical(w, (sidx & 7) << 2)
                    ) & 15
                    fin_mid = nib == (a1 & 7) + 1
                else:
                    w = _lut(s_ref, jax.lax.shift_right_logical(sidx, 2),
                             sn, so, sk0)
                    byte = (
                        jax.lax.shift_right_logical(w, (sidx & 3) << 3)
                    ) & 255
                    fin_mid = byte == a1 + 1
                # pair probe: fin for depth 2k+2 + next displacement
                idx = disp + cur
                g = _lut(p_ref, idx, pn, po, pk0)
                hit = (g >= 0) & ((g & pair_mask) == cur)
                fin_end = hit & ((g & fin_bit) != 0)
                cnts[i] = (
                    cnts[i]
                    + fin_mid.astype(jnp.int32)
                    + fin_end.astype(jnp.int32)
                )
                if emit_bitmap:
                    bitss[i] = (
                        bitss[i]
                        | jnp.where(fin_mid, jnp.int32(1) << (2 * k), 0)
                        | jnp.where(
                            fin_end, jnp.int32(1) << (2 * k + 1), 0
                        )
                    )
                disps[i] = jnp.where(
                    hit,
                    jax.lax.shift_right_logical(g, val_shift),
                    disp_miss,
                )
                curs[i] = cur
            out = (tuple(curs), tuple(disps), tuple(cnts))
            return out + ((tuple(bitss),) if emit_bitmap else ())

        for k in range(1, n_pair_steps):
            if k < cond_from:
                carry = one_step(carry, k)
                continue
            alive = carry[1][0] != disp_miss
            for d in carry[1][1:]:
                alive = alive | (d != disp_miss)
            carry = jax.lax.cond(
                jnp.any(alive),
                lambda c, k=k: one_step(c, k),
                lambda c: c,
                carry,
            )

        curs, _disps, cnts = carry[0], carry[1], carry[2]
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
    "n_pair_steps", "p_offs", "p_nbs", "p_k0s", "s_offs", "s_nbs",
    "s_k0s", "nb_p0", "cb", "disp_miss", "s_nibbles", "interpret",
    "tpc", "cond_from",
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
def _pair_scan_bitmap(
    data2d, s0_dummy, p0_banks, packed_banks, side_banks,
    *, n_pair_steps, p_offs, p_nbs, p_k0s, s_offs, s_nbs, s_k0s,
    nb_p0, cb, disp_miss, s_nibbles, interpret, tpc, cond_from,
):
    from jax.experimental import pallas as pl

    n_cells, tpc = _common(data2d, tpc)
    kernel = _make_pair_kernel(
        n_pair_steps=n_pair_steps, p_offs=p_offs, p_nbs=p_nbs,
        p_k0s=p_k0s, s_offs=s_offs, s_nbs=s_nbs, s_k0s=s_k0s,
        nb_p0=nb_p0, cb=cb, s_nibbles=s_nibbles,
        disp_miss=disp_miss, emit_bitmap=True, tiles_per_cell=tpc,
        cond_from=cond_from,
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
def _pair_scan_count(
    data2d, shift, p0_banks, packed_banks, side_banks,
    *, n_pair_steps, p_offs, p_nbs, p_k0s, s_offs, s_nbs, s_k0s,
    nb_p0, cb, disp_miss, s_nibbles, interpret, tpc, cond_from,
):
    from jax.experimental import pallas as pl

    n_cells, tpc = _common(data2d, tpc)
    kernel = _make_pair_kernel(
        n_pair_steps=n_pair_steps, p_offs=p_offs, p_nbs=p_nbs,
        p_k0s=p_k0s, s_offs=s_offs, s_nbs=s_nbs, s_k0s=s_k0s,
        nb_p0=nb_p0, cb=cb, s_nibbles=s_nibbles,
        disp_miss=disp_miss, emit_bitmap=False, tiles_per_cell=tpc,
        cond_from=cond_from,
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


class PairShardScanner:
    """Bitmap-mode stride-2 scanner for one shard (exact-mode only)."""

    def __init__(self, shard: ShardTables, *, interpret: bool = False,
                 tpc: int = 16, cond_from: int = 5):
        self.pt: PairTables = build_pair_tables(shard)
        self.shard = shard
        self.interpret = interpret
        self.tpc = tpc
        self.cond_from = cond_from
        self._code = jnp.asarray(self.pt.code_of)

    def _statics(self):
        pt = self.pt
        return dict(
            n_pair_steps=pt.n_pair_steps, p_offs=pt.p_offs, p_nbs=pt.p_nbs,
            p_k0s=pt.p_k0s, s_offs=pt.s_offs, s_nbs=pt.s_nbs,
            s_k0s=pt.s_k0s,
            nb_p0=pt.p0_banks.shape[0], cb=pt.code_bits,
            disp_miss=pt.disp_miss, s_nibbles=pt.s_nibbles,
            interpret=self.interpret, tpc=self.tpc,
            cond_from=self.cond_from,
        )

    def scan(self, data_padded, input_size, cfg, max_steps):
        if cfg.truncation == "segment":
            raise PairUnsupported("segment truncation needs stride-1")
        n_pos = len(data_padded) - max_steps
        data2d = stage_pairs(
            jnp.asarray(data_padded), jnp.asarray(np.int32(input_size)),
            self._code, n_rows=staged_rows(n_pos), cb=self.pt.code_bits,
        )
        return _pair_scan_bitmap(
            data2d, jnp.zeros(1, jnp.int32),
            jnp.asarray(self.pt.p0_banks),
            jnp.asarray(self.pt.packed_banks),
            jnp.asarray(self.pt.side_banks),
            **self._statics(),
        )


class PairCountScan:
    """Count-mode stride-2 scan (bench protocol: prepare + scan)."""

    def __init__(self, shard: ShardTables, max_steps: int, *,
                 interpret: bool = False, tpc: int = 16, cond_from: int = 5):
        self.pt = build_pair_tables(shard)
        self.max_steps = max_steps
        self.interpret = interpret
        self.tpc = tpc
        self.cond_from = cond_from
        self._code = jnp.asarray(self.pt.code_of)
        self._p0 = jnp.asarray(self.pt.p0_banks)
        self._p = jnp.asarray(self.pt.packed_banks)
        self._s = jnp.asarray(self.pt.side_banks)

    def prepare(self, data_padded, input_size):
        n_pos = len(data_padded) - self.max_steps
        return stage_pairs(
            jnp.asarray(data_padded), jnp.asarray(np.int32(input_size)),
            self._code, n_rows=staged_rows(n_pos), cb=self.pt.code_bits,
        )

    def scan(self, staged, input_size, shift):
        pt = self.pt
        return _pair_scan_count(
            staged, jnp.asarray(shift, jnp.int32),
            self._p0, self._p, self._s,
            n_pair_steps=pt.n_pair_steps, p_offs=pt.p_offs, p_nbs=pt.p_nbs,
            p_k0s=pt.p_k0s, s_offs=pt.s_offs, s_nbs=pt.s_nbs,
            s_k0s=pt.s_k0s,
            nb_p0=pt.p0_banks.shape[0], cb=pt.code_bits,
            disp_miss=pt.disp_miss, s_nibbles=pt.s_nibbles,
            interpret=self.interpret, tpc=self.tpc,
            cond_from=self.cond_from,
        )

    def __call__(self, data_padded, input_size, shift):
        return self.scan(self.prepare(data_padded, input_size),
                         input_size, shift)


def pair_count_scanner(shard: ShardTables, max_steps: int, *,
                       interpret: bool = False, tpc: int = 16,
                       cond_from: int = 3) -> PairCountScan:
    return PairCountScan(
        shard, max_steps, interpret=interpret, tpc=tpc, cond_from=cond_from
    )
