"""Pallas TPU PFAC kernel — banked lane-LUT automaton walk.

The rebuild of ``TraceTable_kernel`` (master_kernel.cu:92-180) as a
TPU kernel.  Design driven by measured v5e primitives (bench/):

* XLA's generic gather runs ~0.13 G-lookups/s on TPU (serialized);
* Mosaic's ``dynamic_gather`` (``jnp.take_along_axis`` on (8,128)
  tiles, the VPU lane shuffle) runs ~270 G-lookups/s;

so the kernel expresses every table lookup as a *banked 128-lane LUT*:
a table of T entries is stored as (ceil(T/128), 128) banks, and a
vectorized probe is an unrolled loop of per-bank lane-gathers merged
by bank-index selects — ~3 vector ops per 128 table entries.  This is
the TPU replacement for the reference's texture fetches
(master_kernel.cu:55-61): where the GPU has a hardware random-access
cache path, the TPU has a vector shuffle, so the table must be small
per automaton.  The dictionary is therefore pattern-sharded until each
shard's PHF fits a small bank budget (the compile pipeline already
shards; ``recommended_shards`` picks the count), and shards ride the
kernel grid / mesh axes.

Walk semantics are identical to ops.reference_jnp (one walker per
byte offset, PHF probe key = state*256 + char, final states < k emit).
Per grid cell, TILE positions walk together with a while-loop that
exits as soon as every lane is dead — the TPU analog of CUDA threads
idling out (:49-66), but at tile granularity.

Outputs per position: match count and a step-bitmap (bit t set iff a
match of length t+1 starts there, max_pat_len <= 32).  The bitmap is a
complete match encoding: (pos, t) identifies the matched pattern
uniquely (the dictionary is prefix-closed along a walk), so match ids
are recovered with a cheap post-pass (ops.bitmap.decode_bitmap).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from phfpfac_tpu.compile.tables import ShardTables
from phfpfac_tpu.ops.turbo_jnp import TurboTables, build_turbo_tables

TILE = 1024  # positions per grid cell: one (8,128) int32 vreg tile
_SUB = 8
_LANE = 128

MAX_BITMAP_STEPS = 32


def _to_banks(arr: np.ndarray, fill: int) -> np.ndarray:
    nb = max(1, -(-len(arr) // _LANE))
    out = np.full((nb, _LANE), fill, dtype=np.int32)
    out.ravel()[: len(arr)] = arr
    return out


class PallasTables:
    """Bank-layout tables for the pallas kernel (one shard).

    Unlike the XLA turbo path, the banked LUT needs no guard bands:
    an index outside [0, nb*128) selects no bank and yields the -1
    miss sentinel, so sentinel/negative displacements miss naturally
    and every bank is real table payload.
    """

    def __init__(self, shard: ShardTables, tt: TurboTables | None = None):
        tt = tt or build_turbo_tables(shard)
        if not tt.is_packed:
            raise ValueError("pallas kernel requires packed tables")
        self.s0 = _to_banks(tt.s0, tt.dead)
        # unbiased r with sentinel rows for the DEAD state; sentinel and
        # empty-row displacements produce out-of-range probe indices,
        # which the banked LUT resolves to a miss
        n_sent = len(tt.r) - len(shard.r)
        r_raw = np.concatenate(
            [shard.r, np.full(n_sent, -(2**30), dtype=np.int32)]
        )
        self.r = _to_banks(r_raw, -(2**30))
        packed_raw = np.where(
            shard.ht >= 0,
            (shard.val.astype(np.int64) << tt.row_bits)
            | shard.ht.astype(np.int64),
            -1,
        ).astype(np.int32)
        self.packed = _to_banks(packed_raw, -1)
        self.width_bit = tt.width_bit
        self.row_bits = tt.row_bits
        self.dead = int(tt.dead)
        self.num_final = tt.num_final
        self.max_pat_len = tt.max_pat_len

    @property
    def n_banks(self) -> int:
        return self.packed.shape[0]


def recommended_shards(num_patterns: int, target_states: int = 900) -> int:
    """Shard count keeping each automaton's bank budget small.

    Interior states ~= patterns * (avg unique suffix), conservatively
    ~2.2x patterns for english-like dictionaries.
    """
    est_states = max(int(num_patterns * 2.2), 1)
    return max(1, math.ceil(est_states / target_states))


def _lut(banks_ref, idx, nb: int, off: int = 0, k0: int = 0):
    """Banked 128-lane LUT:
    result[i] = banks[off:off+nb].ravel()[idx[i] - k0*128].

    ``idx`` is an (8,128) int32 tile; indices outside
    [k0*128, (k0+nb)*128) select no bank and yield -1 (miss).  ``k0``
    lets callers trim leading all-empty banks from a table without
    touching the probe indices — only the compare constants change.
    Cost: nb x (lane-gather + compare + select).
    """
    # arithmetic shift keeps negative idx out of every bank -> miss
    bank = idx >> 7
    lane = idx & (_LANE - 1)
    acc = jnp.full(idx.shape, -1, dtype=jnp.int32)
    for k in range(nb):
        row = jnp.broadcast_to(banks_ref[off + k, :][None, :], idx.shape)
        g = jnp.take_along_axis(row, lane, axis=1)
        acc = jnp.where(bank == k + k0, g, acc)
    return acc


def _make_kernel(
    *,
    max_steps: int,
    width_bit: int,
    row_bits: int,
    dead: int,
    num_final: int,
    nb_s0: int,
    nb_r: int,
    nb_packed: int,
    seg_bytes: int,
    halo_bytes: int,
    emit_bitmap: bool,
):
    width_m1 = (1 << width_bit) - 1
    row_mask = (1 << row_bits) - 1

    def kernel(in_ref, size_ref, s0_ref, r_ref, packed_ref, cnt_ref, bits_ref):
        from jax.experimental import pallas as pl

        cell = pl.program_id(0)
        base = cell * TILE
        input_size = size_ref[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
        pos = base + sub * _LANE + lane  # global positions of this tile

        # per-position walk limit (master_kernel.cu:141-144 semantics)
        if seg_bytes > 0:
            seg_end = (pos // seg_bytes + 1) * seg_bytes
            lim = jnp.minimum(input_size, seg_end + halo_bytes)
        else:
            lim = jnp.minimum(input_size, pos + max_steps)

        # in_ref is int32 [rows, 128]; this tile's bytes are rows
        # [cell*8, cell*8+8), the +t shifted window additionally reads
        # row cell*8+8 (t <= 32 < 128).  A shifted view is two lane
        # rolls merged by a boundary select — Mosaic has no 1D<->2D
        # vector reshape, but the lane shuffle is the fast primitive
        # here anyway.
        a = in_ref[pl.ds(cell * _SUB, _SUB), :]
        b = in_ref[pl.ds(cell * _SUB + 1, _SUB), :]

        def chars_at(t):
            if isinstance(t, int) and t == 0:
                return a
            idx = lane + t
            wrapped = idx & (_LANE - 1)
            ga = jnp.take_along_axis(a, wrapped, axis=1)
            gb = jnp.take_along_axis(b, wrapped, axis=1)
            return jnp.where(idx < _LANE, ga, gb)

        c0 = chars_at(0)
        state = jnp.where(pos < input_size, _lut(s0_ref, c0, nb_s0), dead)
        fin = state < num_final
        cnt = fin.astype(jnp.int32)
        bits = fin.astype(jnp.int32)  # bit 0

        def cond(carry):
            t, state, _cnt, _bits = carry
            return (t < max_steps) & jnp.any(state != dead)

        def body(carry):
            t, state, cnt, bits = carry
            state = jnp.where(pos + t < lim, state, dead)
            ch = chars_at(t)
            key = (state << 8) + ch
            row = jax.lax.shift_right_logical(key, width_bit)
            col = key & width_m1
            idx = _lut(r_ref, row, nb_r) + col
            g = _lut(packed_ref, idx, nb_packed)
            hit = (g & row_mask) == row
            state = jnp.where(hit, jax.lax.shift_right_logical(g, row_bits), dead)
            fin = state < num_final
            cnt = cnt + fin.astype(jnp.int32)
            if emit_bitmap:
                bits = bits | jnp.where(fin, jnp.int32(1) << t, 0)
            return t + 1, state, cnt, bits

        _t, _state, cnt, bits = jax.lax.while_loop(
            cond, body, (jnp.int32(1), state, cnt, bits)
        )
        cnt_ref[:] = cnt
        bits_ref[:] = bits

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_steps", "width_bit", "row_bits", "dead", "num_final",
        "nb_s0", "nb_r", "nb_packed", "seg_bytes", "halo_bytes",
        "emit_bitmap", "interpret",
    ),
)
def _pallas_scan(
    data,  # uint8 [n_pos + pad] with n_pos = k*TILE
    input_size,  # int32
    s0_banks, r_banks, packed_banks,
    *,
    max_steps: int,
    width_bit: int, row_bits: int, dead: int, num_final: int,
    nb_s0: int, nb_r: int, nb_packed: int,
    seg_bytes: int, halo_bytes: int,
    emit_bitmap: bool,
    interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pos = data.shape[0] - max_steps
    assert n_pos % TILE == 0
    n_cells = n_pos // TILE

    # int32 [rows, 128] view of the byte stream (+1 halo row for the
    # shifted-window loads)
    n_rows = n_cells * _SUB + 1
    flat = jnp.zeros((n_rows * _LANE,), jnp.int32).at[: data.shape[0]].set(
        data.astype(jnp.int32)
    )
    data2d = flat.reshape(n_rows, _LANE)

    kernel = _make_kernel(
        max_steps=max_steps, width_bit=width_bit, row_bits=row_bits,
        dead=dead, num_final=num_final, nb_s0=nb_s0, nb_r=nb_r,
        nb_packed=nb_packed, seg_bytes=seg_bytes, halo_bytes=halo_bytes,
        emit_bitmap=emit_bitmap,
    )

    cnt, bits = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_cells * _SUB, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((n_cells * _SUB, _LANE), jnp.int32),
        ),
        interpret=interpret,
    )(data2d, input_size.reshape(1), s0_banks, r_banks, packed_banks)
    return cnt.reshape(-1), bits.reshape(-1)


class PallasShardScanner:
    """Scans one shard with the pallas kernel; emits counts + bitmaps."""

    def __init__(self, shard: ShardTables, *, interpret: bool = False):
        self.pt = PallasTables(shard)
        self.shard = shard
        self.interpret = interpret

    def scan(self, data_padded, input_size, cfg, max_steps):
        if max_steps > MAX_BITMAP_STEPS:
            raise ValueError(
                f"pallas bitmap path supports max_pat_len <= "
                f"{MAX_BITMAP_STEPS}, got steps {max_steps}"
            )
        pt = self.pt
        seg = cfg.segment_bytes if cfg.truncation == "segment" else 0
        return _pallas_scan(
            jnp.asarray(data_padded),
            jnp.int32(input_size),
            jnp.asarray(pt.s0), jnp.asarray(pt.r), jnp.asarray(pt.packed),
            max_steps=max_steps,
            width_bit=pt.width_bit, row_bits=pt.row_bits,
            dead=pt.dead, num_final=pt.num_final,
            nb_s0=pt.s0.shape[0], nb_r=pt.r.shape[0],
            nb_packed=pt.packed.shape[0],
            seg_bytes=seg, halo_bytes=cfg.halo_bytes,
            emit_bitmap=True,
            interpret=self.interpret,
        )


def pallas_count_scanner(shard: ShardTables, max_steps: int, *, interpret=False):
    """Count-mode scan fn(data, input_size, shift) -> total (for bench)."""
    if max_steps > _LANE:
        # the staged int32 view carries one halo row (128 bytes); fail
        # at construction so engine_select can fall back to XLA
        raise ValueError(f"pallas scan supports max_steps <= {_LANE}")
    pt = PallasTables(shard)

    @jax.jit
    def scan(data, input_size, shift):
        cnt, _ = _pallas_scan(
            data,
            jnp.asarray(input_size, jnp.int32),
            jnp.asarray(pt.s0), jnp.asarray(pt.r), jnp.asarray(pt.packed),
            max_steps=max_steps,
            width_bit=pt.width_bit, row_bits=pt.row_bits,
            dead=pt.dead, num_final=pt.num_final,
            nb_s0=pt.s0.shape[0], nb_r=pt.r.shape[0],
            nb_packed=pt.packed.shape[0],
            seg_bytes=0, halo_bytes=0,
            emit_bitmap=False,
            interpret=interpret,
        )
        n_pos = cnt.shape[0]
        keep = jnp.arange(n_pos, dtype=jnp.int32) >= shift
        return jnp.where(keep, cnt, 0).sum()

    return scan


# ---------------------------------------------------------------------------
# Fused multi-shard kernel: all dictionary shards walk per grid cell in
# one pallas_call (one launch, shared char-window staging), each shard
# keeping its own early-exit while-loop.  This is the TPU replacement
# for the reference's streamnum-shards-per-GPU concurrency
# (main.cc:225-241): instead of CUDA streams multiplexing one device,
# the shard loop is fused into the kernel and pipelining happens across
# grid cells.
# ---------------------------------------------------------------------------


def _make_multi_kernel(
    specs, *, max_steps, seg_bytes, halo_bytes, emit_bitmap,
    tiles_per_cell: int, unroll: int,
):
    """specs: per-shard dict(width_bit,row_bits,dead,num_final,
    s0_off,nb_s0,r_off,nb_r,p_off,nb_p) — all static.

    Per grid cell, ``tiles_per_cell`` (8,128) position tiles step in
    lockstep and the walk loop advances ``unroll`` probes per while
    iteration: the while-loop's fixed per-iteration cost (measured
    ~0.3-0.5 us on v5e) dominates the banked-LUT vector work, so
    amortizing it across more lanes and steps is the main lever.
    Overshot steps are no-ops (dead walks stay dead through the same
    data path; the bit shift is clamped).
    """
    tpc = tiles_per_cell

    def kernel(in_ref, size_ref, s0_ref, r_ref, packed_ref, cnt_ref, bits_ref):
        from jax.experimental import pallas as pl

        cell = pl.program_id(0)
        input_size = size_ref[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
        lane_next = (lane + 1) & (_LANE - 1)  # constant roll index
        at_127 = lane == (_LANE - 1)

        block = in_ref[pl.ds(cell * _SUB * tpc, _SUB * tpc + 1), :]
        a_s = [block[i * _SUB : (i + 1) * _SUB, :] for i in range(tpc)]
        b_s = [block[i * _SUB + 1 : (i + 1) * _SUB + 1, :] for i in range(tpc)]
        pos_s, lim_s = [], []
        for i in range(tpc):
            pos = (cell * tpc + i) * TILE + sub * _LANE + lane
            pos_s.append(pos)
            if seg_bytes > 0:
                seg_end = (pos // seg_bytes + 1) * seg_bytes
                lim_s.append(jnp.minimum(input_size, seg_end + halo_bytes))
            else:
                lim_s.append(jnp.minimum(input_size, pos + max_steps))

        total_cnt = [jnp.zeros((_SUB, _LANE), jnp.int32) for _ in range(tpc)]
        for si, sp in enumerate(specs):
            width_m1 = (1 << sp["width_bit"]) - 1
            row_mask = (1 << sp["row_bits"]) - 1
            dead = sp["dead"]
            num_final = sp["num_final"]

            sts, cnts, bitss = [], [], []
            for i in range(tpc):
                st = jnp.where(
                    pos_s[i] < input_size,
                    _lut(s0_ref, a_s[i], sp["nb_s0"], sp["s0_off"]),
                    dead,
                )
                fin = st < num_final
                sts.append(st)
                cnts.append(fin.astype(jnp.int32))
                bitss.append(fin.astype(jnp.int32))

            def cond(carry):
                t, _curs, sts, _cnts, _bits = carry
                alive = sts[0] != dead
                for st in sts[1:]:
                    alive = alive | (st != dead)
                return (t < max_steps) & jnp.any(alive)

            def step_one(t, i, cur, st, cnt, bits, sp=sp, dead=dead,
                         num_final=num_final, width_m1=width_m1,
                         row_mask=row_mask):
                # incremental shifted window: cur_t = roll(cur, -1) with
                # lane 127 refilled from the halo row's column t-1
                rolled = jnp.take_along_axis(cur, lane_next, axis=1)
                bcol = jnp.take_along_axis(
                    b_s[i],
                    jnp.broadcast_to((t - 1) & (_LANE - 1), (_SUB, _LANE)),
                    axis=1,
                )
                cur = jnp.where(at_127, bcol, rolled)
                st = jnp.where(pos_s[i] + t < lim_s[i], st, dead)
                key = (st << 8) + cur
                row = jax.lax.shift_right_logical(key, sp["width_bit"])
                col = key & width_m1
                idx = _lut(r_ref, row, sp["nb_r"], sp["r_off"]) + col
                g = _lut(packed_ref, idx, sp["nb_p"], sp["p_off"])
                hit = (g & row_mask) == row
                st = jnp.where(
                    hit, jax.lax.shift_right_logical(g, sp["row_bits"]), dead
                )
                fin = st < num_final
                cnt = cnt + fin.astype(jnp.int32)
                if emit_bitmap:
                    tb = jnp.minimum(t, MAX_BITMAP_STEPS - 1)
                    bits = bits | jnp.where(fin, jnp.int32(1) << tb, 0)
                return cur, st, cnt, bits

            def body(carry):
                t, curs, sts, cnts, bitss = carry
                curs, sts, cnts, bitss = (
                    list(curs), list(sts), list(cnts), list(bitss)
                )
                for u in range(unroll):
                    for i in range(tpc):
                        curs[i], sts[i], cnts[i], bitss[i] = step_one(
                            t + u, i, curs[i], sts[i], cnts[i], bitss[i]
                        )
                return (
                    t + unroll, tuple(curs), tuple(sts),
                    tuple(cnts), tuple(bitss),
                )

            _t, _curs, _sts, cnts, bitss = jax.lax.while_loop(
                cond,
                body,
                (jnp.int32(1), tuple(a_s), tuple(sts),
                 tuple(cnts), tuple(bitss)),
            )
            for i in range(tpc):
                total_cnt[i] = total_cnt[i] + cnts[i]
                if emit_bitmap:
                    bits_ref[si, pl.ds(i * _SUB, _SUB), :] = bitss[i]
        for i in range(tpc):
            cnt_ref[pl.ds(i * _SUB, _SUB), :] = total_cnt[i]
        if not emit_bitmap:
            bits_ref[0, :, :] = jnp.zeros((tpc * _SUB, _LANE), jnp.int32)

    return kernel


class MultiShardScanner:
    """All shards in one fused pallas kernel.

    scan(data_padded, input_size, cfg, max_steps, emit_bitmap) ->
      (counts [n_pos] summed over shards,
       bitmaps [num_shards, n_pos] or None)
    """

    def __init__(self, shards: list[ShardTables], *, interpret: bool = False):
        self.pts = [PallasTables(sh) for sh in shards]
        self.interpret = interpret
        self.specs = []
        s0s, rs, ps = [], [], []
        s0_off = r_off = p_off = 0
        for pt in self.pts:
            self.specs.append(
                dict(
                    width_bit=pt.width_bit, row_bits=pt.row_bits,
                    dead=pt.dead, num_final=pt.num_final,
                    s0_off=s0_off, nb_s0=pt.s0.shape[0],
                    r_off=r_off, nb_r=pt.r.shape[0],
                    p_off=p_off, nb_p=pt.packed.shape[0],
                )
            )
            s0s.append(pt.s0)
            rs.append(pt.r)
            ps.append(pt.packed)
            s0_off += pt.s0.shape[0]
            r_off += pt.r.shape[0]
            p_off += pt.packed.shape[0]
        self.s0_banks = np.concatenate(s0s)
        self.r_banks = np.concatenate(rs)
        self.p_banks = np.concatenate(ps)

    def scan(self, data_padded, input_size, cfg, max_steps, *, emit_bitmap=True):
        if emit_bitmap and max_steps > MAX_BITMAP_STEPS:
            raise ValueError(
                f"pallas bitmap path supports max_pat_len <= "
                f"{MAX_BITMAP_STEPS}, got steps {max_steps}"
            )
        seg = cfg.segment_bytes if cfg.truncation == "segment" else 0
        cnt, bits = _pallas_scan_multi(
            jnp.asarray(data_padded),
            jnp.asarray(np.int32(input_size)),
            jnp.asarray(self.s0_banks),
            jnp.asarray(self.r_banks),
            jnp.asarray(self.p_banks),
            specs=tuple(tuple(sorted(s.items())) for s in self.specs),
            max_steps=max_steps,
            seg_bytes=seg,
            halo_bytes=cfg.halo_bytes,
            emit_bitmap=emit_bitmap,
            interpret=self.interpret,
        )
        return cnt, (bits if emit_bitmap else None)


@functools.partial(
    jax.jit,
    static_argnames=(
        "specs", "max_steps", "seg_bytes", "halo_bytes",
        "emit_bitmap", "interpret",
    ),
)
def _pallas_scan_multi(
    data, input_size, s0_banks, r_banks, packed_banks,
    *, specs, max_steps, seg_bytes, halo_bytes, emit_bitmap, interpret,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec_dicts = [dict(s) for s in specs]
    n_shards = len(spec_dicts)
    n_pos = data.shape[0] - max_steps
    assert n_pos % TILE == 0
    n_tiles = n_pos // TILE
    tpc = 1
    for cand in (8, 4, 2):
        if n_tiles % cand == 0:
            tpc = cand
            break
    n_cells = n_tiles // tpc

    n_rows = n_tiles * _SUB + 1
    flat = jnp.zeros((n_rows * _LANE,), jnp.int32).at[: data.shape[0]].set(
        data.astype(jnp.int32)
    )
    data2d = flat.reshape(n_rows, _LANE)

    kernel = _make_multi_kernel(
        spec_dicts, max_steps=max_steps, seg_bytes=seg_bytes,
        halo_bytes=halo_bytes, emit_bitmap=emit_bitmap,
        tiles_per_cell=tpc, unroll=2,
    )
    nbit = n_shards if emit_bitmap else 1
    rows_pc = tpc * _SUB

    cnt, bits = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows_pc, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((nbit, rows_pc, _LANE), lambda i: (0, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_cells * rows_pc, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((nbit, n_cells * rows_pc, _LANE), jnp.int32),
        ),
        interpret=interpret,
    )(data2d, input_size.reshape(1), s0_banks, r_banks, packed_banks)
    return cnt.reshape(-1), bits.reshape(nbit, -1)


def multi_count_scanner(
    shards: list[ShardTables], max_steps: int, cfg, *, interpret=False
):
    """Fused count-mode scan fn(data, input_size, shift) -> total."""
    ms = MultiShardScanner(shards, interpret=interpret)
    seg = cfg.segment_bytes if cfg.truncation == "segment" else 0

    @jax.jit
    def scan(data, input_size, shift):
        cnt, _ = _pallas_scan_multi(
            data,
            jnp.asarray(input_size, jnp.int32),
            jnp.asarray(ms.s0_banks), jnp.asarray(ms.r_banks),
            jnp.asarray(ms.p_banks),
            specs=tuple(tuple(sorted(s.items())) for s in ms.specs),
            max_steps=max_steps, seg_bytes=seg, halo_bytes=cfg.halo_bytes,
            emit_bitmap=False, interpret=interpret,
        )
        n_pos = cnt.shape[0]
        keep = jnp.arange(n_pos, dtype=jnp.int32) >= shift
        return jnp.where(keep, cnt, 0).sum()

    return scan
