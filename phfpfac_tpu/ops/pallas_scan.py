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


def _lut(banks_ref, idx, nb: int):
    """Banked 128-lane LUT: result[i] = banks.ravel()[idx[i]].

    ``idx`` is an (8,128) int32 tile with values in [0, nb*128).
    Cost: nb x (lane-gather + compare + select).
    """
    # arithmetic shift keeps negative idx out of every bank -> miss
    bank = idx >> 7
    lane = idx & (_LANE - 1)
    acc = jnp.full(idx.shape, -1, dtype=jnp.int32)
    for k in range(nb):
        row = jnp.broadcast_to(banks_ref[k, :][None, :], idx.shape)
        g = jnp.take_along_axis(row, lane, axis=1)
        acc = jnp.where(bank == k, g, acc)
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
