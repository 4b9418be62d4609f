"""Pallas TPU PFAC kernel over depth-stratified tables.

The fast path.  Replaces ``TraceTable_kernel`` (master_kernel.cu:92-180)
like ops.pallas_scan, but walks depth-stratified chained-displacement
tables (compile.depth):

* step t probes ONLY the depth-t transition table — a full walk pays
  the total table size once, spread over steps, instead of per step
  (the asymptotic flaw of the single-PHF banked kernel);
* no r[] gather: the probed value carries the next state's
  displacement (displacement chaining), so a step is
      idx = disp + c; g = lut(T_t, idx)
      hit = g >= 0 and (g & 0xFF) == c
      disp = hit ? g >> 9 : MISS;  final = hit and (g >> 8) & 1
* the walk is UNROLLED over t (tables live at static bank offsets) and
  steps past ``cond_from`` are wrapped in lax.cond(any lane alive), the
  tile analog of CUDA threads idling out (master_kernel.cu:49-66) —
  dead tiles skip the remaining depth tables entirely;
* input-size bounds need no per-step masking: bytes past the input are
  staged as the out-of-alphabet char 256, which can never verify
  against a stored char, so walks die on contact with the pad.

The device-input format is a (rows, 128) int32 view of the byte stream
(``stage_input``), prepared once per corpus — the TPU analog of the
reference's one-time H2D input upload (master_kernel.cu:359-383).

Count mode reduces per-cell partial sums INSIDE the kernel (a
(1, 128) row per grid cell) so the scan's HBM traffic is just the
input read; match mode emits the standard per-position step-bitmap
(bit t set iff a match of length t+1 starts there), identical
semantics to ops.pallas_scan, so ops.bitmap.decode_bitmap recovers
pattern ids unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phfpfac_tpu.compile.depth import DISP_MISS, DepthTables, build_depth_tables
from phfpfac_tpu.compile.tables import ShardTables
from phfpfac_tpu.ops.pallas_scan import _LANE, _SUB, TILE, _lut

PAD_CHAR = 256  # out-of-alphabet: misses every stored char and s0 bank


@functools.partial(jax.jit, static_argnames=("n_rows",))
def stage_input(data, input_size, *, n_rows: int):
    """uint8 stream -> (n_rows, 128) int32 device format, PAD_CHAR past
    input_size.  One-time per corpus (reference: input H2D upload)."""
    flat = jnp.full((n_rows * _LANE,), PAD_CHAR, jnp.int32)
    flat = flat.at[: data.shape[0]].set(data.astype(jnp.int32))
    flat = jnp.where(
        jnp.arange(n_rows * _LANE, dtype=jnp.int32) < input_size,
        flat,
        PAD_CHAR,
    )
    return flat.reshape(n_rows, _LANE)


def staged_rows(n_pos: int) -> int:
    """Row count of the staged input for n_pos scan positions.

    One extra 8-row block past the last tile feeds the halo ref (the
    pad rows hold PAD_CHAR, so walks die there)."""
    assert n_pos % TILE == 0
    return (n_pos // TILE) * _SUB + _SUB


def _walk_body(
    *, t, tpc, off_t, nb_t, k0_t, seg_bytes, emit_bitmap,
    lane_next, at_127, b_s, pos_s, lim_s, packed_ref,
):
    """One unrolled walk step applied to every tile's carry."""

    def step(carry):
        curs, disps, cnts, bitss = (
            list(carry[0]), list(carry[1]), list(carry[2]), list(carry[3])
        )
        for i in range(tpc):
            rolled = jnp.take_along_axis(curs[i], lane_next, axis=1)
            bcol = jnp.take_along_axis(
                b_s[i],
                jnp.broadcast_to(
                    jnp.int32((t - 1) & (_LANE - 1)), (_SUB, _LANE)
                ),
                axis=1,
            )
            cur = jnp.where(at_127, bcol, rolled)
            if seg_bytes > 0:
                disp = jnp.where(pos_s[i] + t < lim_s[i], disps[i], DISP_MISS)
            else:
                disp = disps[i]
            idx = disp + cur
            g = _lut(packed_ref, idx, nb_t, off_t, k0_t)
            hit = (g >= 0) & ((g & 255) == cur)
            fin = hit & ((g & 256) != 0)
            cnts[i] = cnts[i] + fin.astype(jnp.int32)
            if emit_bitmap:
                bitss[i] = bitss[i] | jnp.where(fin, jnp.int32(1) << t, 0)
            disps[i] = jnp.where(
                hit, jax.lax.shift_right_logical(g, 9), DISP_MISS
            )
            curs[i] = cur
        return (tuple(curs), tuple(disps), tuple(cnts), tuple(bitss))

    return step


def _make_depth_kernel(
    *,
    n_steps: int,
    offs: tuple,
    nbs: tuple,
    k0s: tuple,
    nb_s0: int,
    seg_bytes: int,
    halo_bytes: int,
    emit_bitmap: bool,
    tiles_per_cell: int,
    cond_from: int,
):
    """emit_bitmap=True: writes per-position cnt + bitmap blocks.
    emit_bitmap=False: writes one (1, 128) partial-sum row per cell,
    masked by the SMEM ``shift`` scalar (bench chaining)."""
    from jax.experimental import pallas as pl

    tpc = tiles_per_cell

    def kernel(in_ref, halo_ref, size_ref, shift_ref, s0_ref, packed_ref,
               *out_refs):
        cell = pl.program_id(0)
        input_size = size_ref[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
        lane_next = (lane + 1) & (_LANE - 1)
        at_127 = lane == (_LANE - 1)

        # in_ref: this cell's (tpc*8, 128) input block; halo_ref: the
        # next 8-row block (only row 0 is consumed).  Both are blocked
        # specs, so pallas double-buffers the streaming automatically —
        # the TPU analog of the reference's staged shared-memory loads
        # (master_kernel.cu:129-135).
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
        pos_s, lim_s = [], []
        for i in range(tpc):
            pos = (cell * tpc + i) * TILE + sub * _LANE + lane
            pos_s.append(pos)
            if seg_bytes > 0:
                seg_end = (pos // seg_bytes + 1) * seg_bytes
                lim_s.append(jnp.minimum(input_size, seg_end + halo_bytes))
            else:
                lim_s.append(None)

        # step 0: s0 lookup (master_kernel.cu:41 semantics)
        curs, disps, cnts, bitss = [], [], [], []
        for i in range(tpc):
            cur = a_s[i]
            v = _lut(s0_ref, cur, nb_s0)
            alive = v >= 0
            fin = alive & ((v & 1) == 1)
            cnts.append(fin.astype(jnp.int32))
            bitss.append(fin.astype(jnp.int32))
            disps.append(
                jnp.where(alive, jax.lax.shift_right_logical(v, 1), DISP_MISS)
            )
            curs.append(cur)

        carry = (tuple(curs), tuple(disps), tuple(cnts), tuple(bitss))
        for t in range(1, n_steps):
            step = _walk_body(
                t=t, tpc=tpc, off_t=offs[t - 1], nb_t=nbs[t - 1],
                k0_t=k0s[t - 1],
                seg_bytes=seg_bytes, emit_bitmap=emit_bitmap,
                lane_next=lane_next, at_127=at_127, b_s=b_s,
                pos_s=pos_s, lim_s=lim_s, packed_ref=packed_ref,
            )
            if t < cond_from:
                carry = step(carry)
            else:
                # skipping dead tiles costs a carry copy per cond —
                # only worth it past the depth where most tiles die
                alive = carry[1][0] != DISP_MISS
                for d in carry[1][1:]:
                    alive = alive | (d != DISP_MISS)
                carry = jax.lax.cond(jnp.any(alive), step, lambda c: c, carry)

        _curs, _disps, cnts, bitss = carry
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
    "n_steps", "offs", "nbs", "k0s", "nb_s0",
    "seg_bytes", "halo_bytes", "interpret", "tpc", "cond_from",
)


def _common(data2d, tpc):
    n_tiles = data2d.shape[0] // _SUB - 1
    while n_tiles % tpc:
        tpc //= 2
    return n_tiles // tpc, tpc


@functools.partial(jax.jit, static_argnames=_STATICS)
def _depth_scan_bitmap(
    data2d, input_size, s0_banks, packed_banks,
    *, n_steps, offs, nbs, k0s, nb_s0, seg_bytes, halo_bytes, interpret,
    tpc, cond_from,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cells, tpc = _common(data2d, tpc)
    kernel = _make_depth_kernel(
        n_steps=n_steps, offs=offs, nbs=nbs, k0s=k0s, nb_s0=nb_s0,
        seg_bytes=seg_bytes, halo_bytes=halo_bytes,
        emit_bitmap=True, tiles_per_cell=tpc, cond_from=cond_from,
    )
    rows_pc = tpc * _SUB
    cnt, bits = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec((tpc * _SUB, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((_SUB, _LANE), lambda i, t=tpc: (i * t + t, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows_pc, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((rows_pc, _LANE), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_cells * rows_pc, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((n_cells * rows_pc, _LANE), jnp.int32),
        ),
        interpret=interpret,
    )(
        data2d, data2d, input_size.reshape(1), jnp.zeros(1, jnp.int32),
        s0_banks, packed_banks,
    )
    return cnt.reshape(-1), bits.reshape(-1)


@functools.partial(jax.jit, static_argnames=_STATICS)
def _depth_scan_count(
    data2d, input_size, shift, s0_banks, packed_banks,
    *, n_steps, offs, nbs, k0s, nb_s0, seg_bytes, halo_bytes, interpret,
    tpc, cond_from,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cells, tpc = _common(data2d, tpc)
    kernel = _make_depth_kernel(
        n_steps=n_steps, offs=offs, nbs=nbs, k0s=k0s, nb_s0=nb_s0,
        seg_bytes=seg_bytes, halo_bytes=halo_bytes,
        emit_bitmap=False, tiles_per_cell=tpc, cond_from=cond_from,
    )
    partial = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec((tpc * _SUB, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((_SUB, _LANE), lambda i, t=tpc: (i * t + t, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_cells * _SUB, _LANE), jnp.int32),
        interpret=interpret,
    )(
        data2d, data2d, input_size.reshape(1), shift.reshape(1),
        s0_banks, packed_banks,
    )
    return partial.sum()


class DepthShardScanner:
    """Scans one shard with the depth kernel; emits counts + bitmaps.

    Raises compile.depth.DepthUnsupported at construction when the
    shard's automaton cannot be stratified (deeper than the match
    bitmap; callers fall back to ops.pallas_scan).
    """

    def __init__(self, shard: ShardTables, *, interpret: bool = False,
                 tpc: int = 8, cond_from: int = 6):
        self.dt: DepthTables = build_depth_tables(shard)
        self.shard = shard
        self.interpret = interpret
        self.tpc = tpc
        self.cond_from = cond_from

    def _statics(self, cfg):
        dt = self.dt
        seg = cfg.segment_bytes if cfg.truncation == "segment" else 0
        return dict(
            n_steps=dt.n_steps, offs=dt.offs, nbs=dt.nbs, k0s=dt.k0s,
            nb_s0=dt.s0_banks.shape[0],
            seg_bytes=seg, halo_bytes=cfg.halo_bytes,
            interpret=self.interpret, tpc=self.tpc,
            cond_from=self.cond_from,
        )

    def scan(self, data_padded, input_size, cfg, max_steps):
        """(per-position counts, per-position bitmaps)."""
        n_pos = len(data_padded) - max_steps
        data2d = stage_input(
            jnp.asarray(data_padded),
            jnp.asarray(np.int32(input_size)),
            n_rows=staged_rows(n_pos),
        )
        return _depth_scan_bitmap(
            data2d, jnp.asarray(np.int32(input_size)),
            jnp.asarray(self.dt.s0_banks), jnp.asarray(self.dt.packed_banks),
            **self._statics(cfg),
        )


class DepthCountScan:
    """Count-mode scan with a one-time staging step (bench protocol).

    prepare(padded_u8, input_size) -> staged device input
    scan(staged, input_size, shift) -> total matches over
      positions [shift, input_size)
    """

    def __init__(self, shard: ShardTables, max_steps: int, *,
                 interpret: bool = False, tpc: int = 8, cond_from: int = 6):
        self.dt = build_depth_tables(shard)
        self.max_steps = max_steps
        self.interpret = interpret
        self.tpc = tpc
        self.cond_from = cond_from
        self._s0 = jnp.asarray(self.dt.s0_banks)
        self._packed = jnp.asarray(self.dt.packed_banks)

    def prepare(self, data_padded, input_size):
        n_pos = len(data_padded) - self.max_steps
        return stage_input(
            jnp.asarray(data_padded),
            jnp.asarray(np.int32(input_size)),
            n_rows=staged_rows(n_pos),
        )

    def scan(self, staged, input_size, shift):
        dt = self.dt
        return _depth_scan_count(
            staged,
            jnp.asarray(input_size, jnp.int32),
            jnp.asarray(shift, jnp.int32),
            self._s0, self._packed,
            n_steps=dt.n_steps, offs=dt.offs, nbs=dt.nbs, k0s=dt.k0s,
            nb_s0=dt.s0_banks.shape[0],
            seg_bytes=0, halo_bytes=0,
            interpret=self.interpret, tpc=self.tpc,
            cond_from=self.cond_from,
        )

    def __call__(self, data_padded, input_size, shift):
        """One-shot convenience matching the generic scanner protocol."""
        return self.scan(self.prepare(data_padded, input_size),
                         input_size, shift)


def depth_count_scanner(shard: ShardTables, max_steps: int, *,
                        interpret: bool = False, tpc: int = 8,
                        cond_from: int = 6) -> DepthCountScan:
    """Count-mode scanner (callable; also exposes prepare/scan)."""
    return DepthCountScan(
        shard, max_steps, interpret=interpret, tpc=tpc, cond_from=cond_from
    )
