"""Depth kernel under shard_map: the fast multi-chip scan path.

parallel.mesh runs the portable XLA turbo engine per mesh cell; this
module runs the depth-stratified Pallas kernel (ops.pallas_depth)
instead, with the same two mesh axes:

* ``data``     — the staged (rows, 128) input is sharded row-wise;
  each cell receives its neighbor's first 8 rows via ``ppermute``
  over ICI (walks read at most max_pat_len-1 < 128 bytes past the
  block, i.e. only halo row 0) — the collective form of the in-kernel
  halo ref;
* ``patterns`` — every cell along this axis holds its own shard's
  depth tables.  SPMD requires one program for all cells, so tables
  are stacked with UNIFORM static geometry: per-depth bank counts are
  padded to the max across shards (probes into the -1 padding miss),
  trimming is disabled (k0 = 0 everywhere), and shallower shards get
  empty tables up to the deepest shard's step count.

Output: per-position match bitmaps laid out [patterns, data-major
positions] — identical decoding contract to the single-chip pallas
path (ops.bitmap).  The depth mesh matcher is exact mode only
(segment parity runs ride the turbo mesh); the PLAN mesh matcher
below also supports segment truncation (per-device slices are
segment-aligned, so the kernel's local positional cut equals the
single-chip one) and the two-phase survivor compaction (per device
cell, host fallback on cap overflow).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from phfpfac_tpu.compile.depth import DepthTables, build_depth_tables
from phfpfac_tpu.compile.tables import CompiledDictionary
from phfpfac_tpu.ops.common import pad_input, padded_steps
from phfpfac_tpu.ops.pallas_depth import (
    _SUB,
    _depth_scan_bitmap,
    stage_input,
)


@dataclass
class StackedDepthTables:
    """All shards' depth tables with uniform static geometry."""

    s0: np.ndarray  # int32 [S, 2, 128]
    packed: np.ndarray  # int32 [S, NB, 128]
    offs: tuple
    nbs: tuple
    n_steps: int

    @property
    def num_shards(self) -> int:
        return self.s0.shape[0]


def stack_depth_tables(compiled: CompiledDictionary) -> StackedDepthTables:
    """Raises compile.depth.DepthUnsupported when any shard cannot."""
    dts: list[DepthTables] = [
        build_depth_tables(sh, trim=False) for sh in compiled.shards
    ]
    n_steps = max(dt.n_steps for dt in dts)
    # per-step bank counts padded to the max across shards
    nbs = tuple(
        max(
            (dt.nbs[t] if t < len(dt.nbs) else 1)
            for dt in dts
        )
        for t in range(n_steps - 1)
    )
    offs, acc = [], 0
    for nb in nbs:
        offs.append(acc)
        acc += nb
    packed = np.full((len(dts), acc, 128), -1, dtype=np.int32)
    for s, dt in enumerate(dts):
        for t in range(len(dt.nbs)):
            src = dt.packed_banks[dt.offs[t] : dt.offs[t] + dt.nbs[t]]
            packed[s, offs[t] : offs[t] + src.shape[0]] = src
    s0 = np.stack([dt.s0_banks for dt in dts])
    return StackedDepthTables(
        s0=s0, packed=packed, offs=tuple(offs), nbs=nbs, n_steps=n_steps
    )


@partial(
    jax.jit,
    static_argnames=("mesh", "n_steps", "offs", "nbs", "interpret", "tpc"),
)
def _mesh_bitmap_scan(
    data2d,  # int32 [rows, 128] staged input (sharded over "data")
    s0,  # int32 [S, 2, 128] (sharded over "patterns")
    packed,  # int32 [S, NB, 128]
    *,
    mesh: Mesh,
    n_steps: int,
    offs: tuple,
    nbs: tuple,
    interpret: bool,
    tpc: int,
):
    n_data = mesh.shape["data"]

    def cell(d2, s0_c, pk_c):
        # neighbor's first 8 input rows over ICI (right halo); the
        # last cell's wrap would alias cell 0's real text, so it gets
        # the pad char instead (walks die on contact).
        halo = jax.lax.ppermute(
            d2[:_SUB],
            "data",
            perm=[(i, (i - 1) % n_data) for i in range(n_data)],
        )
        is_last = jax.lax.axis_index("data") == n_data - 1
        halo = jnp.where(is_last, jnp.int32(256), halo)
        local = jnp.concatenate([d2, halo], axis=0)
        _cnt, bits = _depth_scan_bitmap(
            local,
            jnp.int32(2**31 - 1),  # bound handled by the pad char
            s0_c[0],
            pk_c[0],
            n_steps=n_steps, offs=offs, nbs=nbs,
            k0s=(0,) * len(nbs), nb_s0=2,
            seg_bytes=0, halo_bytes=0,
            interpret=interpret, tpc=tpc, cond_from=3,
        )
        return bits.reshape(1, -1)

    f = jax.shard_map(
        cell,
        mesh=mesh,
        in_specs=(P("data", None), P("patterns", None, None),
                  P("patterns", None, None)),
        out_specs=P("patterns", "data"),
        check_vma=False,
    )
    return f(data2d, s0, packed)


class PallasMeshMatcher:
    """Mesh-parallel matcher on the depth kernel (exact mode).

    Raises DepthUnsupported at construction when the dictionary cannot
    use depth tables — callers fall back to mesh.DistributedMatcher.
    """

    def __init__(self, compiled: CompiledDictionary, config, mesh: Mesh,
                 *, interpret: bool = False, tpc: int = 8):
        if config.truncation == "segment":
            from phfpfac_tpu.compile.depth import DepthUnsupported

            raise DepthUnsupported("segment truncation needs the turbo mesh")
        self.compiled = compiled
        self.config = config
        self.mesh = mesh
        self.interpret = interpret
        self.tpc = tpc
        self.stacked = stack_depth_tables(compiled)
        n_pat = mesh.shape["patterns"]
        if self.stacked.num_shards != n_pat:
            raise ValueError(
                f"{self.stacked.num_shards} shards != patterns axis {n_pat}"
            )

    def match(self, data: bytes, *, input_size: int | None = None):
        """Flat [(position, global pattern id)] in reference order."""
        from phfpfac_tpu.ops.bitmap import decode_hits, fetch_hit_bits
        from phfpfac_tpu.parallel.merge import merge_flat_matches

        if input_size is None:
            input_size = len(data)
        st = self.stacked
        max_steps = padded_steps(self.compiled.max_pat_len)
        n_data = self.mesh.shape["data"]
        padded = pad_input(data, 1024 * n_data, max_steps)
        n_pos = len(padded) - max_steps
        # n_pos divides 1024*n_data, so rows split evenly over "data";
        # the per-cell +8-row halo comes from the neighbor (ppermute),
        # not from staging, so the stage drops the tail pad.
        rows = n_pos // 128
        data2d = stage_input(
            jnp.asarray(padded[:n_pos]),
            jnp.asarray(np.int32(input_size)),
            n_rows=rows,
        )
        bits = _mesh_bitmap_scan(
            data2d,
            jnp.asarray(st.s0), jnp.asarray(st.packed),
            mesh=self.mesh, n_steps=st.n_steps,
            offs=st.offs, nbs=st.nbs,
            interpret=self.interpret, tpc=self.tpc,
        )
        flats = []
        for s, shard in enumerate(self.compiled.shards):
            pos, hb = fetch_hit_bits(bits[s], input_size)
            flats.append(
                decode_hits(hb, pos, data, input_size, shard, max_steps)
            )
        return merge_flat_matches(self.compiled, flats, input_size)


# ---------------------------------------------------------------------------
# Plan kernel over the data axis: the FASTEST kernel, scaled over chips.
# Pattern shards need per-shard static step plans (not stackable into
# one SPMD program), so shards loop on the host while each shard's scan
# is data-parallel over the mesh with replicated tables and ICI halos.
# ---------------------------------------------------------------------------


def _mesh_plan_stacked_scan(
    data2d,  # int32 [rows, 128] staged pair symbols (sharded over "data")
    p0, packed, side,  # int32 [S, *, 128] (sharded over "patterns")
    *,
    mesh: Mesh,
    statics: dict,
    miss_sym: int,
):
    """One SPMD program: plan kernel over (data x patterns).

    Tables come from compile.plan.build_stacked_plan_tables (uniform
    static geometry), so every device runs the SAME program — the plan
    engine's answer to the reference's per-shard stream dispatch
    (main.cc:225-241) without a host loop.

    ``compact`` = (cut, cap) runs the two-phase compacted scan on each
    (patterns, data) device cell — survivors are compacted LOCALLY, no
    extra collectives — returning (bits [S, data*...], counts [S,
    n_data]); the caller must rescan uncompacted when any count
    exceeds the cap."""
    from phfpfac_tpu.ops.pallas_plan import (
        _plan_scan_bitmap,
        _plan_scan_bitmap_compact,
    )

    n_data = mesh.shape["data"]
    compact = statics.pop("compact", None)

    def cell(d2, p0_c, m_c, s_c):
        halo = jax.lax.ppermute(
            d2[:_SUB],
            "data",
            perm=[(i, (i - 1) % n_data) for i in range(n_data)],
        )
        is_last = jax.lax.axis_index("data") == n_data - 1
        halo = jnp.where(is_last, jnp.int32(miss_sym), halo)
        local = jnp.concatenate([d2, halo], axis=0)
        if compact is not None:
            _cnt, bits, count = _plan_scan_bitmap_compact(
                local, jnp.zeros(1, jnp.int32), p0_c[0], m_c[0], s_c[0],
                cut=compact[0], cap=compact[1], **statics
            )
            return bits.reshape(1, -1), count.reshape(1, 1)
        _cnt, bits = _plan_scan_bitmap(
            local, jnp.zeros(1, jnp.int32), p0_c[0], m_c[0], s_c[0],
            **statics
        )
        return bits.reshape(1, -1)

    f = jax.shard_map(
        cell,
        mesh=mesh,
        in_specs=(
            P("data", None), P("patterns", None, None),
            P("patterns", None, None), P("patterns", None, None),
        ),
        out_specs=(
            (P("patterns", "data"), P("patterns", "data"))
            if compact is not None else P("patterns", "data")
        ),
        check_vma=False,
    )
    return f(data2d, p0, packed, side)


def _mesh_plan_bitmap_scan(
    data2d,  # int32 [rows, 128] staged pair symbols (sharded over "data")
    p0_banks, packed_banks, side_banks,  # replicated
    *,
    mesh: Mesh,
    statics: dict,
    miss_sym: int,
):
    from phfpfac_tpu.ops.pallas_plan import (
        _plan_scan_bitmap,
        _plan_scan_bitmap_compact,
    )

    n_data = mesh.shape["data"]
    compact = statics.pop("compact", None)

    def cell(d2, p0, m, s):
        halo = jax.lax.ppermute(
            d2[:_SUB],
            "data",
            perm=[(i, (i - 1) % n_data) for i in range(n_data)],
        )
        # the last cell's wrap would alias cell 0's real text: feed the
        # dead pair symbol instead (no stored entry matches it)
        is_last = jax.lax.axis_index("data") == n_data - 1
        halo = jnp.where(is_last, jnp.int32(miss_sym), halo)
        local = jnp.concatenate([d2, halo], axis=0)
        if compact is not None:
            _cnt, bits, count = _plan_scan_bitmap_compact(
                local, jnp.zeros(1, jnp.int32), p0, m, s,
                cut=compact[0], cap=compact[1], **statics
            )
            return bits, count.reshape(1)
        _cnt, bits = _plan_scan_bitmap(
            local, jnp.zeros(1, jnp.int32), p0, m, s, **statics
        )
        return bits

    f = jax.shard_map(
        cell,
        mesh=mesh,
        in_specs=(P("data", None), P(None, None), P(None, None),
                  P(None, None)),
        out_specs=(
            (P("data"), P("data")) if compact is not None else P("data")
        ),
        check_vma=False,
    )
    return f(data2d, p0_banks, packed_banks, side_banks)


class PlanMeshMatcher:
    """Data-parallel mesh matcher on the plan kernel (exact mode).

    Scales the fastest single-chip kernel over the mesh's ``data``
    axis: the staged input is row-sharded, tables are replicated, and
    each cell receives its right neighbor's first 8 staged rows over
    ICI (the collective form of the in-kernel halo).  Dictionary
    shards loop on the host — each shard's plan is its own static
    program, so shards don't ride a mesh axis here (use
    PallasMeshMatcher's stacked depth tables for that).

    ``train`` enables the profile-guided layout + grouped bank scan
    exactly as on a single chip.
    """

    def __init__(self, compiled: CompiledDictionary, config, mesh: Mesh,
                 *, interpret: bool = False, tpc: int = 8,
                 train: bytes | None = None, compact="auto"):
        from phfpfac_tpu.compile.pair import PairUnsupported
        from phfpfac_tpu.compile.plan import (
            build_plan_tables,
            build_stacked_plan_tables,
        )

        self.compact = compact

        if config.truncation == "segment" and (
            config.segment_bytes & (config.segment_bytes - 1)
        ):
            # the in-kernel positional cut needs a power-of-two segment
            raise PairUnsupported("segment size must be a power of 2")
        if "data" not in mesh.shape:
            raise ValueError("mesh needs a 'data' axis")
        self.compiled = compiled
        self.config = config
        self.mesh = mesh
        self.interpret = interpret
        self.tpc = tpc
        self.stacked = None
        n_pat = mesh.shape.get("patterns", 1)
        if n_pat > 1 and n_pat == len(compiled.shards):
            try:
                self.stacked = build_stacked_plan_tables(
                    compiled.shards, train=train
                )
            except PairUnsupported:
                self.stacked = None  # host shard loop below
        self.pts = None
        if self.stacked is None:
            self.pts = [
                build_plan_tables(sh, train=train)
                for sh in compiled.shards
            ]

    def match(self, data: bytes, *, input_size: int | None = None):
        """Flat [(position, global pattern id)] in reference order."""
        from phfpfac_tpu.ops.bitmap import decode_hits, fetch_hit_bits
        from phfpfac_tpu.ops.pallas_pair import stage_pairs
        from phfpfac_tpu.parallel.merge import merge_flat_matches

        if input_size is None:
            input_size = len(data)
        max_steps = padded_steps(self.compiled.max_pat_len)
        n_data = self.mesh.shape["data"]
        seg, halo = 0, 0
        block = 1024 * n_data
        if self.config.truncation == "segment":
            # per-device slices must start ON segment boundaries so the
            # kernel's device-local position arithmetic computes the
            # same cut limits as a single-chip scan (device_base is a
            # segment multiple, and the limit only depends on
            # pos mod segment)
            seg = self.config.segment_bytes
            halo = self.config.halo_bytes
            block = n_data * max(1024, seg)
        padded = pad_input(data, block, max_steps)
        n_pos = len(padded) - max_steps
        rows = n_pos // 128  # per-cell halos come from ppermute

        from phfpfac_tpu.ops.pallas_plan import (
            resolve_compact,
            resolve_cond_from,
        )

        # survivors compact per data-cell, so the cut/cap resolve
        # against the PER-DEVICE position count
        n_data_pos = n_pos // n_data

        if self.stacked is not None:
            st = self.stacked
            data2d = stage_pairs(
                jnp.asarray(padded[:n_pos]),
                jnp.asarray(np.int32(input_size)),
                jnp.asarray(st.code_of), n_rows=rows, cb=st.code_bits,
            )
            sigma = int(st.code_of.max())
            cc = resolve_compact(st, n_data_pos, self.compact)

            def scan_stacked(cc):
                statics = dict(
                    steps=st.steps, nb_p0=st.p0_banks.shape[1],
                    cb=st.code_bits, p0_miss=st.p0_miss,
                    p0_mode=st.p0_mode,
                    interpret=self.interpret, tpc=self.tpc,
                    cond_from=resolve_cond_from(st, "auto"),
                    grouped=st.trained, compact=cc,
                    seg_bytes=seg, halo_bytes=halo,
                )
                return _mesh_plan_stacked_scan(
                    data2d,
                    jnp.asarray(st.p0_banks),
                    jnp.asarray(st.packed_banks),
                    jnp.asarray(st.side_banks),
                    mesh=self.mesh, statics=statics,
                    miss_sym=(sigma << st.code_bits) | sigma,
                )

            if cc is not None:
                bits, counts = scan_stacked(cc)
                if int(np.asarray(counts).max()) > cc[1]:
                    bits = scan_stacked(None)  # overflow: exact rescan
            else:
                bits = scan_stacked(None)
            flats = []
            for si, shard in enumerate(self.compiled.shards):
                pos, hb = fetch_hit_bits(bits[si], input_size)
                flats.append(
                    decode_hits(hb, pos, data, input_size, shard,
                                max_steps)
                )
            return merge_flat_matches(self.compiled, flats, input_size)

        flats = []
        for shard, pt in zip(self.compiled.shards, self.pts):
            data2d = stage_pairs(
                jnp.asarray(padded[:n_pos]),
                jnp.asarray(np.int32(input_size)),
                jnp.asarray(pt.code_of), n_rows=rows, cb=pt.code_bits,
            )
            sigma = int(pt.code_of.max())
            cc = resolve_compact(pt, n_data_pos, self.compact)

            def scan_one(cc, pt=pt, data2d=data2d, sigma=sigma):
                statics = dict(
                    steps=pt.steps, nb_p0=pt.p0_banks.shape[0],
                    cb=pt.code_bits, p0_miss=pt.p0_miss,
                    p0_mode=pt.p0_mode,
                    interpret=self.interpret, tpc=self.tpc,
                    cond_from=resolve_cond_from(pt, "auto"),
                    grouped=pt.trained, compact=cc,
                    seg_bytes=seg, halo_bytes=halo,
                )
                return _mesh_plan_bitmap_scan(
                    data2d,
                    jnp.asarray(pt.p0_banks),
                    jnp.asarray(pt.packed_banks),
                    jnp.asarray(pt.side_banks),
                    mesh=self.mesh, statics=statics,
                    miss_sym=(sigma << pt.code_bits) | sigma,
                )

            if cc is not None:
                bits, counts = scan_one(cc)
                if int(np.asarray(counts).max()) > cc[1]:
                    bits = scan_one(None)  # overflow: exact rescan
            else:
                bits = scan_one(None)
            pos, hb = fetch_hit_bits(bits, input_size)
            flats.append(
                decode_hits(hb, pos, data, input_size, shard, max_steps)
            )
        return merge_flat_matches(self.compiled, flats, input_size)
