"""Multi-chip PFAC runtime: shard_map over a ("data", "patterns") mesh.

The reference scales out with OpenMP threads pinning CUDA devices and
pattern-set sharding — every shard scans the full input from pinned
host memory (main.cc:180-241).  The TPU-native replacement is a 2-D
device mesh:

* axis ``patterns`` — dictionary shards (the reference's parallelism):
  every device along this axis holds its own shard's tables (stacked,
  padded to common shapes) and scans the bytes it sees;
* axis ``data``    — the input byte stream is sharded into contiguous
  blocks (context parallelism over the stream).  Walks that start near
  a block's end may read into the next block, so each cell receives a
  ``max_steps``-byte halo of its right neighbor's head via
  ``jax.lax.ppermute`` over ICI — the collective version of the
  reference's overlapped segment staging (master_kernel.cu:129-135).

The per-cell computation is ops.turbo_jnp.scan_core with
pos0 = data_index * block_len, so global segment-truncation semantics
(master_kernel.cu:141-144) and the input-size bound hold regardless of
the mesh shape.  Outputs keep both mesh axes; the host merge is
identical to the single-chip path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from phfpfac_tpu.compile.tables import CompiledDictionary
from phfpfac_tpu.ops.turbo_jnp import build_turbo_tables, scan_core
from phfpfac_tpu.utils.config import PfacConfig


@dataclass
class StackedTables:
    """All shards' turbo tables padded to common shapes and stacked.

    Required for SPMD: every cell of the mesh runs the same program, so
    per-shard tables must share shapes.  Padding is semantics-free:
    ``r`` pads with 0 (points at the guard band), probe tables pad with
    -1 (never verify as a hit).
    """

    s0: np.ndarray  # int32 [S, 256]
    r: np.ndarray  # int32 [S, R]
    tbl_a: np.ndarray  # int32 [S, A]  (packed or ht)
    tbl_b: np.ndarray  # int32 [S, B]  (val or width-1 dummy)
    width_bit: np.ndarray  # int32 [S]
    row_bits: np.ndarray  # int32 [S]
    dead: np.ndarray  # int32 [S]
    num_final: np.ndarray  # int32 [S]
    is_packed: bool
    max_pat_len: int

    @property
    def num_shards(self) -> int:
        return self.s0.shape[0]


def stack_tables(compiled: CompiledDictionary) -> StackedTables:
    tts = [build_turbo_tables(sh) for sh in compiled.shards]
    is_packed = all(t.is_packed for t in tts)

    def pad_stack(arrs: list[np.ndarray], fill: int) -> np.ndarray:
        width = max(len(a) for a in arrs)
        out = np.full((len(arrs), width), fill, dtype=np.int32)
        for i, a in enumerate(arrs):
            out[i, : len(a)] = a
        return out

    if is_packed:
        tbl_a = pad_stack([t.packed for t in tts], -1)
        tbl_b = np.zeros((len(tts), 1), dtype=np.int32)
    else:
        # force the split representation for every shard
        from phfpfac_tpu.ops.turbo_jnp import TurboTables  # noqa: F401

        hts, vals = [], []
        for sh, t in zip(compiled.shards, tts):
            if t.is_packed:
                w = sh.width
                g = np.full(w + len(sh.ht) + w, -1, dtype=np.int32)
                g[w : w + len(sh.ht)] = sh.ht
                hts.append(g)
                g2 = np.full(w + len(sh.val) + w, -1, dtype=np.int32)
                g2[w : w + len(sh.val)] = sh.val
                vals.append(g2)
            else:
                hts.append(t.ht)
                vals.append(t.val)
        tbl_a = pad_stack(hts, -1)
        tbl_b = pad_stack(vals, -1)

    return StackedTables(
        s0=np.stack([t.s0 for t in tts]),
        r=pad_stack([t.r for t in tts], 0),
        tbl_a=tbl_a,
        tbl_b=tbl_b,
        width_bit=np.array([t.width_bit for t in tts], np.int32),
        row_bits=np.array([t.row_bits for t in tts], np.int32),
        dead=np.array([t.dead for t in tts], np.int32),
        num_final=np.array([t.num_final for t in tts], np.int32),
        is_packed=is_packed,
        max_pat_len=compiled.max_pat_len,
    )


def make_mesh(n_data: int, n_patterns: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if devices.size < n_data * n_patterns:
        raise ValueError(
            f"need {n_data * n_patterns} devices, have {devices.size}"
        )
    grid = devices[: n_data * n_patterns].reshape(n_data, n_patterns)
    return Mesh(grid, axis_names=("data", "patterns"))


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "max_steps", "full_steps", "cap", "emit_counts",
        "is_packed", "shards_per_cell",
    ),
)
def _distributed_scan(
    data,  # uint8 [N] — sharded over "data"
    s0, r, tbl_a, tbl_b,  # stacked tables — sharded over "patterns"
    width_bit, row_bits, dead, num_final,  # [S] scalars per shard
    input_size,  # int32 (global)
    seg_bytes, halo_bytes,  # int32
    *,
    mesh: Mesh,
    max_steps: int,
    full_steps: int,
    cap: int,
    emit_counts: bool,
    is_packed: bool,
    shards_per_cell: int,
):
    n_data = mesh.shape["data"]
    n_pos_total = data.shape[0]
    block = n_pos_total // n_data

    def cell(data_block, s0_c, r_c, ta_c, tb_c, wb_c, rb_c, dd_c, nf_c):
        # halo exchange: receive the right neighbor's head over ICI
        # (the collective analog of master_kernel.cu's overlapped
        # shared-memory staging)
        head = jax.lax.dynamic_slice(data_block, (0,), (max_steps,))
        halo = jax.lax.ppermute(
            head,
            "data",
            perm=[(i, (i - 1) % n_data) for i in range(n_data)],
        )
        ext = jnp.concatenate([data_block, halo])
        pos0 = (jax.lax.axis_index("data") * block).astype(jnp.int32)

        outs = []
        for k in range(shards_per_cell):
            res = scan_core(
                ext, pos0, s0_c[k], r_c[k], ta_c[k], tb_c[k],
                input_size, wb_c[k], rb_c[k], dd_c[k], nf_c[k],
                seg_bytes, halo_bytes,
                max_steps=max_steps, full_steps=full_steps, cap=cap,
                emit_counts=emit_counts, is_packed=is_packed,
            )
            full, cnt, tail, tail_pos, tail_cnt, ovf = res
            outs.append(
                (full, cnt, tail, tail_pos, tail_cnt,
                 ovf.astype(jnp.int32).reshape(1))
            )
        stack = lambda i: jnp.stack([o[i] for o in outs])  # noqa: E731
        return tuple(stack(i) for i in range(6))

    f = jax.shard_map(
        cell,
        mesh=mesh,
        in_specs=(
            P("data"),
            P("patterns", None), P("patterns", None),
            P("patterns", None), P("patterns", None),
            P("patterns"), P("patterns"), P("patterns"), P("patterns"),
        ),
        out_specs=(
            P("patterns", None, "data"),  # full rows   [S, F+1, N]
            P("patterns", "data"),        # counts      [S, N]
            P("patterns", None, "data"),  # tail rows   [S, T, n_data*cap]
            P("patterns", "data"),        # tail pos    [S, n_data*cap]
            P("patterns", "data"),        # tail cnt    [S, n_data*cap]
            P("patterns", "data"),        # overflow    [S, n_data]
        ),
        check_vma=False,  # ppermute halo is deliberately non-replicated
    )
    return f(
        data, s0, r, tbl_a, tbl_b, width_bit, row_bits, dead, num_final
    )


class DistributedMatcher:
    """Mesh-parallel matcher: data-sharded input x pattern-sharded tables.

    ``compiled.num_shards`` must be a multiple of the mesh's
    ``patterns`` axis size.
    """

    def __init__(
        self,
        compiled: CompiledDictionary,
        config: PfacConfig,
        mesh: Mesh,
        *,
        full_steps: int = 2,
        cap_frac: int = 8,
    ):
        self.compiled = compiled
        self.config = config
        self.mesh = mesh
        self.full_steps = full_steps
        self.cap_frac = cap_frac
        self.stacked = stack_tables(compiled)
        n_pat = mesh.shape["patterns"]
        if self.stacked.num_shards % n_pat:
            raise ValueError(
                f"{self.stacked.num_shards} shards not divisible by "
                f"patterns axis {n_pat}"
            )
        self.shards_per_cell = self.stacked.num_shards // n_pat

    def _scan(self, data: bytes, input_size: int, emit_counts: bool):
        from phfpfac_tpu.ops.common import pad_input, padded_steps

        max_steps = padded_steps(self.compiled.max_pat_len)
        n_data = self.mesh.shape["data"]
        padded = pad_input(data, 1024 * n_data, max_steps)
        n_pos = len(padded) - max_steps
        block = n_pos // n_data
        cap = max(-(-block // self.cap_frac), 128)
        st = self.stacked
        seg = self.config.segment_bytes if self.config.truncation == "segment" else 0
        res = _distributed_scan(
            jnp.asarray(padded[:n_pos]),
            jnp.asarray(st.s0), jnp.asarray(st.r),
            jnp.asarray(st.tbl_a), jnp.asarray(st.tbl_b),
            jnp.asarray(st.width_bit), jnp.asarray(st.row_bits),
            jnp.asarray(st.dead), jnp.asarray(st.num_final),
            jnp.int32(input_size),
            jnp.int32(seg), jnp.int32(self.config.halo_bytes),
            mesh=self.mesh, max_steps=max_steps,
            full_steps=self.full_steps, cap=cap,
            emit_counts=emit_counts, is_packed=st.is_packed,
            shards_per_cell=self.shards_per_cell,
        )
        return res, max_steps, block, cap

    def match(self, data: bytes, *, input_size: int | None = None) -> np.ndarray:
        """Flat [(position, global pattern id)] in reference output order."""
        from phfpfac_tpu.parallel.merge import merge_flat_matches

        if input_size is None:
            input_size = len(data)
        (full, _cnt, tail, tail_pos, _tail_cnt, ovf), max_steps, block, cap = (
            self._scan(data, input_size, emit_counts=False)
        )
        full = np.asarray(full)
        tail = np.asarray(tail)
        tail_pos = np.asarray(tail_pos)
        ovf = np.asarray(ovf)
        t0 = min(self.full_steps + 1, max_steps)
        n_data = self.mesh.shape["data"]

        flats: list[np.ndarray] = []
        for s in range(self.stacked.num_shards):
            if ovf[s].any():
                flats.append(self._dense_fallback(s, data, input_size))
                continue
            parts = []
            t_idx, p_idx = np.nonzero(full[s] >= 0)
            if t_idx.size:
                parts.append(
                    np.stack([p_idx, t_idx, full[s][t_idx, p_idx]], axis=1)
                )
            tr = tail[s]
            t_idx, j_idx = np.nonzero(tr >= 0)
            if t_idx.size:
                gpos = tail_pos[s][j_idx] + (j_idx // cap) * block
                parts.append(
                    np.stack([gpos, t_idx + t0, tr[t_idx, j_idx]], axis=1)
                )
            if parts:
                m = np.concatenate(parts).astype(np.int64)
                m = m[np.lexsort((m[:, 1], m[:, 0]))]
                flats.append(m)
            else:
                flats.append(np.empty((0, 3), dtype=np.int64))
        return merge_flat_matches(self.compiled, flats, input_size)

    def count_matches(self, data: bytes, *, input_size: int | None = None):
        if input_size is None:
            input_size = len(data)
        (_full, cnt, _tail, tail_pos, tail_cnt, ovf), max_steps, block, cap = (
            self._scan(data, input_size, emit_counts=True)
        )
        cnt = np.asarray(cnt).astype(np.int64)
        tail_pos = np.asarray(tail_pos)
        tail_cnt = np.asarray(tail_cnt)
        ovf = np.asarray(ovf)
        total = np.zeros(cnt.shape[1], dtype=np.int64)
        for s in range(self.stacked.num_shards):
            if ovf[s].any():
                m = self._dense_fallback(s, data, input_size)
                np.add.at(total, m[:, 0], 1)
                continue
            total += cnt[s]
            gpos = tail_pos[s] + (np.arange(len(tail_pos[s])) // cap) * block
            np.add.at(total, gpos, tail_cnt[s])
        return total[:input_size]

    def _dense_fallback(self, s: int, data: bytes, input_size: int) -> np.ndarray:
        from phfpfac_tpu.ops.common import pad_input, padded_steps, walk_limits
        from phfpfac_tpu.ops.reference_jnp import scan_shard_jnp

        shard = self.compiled.shards[s]
        max_steps = padded_steps(self.compiled.max_pat_len)
        padded = pad_input(data, 1024, max_steps)
        n_pos = len(padded) - max_steps
        limits = walk_limits(n_pos, input_size, shard.max_pat_len, self.config)
        from phfpfac_tpu.parallel.matcher import _dense_slots

        out, _ = scan_shard_jnp(
            shard, padded, limits, input_size, slots=_dense_slots(shard),
        )
        rows = np.asarray(out)
        p, j = np.nonzero(rows >= 0)
        return np.stack([p, j, rows[p, j]], axis=1).astype(np.int64)
