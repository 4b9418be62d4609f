"""Turbo PFAC scan — the flagship TPU engine.

Same walk semantics as the reference kernel (master_kernel.cu:37-74)
and ops.reference_jnp, restructured around what TPU v5e measurements
(bench/micro_tpu.py) showed:

* random gathers from small tables run at 280-450 G-lookups/s at large
  batch sizes — table lookup is NOT the bottleneck;
* the scan is VPU-elementwise-bound: cost = (vector ops per step) x
  (steps executed) x (positions), so the wins are (a) fewer ops per
  probe and (b) not paying for dead walks;
* per-step scatters are catastrophic; per-step row writes are fine.

Design:

1. **Packed probe.** HT and val merge into one int32
   (``val << row_bits | row``) so a probe is 2 gathers (r, packed)
   instead of 3 (falls back to split tables when the bit budget
   doesn't fit).  Equivalent to the reference's commented-out packed
   PHF (phf.c:42-54) but with exact row verification.
2. **Guard bands, no bounds checks.** The packed table gets
   ``width``-sized -1 guard bands on both sides and ``r`` is stored
   pre-biased by +width, so every probe index is in-bounds by
   construction and misses verify-fail naturally (a slot stores its
   owning row; unowned/guard slots can never equal the probed row).
3. **DEAD sentinel, no liveness masks.** Dead walks carry a sentinel
   state whose key range maps into appended sentinel rows of ``r``
   that point at the guard band, so a dead walk stays dead through
   the same data path as a live probe — no ``state >= 0`` selects.
4. **Compaction.** After ``full_steps`` full-width steps, surviving
   walks (a small fraction for real corpora) are compacted with a
   cumsum+scatter into a ``cap``-sized buffer; a while_loop with
   all-dead early exit finishes them.  If survivors overflow ``cap``
   (adversarial input) the kernel reports overflow and the caller
   falls back to the dense engine — correctness is never at risk.
5. **Emission without scatters.** Full-width steps emit one
   [n_pos] row each; tail steps emit [cap] rows; the host expands
   rows to (position, state, step) matches.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from phfpfac_tpu.compile.tables import ShardTables
from phfpfac_tpu.utils.config import PfacConfig

_INT31 = 2**31


@dataclass
class TurboTables:
    """Device-layout tables derived from ShardTables."""

    s0: np.ndarray  # int32 [256], -1 -> DEAD
    r: np.ndarray  # int32 [rows + sentinels], pre-biased +width, sentinel -> 0
    packed: np.ndarray | None  # int32 [width + ht_size + width] with guards
    ht: np.ndarray | None  # split fallback (guarded), same layout as packed
    val: np.ndarray | None
    width_bit: int
    row_bits: int
    dead: int  # DEAD sentinel state
    num_final: int
    max_pat_len: int

    @property
    def is_packed(self) -> bool:
        return self.packed is not None


def build_turbo_tables(shard: ShardTables) -> TurboTables:
    width = shard.width
    wb = shard.width_bit
    n_rows = len(shard.r)
    # sentinel rows must cover the key range of the DEAD state:
    # dead*256 < n_rows*width + 256, so max probed row is
    # (n_rows*width + 511) >> wb = n_rows + (511 >> wb) — pad generously.
    n_sent = (512 >> wb) + 2
    dead = -(-(n_rows * width) // 256)  # smallest state keyed past real rows
    row_bits = int(n_rows + n_sent).bit_length()

    r = np.zeros(n_rows + n_sent, dtype=np.int32)
    # bias by +width so probe index (r[row] + col) lands in
    # [0, width + ht_size + width) for every reachable (row, col):
    #   real r >= -(width-1)  ->  idx >= 1
    #   sentinel r = -width   ->  idx in [0, width)  (left guard)
    r[:n_rows] = shard.r + width
    # empty real rows keep r == -1 + width; they can't false-hit because
    # no slot stores an empty row as owner.

    ht_size = len(shard.ht)

    def guard(a: np.ndarray) -> np.ndarray:
        out = np.full(width + ht_size + width, -1, dtype=np.int32)
        out[width : width + ht_size] = a
        return out

    s0 = np.where(shard.s0 < 0, dead, shard.s0).astype(np.int32)

    max_val = max(int(shard.val.max(initial=0)), dead)
    if row_bits + int(max_val).bit_length() < 31:
        mask = (1 << row_bits) - 1
        packed = np.where(
            shard.ht >= 0,
            (shard.val.astype(np.int64) << row_bits)
            | shard.ht.astype(np.int64),
            -1,
        ).astype(np.int32)
        return TurboTables(
            s0=s0, r=r, packed=guard(packed), ht=None, val=None,
            width_bit=wb, row_bits=row_bits, dead=dead,
            num_final=shard.final_state_num, max_pat_len=shard.max_pat_len,
        )
    return TurboTables(
        s0=s0, r=r, packed=None, ht=guard(shard.ht), val=guard(shard.val),
        width_bit=wb, row_bits=row_bits, dead=dead,
        num_final=shard.final_state_num, max_pat_len=shard.max_pat_len,
    )


def _limits_expr(pos, t, input_size, seg_bytes, halo_bytes, max_steps):
    """Recompute per-position walk limit (cheaper than carrying a vector).

    seg_bytes == 0 means exact mode: limit = min(input_size, pos + max_steps).
    """
    exactlim = jnp.minimum(input_size, pos + max_steps)
    seg = jnp.maximum(seg_bytes, 1)
    seglim = jnp.minimum(input_size, (pos // seg + 1) * seg + halo_bytes)
    return jnp.where(seg_bytes > 0, seglim, exactlim)


def scan_core(
    data,  # uint8 [n_pos + max_steps] — local bytes incl. halo
    pos0,  # int32 scalar — global position of local position 0
    s0,  # int32 [256]
    r,  # int32 [rows+sent], pre-biased
    tbl_a,  # packed OR ht (guarded)
    tbl_b,  # val (guarded) or dummy
    input_size,  # int32 scalar (global)
    width_bit,  # int32 scalar
    row_bits,  # int32 scalar
    dead,  # int32 scalar
    num_final,  # int32 scalar
    seg_bytes,  # int32 scalar (0 = exact mode)
    halo_bytes,  # int32 scalar
    *,
    max_steps: int,
    full_steps: int,
    cap: int,
    emit_counts: bool,
    is_packed: bool,
):
    """Traceable scan body, local-coordinate positions.

    Used directly by the single-chip jit wrapper (pos0 = 0) and inside
    shard_map cells of the mesh runtime, where each data-shard scans
    its local block (plus a halo of the next block's head) with
    pos0 = data_index * block_len so the global segment-truncation and
    input-size semantics are preserved.  Returned tail positions are
    local.
    """
    n_pos = data.shape[0] - max_steps
    pos = jnp.arange(n_pos, dtype=jnp.int32)
    chars = data.astype(jnp.int32)
    width_m1 = (1 << width_bit) - 1
    row_mask = (1 << row_bits) - 1

    def probe(state, ch):
        """One PHF transition for a batch of walks (no masks needed)."""
        key = (state << 8) + ch
        row = jax.lax.shift_right_logical(key, width_bit)
        col = key & width_m1
        idx = r.at[row].get(mode="promise_in_bounds") + col
        if is_packed:
            g = tbl_a.at[idx].get(mode="promise_in_bounds")
            hit = (g & row_mask) == row
            nxt = jax.lax.shift_right_logical(g, row_bits)
        else:
            hrow = tbl_a.at[idx].get(mode="promise_in_bounds")
            hit = hrow == row
            nxt = tbl_b.at[idx].get(mode="promise_in_bounds")
        return jnp.where(hit, nxt, dead)

    def expire(state, p, t):
        gp = p + pos0
        lim = _limits_expr(gp, t, input_size, seg_bytes, halo_bytes, max_steps)
        return jnp.where(gp + t < lim, state, dead)

    # ---- step 0: s0 lookup --------------------------------------------
    state = jnp.where(pos + pos0 < input_size, jnp.take(s0, chars[:n_pos]), dead)

    full_rows = []
    cnt = jnp.zeros((n_pos,), dtype=jnp.int32)

    def emit_full(state, cnt):
        fin = state < num_final
        if not emit_counts:
            full_rows.append(jnp.where(fin, state, -1))
        return cnt + fin.astype(jnp.int32)

    cnt = emit_full(state, cnt)

    # ---- full-width phase ---------------------------------------------
    for t in range(1, min(full_steps + 1, max_steps)):
        state = expire(state, pos, t)
        ch = jax.lax.dynamic_slice(chars, (t,), (n_pos,))
        state = probe(state, ch)
        cnt = emit_full(state, cnt)

    t0 = min(full_steps + 1, max_steps)
    tail_steps = max_steps - t0
    full_out = (
        jnp.zeros((0, n_pos), jnp.int32)
        if emit_counts
        else jnp.stack(full_rows)
    )

    if tail_steps == 0:
        tail_out = jnp.zeros((0, cap), jnp.int32)
        tail_pos = jnp.zeros((cap,), jnp.int32)
        tail_cnt = jnp.zeros((cap,), jnp.int32)
        return full_out, cnt, tail_out, tail_pos, tail_cnt, jnp.bool_(False)

    # ---- compaction -----------------------------------------------------
    alive = state != dead
    csum = jnp.cumsum(alive.astype(jnp.int32))
    total = csum[-1]
    overflow = total > cap
    dst = jnp.where(alive & (csum <= cap), csum - 1, cap)
    pos_c = jnp.zeros((cap + 1,), jnp.int32).at[dst].set(pos, mode="drop")[:cap]
    state_c = (
        jnp.full((cap + 1,), dead, jnp.int32).at[dst].set(state, mode="drop")[:cap]
    )

    # ---- compacted tail -------------------------------------------------
    tail_out0 = jnp.full((max(tail_steps, 1), cap), -1, jnp.int32)
    tail_cnt0 = jnp.zeros((cap,), jnp.int32)

    def cond(carry):
        t, st, _out, _cnt = carry
        return (t < max_steps) & jnp.any(st != dead)

    def body(carry):
        t, st, out, tcnt = carry
        st = expire(st, pos_c, t)
        ch = chars.at[pos_c + t].get(mode="promise_in_bounds")
        st = probe(st, ch)
        fin = st < num_final
        if not emit_counts:
            row = jnp.where(fin, st, -1)
            out = jax.lax.dynamic_update_slice(out, row[None, :], (t - t0, 0))
        tcnt = tcnt + fin.astype(jnp.int32)
        return t + 1, st, out, tcnt

    _t, _st, tail_out, tail_cnt = jax.lax.while_loop(
        cond, body, (jnp.int32(t0), state_c, tail_out0, tail_cnt0)
    )
    return full_out, cnt, tail_out, pos_c, tail_cnt, overflow


@partial(
    jax.jit,
    static_argnames=("max_steps", "full_steps", "cap", "emit_counts", "is_packed"),
)
def _turbo_impl(
    data, s0, r, tbl_a, tbl_b,
    input_size, width_bit, row_bits, dead, num_final, seg_bytes, halo_bytes,
    *, max_steps, full_steps, cap, emit_counts, is_packed,
):
    return scan_core(
        data, jnp.int32(0), s0, r, tbl_a, tbl_b,
        input_size, width_bit, row_bits, dead, num_final,
        seg_bytes, halo_bytes,
        max_steps=max_steps, full_steps=full_steps, cap=cap,
        emit_counts=emit_counts, is_packed=is_packed,
    )


def scan_shard_turbo(
    shard: ShardTables,
    data_padded,
    input_size: int,
    cfg: PfacConfig,
    *,
    max_steps: int,
    full_steps: int = 2,
    cap_frac: int = 8,
    emit_counts: bool = False,
    turbo_tables: TurboTables | None = None,
):
    """Run the turbo scan; returns a TurboResult-style tuple.

    ``(full_rows, cnt, tail_rows, tail_pos, tail_cnt, overflow)`` —
    see ``expand_turbo_matches`` for host-side assembly.  On
    ``overflow`` the caller must fall back to the dense engine.
    """
    tt = turbo_tables or build_turbo_tables(shard)
    n_pos = len(data_padded) - max_steps
    cap = max(-(-n_pos // cap_frac), 128)
    seg_bytes = cfg.segment_bytes if cfg.truncation == "segment" else 0
    return _turbo_impl(
        jnp.asarray(data_padded),
        jnp.asarray(tt.s0),
        jnp.asarray(tt.r),
        jnp.asarray(tt.packed if tt.is_packed else tt.ht),
        jnp.asarray(tt.val if tt.val is not None else np.zeros(1, np.int32)),
        jnp.int32(input_size),
        jnp.int32(tt.width_bit),
        jnp.int32(tt.row_bits),
        jnp.int32(tt.dead),
        jnp.int32(tt.num_final),
        jnp.int32(seg_bytes),
        jnp.int32(cfg.halo_bytes),
        max_steps=max_steps,
        full_steps=full_steps,
        cap=cap,
        emit_counts=emit_counts,
        is_packed=tt.is_packed,
    )


def expand_turbo_matches(result, input_size: int, tail_t0: int) -> np.ndarray:
    """Host assembly: turbo outputs -> [(pos, step, shard-local state)]
    sorted by (pos, step) — the same per-position increasing-length order
    as the reference's match rows.  ``tail_t0`` is the step index of the
    first tail row (= min(full_steps + 1, max_steps))."""
    full_rows, _cnt, tail_rows, tail_pos, _tail_cnt, overflow = result
    if bool(np.asarray(overflow)):
        raise OverflowError("turbo compaction overflow; use dense engine")
    full_rows = np.asarray(full_rows)
    tail_rows = np.asarray(tail_rows)
    tail_pos = np.asarray(tail_pos)

    parts = []
    if full_rows.size:
        t_idx, p_idx = np.nonzero(full_rows >= 0)
        keep = p_idx < input_size
        parts.append(
            np.stack(
                [p_idx[keep], t_idx[keep], full_rows[t_idx[keep], p_idx[keep]]],
                axis=1,
            )
        )
    if tail_rows.size:
        t_idx, j_idx = np.nonzero(tail_rows >= 0)
        p = tail_pos[j_idx]
        keep = p < input_size
        parts.append(
            np.stack(
                [
                    p[keep],
                    t_idx[keep] + tail_t0,
                    tail_rows[t_idx[keep], j_idx[keep]],
                ],
                axis=1,
            )
        )
    if not parts:
        return np.empty((0, 3), dtype=np.int64)
    m = np.concatenate(parts).astype(np.int64)
    order = np.lexsort((m[:, 1], m[:, 0]))
    return m[order]
