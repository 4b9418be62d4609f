"""Pure-jnp (XLA) PFAC scan — the portable reference engine.

Semantics are those of ``TraceTable_kernel`` (master_kernel.cu:92-180)
with the SUBSEG_MATCH walk (:37-74), re-expressed as a data-parallel
masked walk over *all* byte offsets at once instead of one CUDA thread
per offset:

* step 0: ``state = s0[byte[pos]]`` for every position (cf. :41);
* step t: for live walks, probe the PHF
  (``key = state*256 + ch``, ``row = key >> width_bit``,
  ``col = key & (width-1)``, ``idx = r[row] + col``,
  ``hit = 0 <= idx < ht_size and ht[idx] == row``, cf. :52-64);
* every state < k appends the shard-local final state to the
  position's match row (cf. :43-47, :67-70);
* walks stop at their per-position limit (segment+halo truncation or
  exact mode — ops.common.walk_limits).

This engine runs everywhere XLA runs; the Pallas kernel
(ops.pallas_scan) is the TPU-optimized path with identical results.

Only ``max_steps`` (bucketed to reduce recompiles), the slot count and
the emit mode are static — shard shape metadata (width_bit, final-state
count, input size) is traced, so all shards of a dictionary share one
executable per (bucket, table-size) combination.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from phfpfac_tpu.compile.tables import ShardTables
from phfpfac_tpu.ops.common import padded_steps


@partial(jax.jit, static_argnames=("max_steps", "slots", "emit_counts"))
def _scan_impl(
    data,  # uint8 [n_data] (padded: n_data >= n_pos + max_steps)
    limits,  # int32 [n_pos] exclusive read limit per position
    s0,  # int32 [256]
    r,  # int32 [dev_rows]
    ht,  # int32 [ht_size]
    val,  # int32 [ht_size]
    input_size,  # int32 scalar: valid start positions are < input_size
    width_bit,  # int32 scalar
    num_final,  # int32 scalar
    *,
    max_steps: int,
    slots: int,
    emit_counts: bool,
):
    n_pos = limits.shape[0]
    ht_size = ht.shape[0]
    pos = jnp.arange(n_pos, dtype=jnp.int32)
    valid = pos < input_size

    chars = data.astype(jnp.int32)

    # step 0: initial-state row lookup (master_kernel.cu:41)
    state = jnp.where(valid, jnp.take(s0, chars[:n_pos]), -1)

    out = None if emit_counts else jnp.full((n_pos, slots), -1, dtype=jnp.int32)
    cnt = jnp.zeros((n_pos,), dtype=jnp.int32)

    def emit(state, out, cnt):
        hit = (state >= 0) & (state < num_final)
        if out is not None:
            slot = jnp.minimum(cnt, slots - 1)
            cur = out[pos, slot]
            out = out.at[pos, slot].set(jnp.where(hit, state, cur))
        cnt = cnt + hit.astype(jnp.int32)
        return out, cnt

    out, cnt = emit(state, out, cnt)

    def step(t, state):
        """One probe for all walks (PHF lookup, master_kernel.cu:52-64)."""
        active = (state >= 0) & (pos + t < limits)
        ch = jax.lax.dynamic_slice(chars, (t,), (n_pos,))
        key = jnp.where(active, state, 0) * 256 + ch
        row = jax.lax.shift_right_logical(key, width_bit)
        col = key & ((1 << width_bit) - 1)
        idx = jnp.take(r, row, mode="clip") + col
        in_range = (idx >= 0) & (idx < ht_size)
        idx_c = jnp.clip(idx, 0, ht_size - 1)
        hit = in_range & (jnp.take(ht, idx_c) == row)
        nxt = jnp.where(hit, jnp.take(val, idx_c), -1)
        return jnp.where(active, nxt, -1)

    if emit_counts:
        def body_cnt(t, carry):
            state, cnt = carry
            state = step(t, state)
            _, cnt = emit(state, None, cnt)
            return state, cnt

        _state, cnt = jax.lax.fori_loop(1, max_steps, body_cnt, (state, cnt))
        return cnt

    def body(t, carry):
        state, out, cnt = carry
        state = step(t, state)
        out, cnt = emit(state, out, cnt)
        return state, out, cnt

    _state, out, cnt = jax.lax.fori_loop(1, max_steps, body, (state, out, cnt))
    return out, cnt


def scan_shard_jnp(
    shard: ShardTables,
    data_padded,  # uint8 [>= n_pos + max_steps]
    limits,  # int32 [n_pos]
    input_size: int,
    *,
    slots: int,
    emit_counts: bool = False,
):
    """Scan with one shard's tables; returns (match_rows, counts) or counts.

    ``match_rows[p, j]`` is the j-th shard-local final state hit by the
    walk from position p (-1 padded), in increasing match length —
    exactly the reference's per-shard ``match_result`` rows
    (master_kernel.cu:104-115) modulo the slot count.
    """
    # bucket the step count so shards with similar pattern lengths share
    # one compiled executable; extra steps are masked no-ops
    max_steps = padded_steps(shard.max_pat_len)
    return _scan_impl(
        jnp.asarray(data_padded),
        jnp.asarray(limits),
        jnp.asarray(shard.s0),
        jnp.asarray(shard.r),
        jnp.asarray(shard.ht),
        jnp.asarray(shard.val),
        jnp.int32(input_size),
        jnp.int32(shard.width_bit),
        jnp.int32(shard.final_state_num),
        max_steps=max_steps,
        slots=slots,
        emit_counts=emit_counts,
    )
