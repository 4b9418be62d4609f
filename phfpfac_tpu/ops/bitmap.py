"""Match-bitmap decoding.

The pallas kernel emits, per position, a 32-bit bitmap with bit t set
iff a match of length t+1 starts there.  The bitmap plus the compiled
tables fully determine the matches: re-walking only the hit positions
through the PHF (vectorized on the host, NumPy) recovers each match's
shard-local final state.  Hit positions are a small fraction of the
input, so the decode pass costs O(hits x avg walk), and the device
never materializes the reference's [input_size x max_pat_len] match
rows (master_kernel.cu:104-115) — the bitmap is 4 bytes/position.
"""

from __future__ import annotations

import numpy as np

from phfpfac_tpu.compile.tables import ShardTables


def decode_bitmap(
    bits: np.ndarray,  # int32 [>= input_size]
    data: bytes | np.ndarray,
    input_size: int,
    shard: ShardTables,
    max_steps: int,
) -> np.ndarray:
    """bitmaps -> flat int64 [(pos, step, shard-local state)] sorted by
    (pos, step), by re-walking hit positions through the shard's PHF."""
    bits = np.asarray(bits)[:input_size].view(np.uint32)
    hit_pos = np.nonzero(bits)[0].astype(np.int64)
    if hit_pos.size == 0:
        return np.empty((0, 3), dtype=np.int64)
    arr = (
        np.frombuffer(bytes(data), dtype=np.uint8)
        if isinstance(data, (bytes, bytearray))
        else np.asarray(data, dtype=np.uint8)
    )
    hb = bits[hit_pos]
    width_bit = shard.width_bit
    width_m1 = shard.width - 1
    ht_size = shard.ht_size
    k = shard.final_state_num
    n = len(arr)

    state = shard.s0[arr[hit_pos]].astype(np.int64)
    out = []

    def record(t, state):
        sel = ((hb >> np.uint32(t)) & np.uint32(1)).astype(bool)
        sel &= (state >= 0) & (state < k)
        if sel.any():
            out.append(
                np.stack(
                    [hit_pos[sel], np.full(sel.sum(), t, np.int64), state[sel]],
                    axis=1,
                )
            )

    record(0, state)
    max_t = min(max_steps, 32)
    for t in range(1, max_t):
        if not (state >= 0).any():
            break
        idx_c = np.minimum(hit_pos + t, n - 1)
        ch = arr[idx_c].astype(np.int64)
        key = np.where(state >= 0, state, 0) * 256 + ch
        row = key >> width_bit
        col = key & width_m1
        row_ok = (state >= 0) & (row < len(shard.r)) & (hit_pos + t < n)
        ridx = shard.r[np.clip(row, 0, len(shard.r) - 1)] + col
        ok = row_ok & (ridx >= 0) & (ridx < ht_size)
        ridx_c = np.clip(ridx, 0, max(ht_size - 1, 0))
        ok &= shard.ht[ridx_c] == row
        state = np.where(ok, shard.val[ridx_c], -1).astype(np.int64)
        record(t, state)

    if not out:
        return np.empty((0, 3), dtype=np.int64)
    m = np.concatenate(out)
    return m[np.lexsort((m[:, 1], m[:, 0]))]
