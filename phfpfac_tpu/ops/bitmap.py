"""Match-bitmap decoding.

The pallas kernel emits, per position, a 32-bit bitmap with bit t set
iff a match of length t+1 starts there.  Because all matches starting
at one position form a prefix chain in the dictionary, (position,
length) identifies the pattern uniquely, so shard-local final states
are recovered by hashing the matched substring — the same information
the reference materializes as the [input_size x max_pat_len] match
rows (master_kernel.cu:104-115) at 1/max_pat_len the memory.
"""

from __future__ import annotations

import numpy as np

from phfpfac_tpu.frontend.patterns import Pattern


def build_substring_index(shard_patterns: list[Pattern]) -> dict[bytes, int]:
    """pattern bytes -> shard-local final state (later duplicates win,
    matching the trie overwrite at create_table_reorder.c:366)."""
    return {p.data: i for i, p in enumerate(shard_patterns)}


def decode_bitmap(
    bits: np.ndarray,  # int32 [n_pos]
    data: bytes,
    input_size: int,
    index: dict[bytes, int],
    max_steps: int,
) -> np.ndarray:
    """bitmaps -> flat int64 [(pos, step, shard-local state)] sorted by
    (pos, step)."""
    bits = np.asarray(bits)[:input_size].view(np.uint32)
    hit_pos = np.nonzero(bits)[0]
    if hit_pos.size == 0:
        return np.empty((0, 3), dtype=np.int64)
    out = []
    for t in range(min(max_steps, 32)):
        sel = (bits[hit_pos] >> np.uint32(t)) & np.uint32(1)
        for p in hit_pos[sel.astype(bool)]:
            local = index.get(data[p : p + t + 1])
            if local is None:  # cannot happen for a correct kernel
                raise KeyError(
                    f"bitmap claims match at pos {p} len {t + 1} "
                    "but no such pattern exists"
                )
            out.append((int(p), t, local))
    m = np.array(out, dtype=np.int64).reshape(-1, 3)
    return m[np.lexsort((m[:, 1], m[:, 0]))]
