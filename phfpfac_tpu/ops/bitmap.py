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

_FETCH_BLOCK = 1024  # positions per sparsity block (n_pos granularity)

# Planes at most this many positions (4 B each) just download whole —
# below ~2 MB the bulk transfer undercuts the extra count round trip
# (~40 ms) the compacted path pays.
_BULK_POSITIONS = 1 << 19

_gather_fns: dict = {}
_probe_fns: dict = {}
_u8_fn = None

# optimistic single-trip probe caps: counts AND up to this many
# compacted hits come back in ONE dispatch+fetch (48 KB); only scans
# whose hit count overflows pay a second, correctly-sized trip
_PROBE_HITS = 4096
_PROBE_BLOCKS = 1024


def _device_probe(bits_dev, input_size: int):
    """One dispatch: (hit count, past-low-byte count, hit-block count,
    pos[_PROBE_HITS], bits[_PROBE_HITS]) — the sparse-regime fast path
    resolves in a single device round trip (the tunnel here costs
    ~40 ms per fetch, so trip count IS the sparse resolve latency).
    Compaction is two-level over the per-1024-block any() mask (see
    _device_gather)."""
    import jax
    import jax.numpy as jnp

    n = bits_dev.shape[0]
    nb = n // _FETCH_BLOCK
    cap_b = min(_PROBE_BLOCKS, nb)
    fn = _probe_fns.get((n, cap_b))
    if fn is None:

        def f(b, m):
            i = jax.lax.iota(jnp.int32, b.shape[0])
            masked = jnp.where(i < m, b, 0)
            blk = masked.reshape(nb, _FETCH_BLOCK)
            bany = jnp.any(blk != 0, axis=1)
            cnt = jnp.count_nonzero(masked)
            high = jnp.count_nonzero(masked & ~0xFF)
            nblk = jnp.count_nonzero(bany)
            nblk_high = jnp.count_nonzero(
                jnp.any((blk & ~0xFF) != 0, axis=1)
            )
            (bidx,) = jnp.nonzero(bany, size=cap_b, fill_value=nb)
            g = jnp.where(
                (bidx < nb)[:, None], blk[jnp.minimum(bidx, nb - 1)], 0
            )
            flat_n = cap_b * _FETCH_BLOCK
            (hi,) = jnp.nonzero(
                g.reshape(-1), size=_PROBE_HITS, fill_value=flat_n
            )
            safe = jnp.minimum(hi, flat_n - 1)
            pos = bidx[safe // _FETCH_BLOCK] * _FETCH_BLOCK \
                + safe % _FETCH_BLOCK
            vals = g.reshape(-1)[safe]
            pos = jnp.where(hi < flat_n, pos, n)
            # ONE output array -> one host transfer (each fetch is a
            # full tunnel round trip)
            return jnp.concatenate(
                [jnp.stack([cnt, high, nblk, nblk_high]), pos, vals]
            )

        fn = _probe_fns[(n, cap_b)] = jax.jit(f)
    out = np.asarray(fn(bits_dev, jnp.int32(input_size)))
    cnt, high, nblk, nblk_high = (int(v) for v in out[:4])
    pos = out[4 : 4 + _PROBE_HITS].astype(np.int64)
    vals = out[4 + _PROBE_HITS :]
    return cnt, high, nblk, nblk_high, pos, vals


def _device_u8(bits_dev, input_size: int):
    """Low byte of every position's bitmap (1 B/position download)."""
    import jax
    import jax.numpy as jnp

    global _u8_fn
    if _u8_fn is None:

        def f(b, m):
            i = jax.lax.iota(jnp.int32, b.shape[0])
            return (jnp.where(i < m, b, 0) & 0xFF).astype(jnp.uint8)

        _u8_fn = jax.jit(f)
    return _u8_fn(bits_dev, jnp.int32(input_size))


def _device_gather_flat(bits_dev, input_size: int, cap: int,
                        high_only: bool = False):
    """Flat nonzero(size=cap) compaction — for regimes whose HIT
    BLOCKS are not sparse (dense corpora touch every 1024-block, so
    the two-level gather would materialize full-plane row-gathers;
    the flat scan is one ~374 ms/32 MiB pass instead)."""
    import jax
    import jax.numpy as jnp

    fn = _gather_fns.get((cap, high_only, "flat"))
    if fn is None:

        def f(b, m):
            i = jax.lax.iota(jnp.int32, b.shape[0])
            masked = jnp.where(i < m, b, 0)
            sel = masked & ~0xFF if high_only else masked
            (idx,) = jnp.nonzero(sel, size=cap, fill_value=b.shape[0])
            vals = masked[jnp.clip(idx, 0, b.shape[0] - 1)]
            return idx, vals

        fn = _gather_fns[(cap, high_only, "flat")] = jax.jit(f)
    return fn(bits_dev, jnp.int32(input_size))


def _device_gather(bits_dev, input_size: int, cap: int,
                   high_only: bool = False, cap_blocks: int = 0):
    """Two-level compaction on device: positions + their bitmaps.

    ``high_only`` selects only positions whose bitmap extends past the
    low byte (the exception list of the u8-plane regime).  Fill slots
    carry index n (past any valid position) so the host can drop them
    with one compare.

    The compaction is TWO-LEVEL: nonzero over the per-1024-block any()
    mask (n/1024 elements), a row-gather of just the hit blocks, then
    nonzero within those blocks only.  A flat nonzero over the plane
    costs 374 ms at 32 MiB on this stack (XLA's general scatter path,
    bench/compact_attrib.py); the block mask reduction is a sequential
    pass and both nonzeros now run over thousands of elements.
    ``cap_blocks`` bounds the hit-block count (from the probe's
    block count).
    """
    import jax
    import jax.numpy as jnp

    n = bits_dev.shape[0]
    nb = n // _FETCH_BLOCK
    cap_blocks = min(max(cap_blocks, 1), nb)
    fn = _gather_fns.get((cap, high_only, cap_blocks))
    if fn is None:

        def f(b, m):
            # plane geometry DERIVED from the traced shape: jit
            # re-traces per input shape, so closure-baked nb/n from
            # the build-time plane would corrupt a different-length
            # call sharing the (cap, high_only, cap_blocks) cache key
            # (hit r5 by StreamMatcher's first-feed window, which is
            # one pad block shorter than tail-extended feeds)
            nb_ = b.shape[0] // _FETCH_BLOCK
            n_ = b.shape[0]
            i = jax.lax.iota(jnp.int32, n_)
            masked = jnp.where(i < m, b, 0)
            sel = masked & ~0xFF if high_only else masked
            blk = sel.reshape(nb_, _FETCH_BLOCK)
            bany = jnp.any(blk != 0, axis=1)
            (bidx,) = jnp.nonzero(bany, size=cap_blocks, fill_value=nb_)
            safe_b = jnp.minimum(bidx, nb_ - 1)
            g = jnp.where(
                (bidx < nb_)[:, None], blk[safe_b], 0
            )
            gm = masked.reshape(nb_, _FETCH_BLOCK)[safe_b]
            flat_n = cap_blocks * _FETCH_BLOCK
            (hi,) = jnp.nonzero(
                g.reshape(-1), size=cap, fill_value=flat_n
            )
            safe = jnp.minimum(hi, flat_n - 1)
            pos = bidx[safe // _FETCH_BLOCK] * _FETCH_BLOCK \
                + safe % _FETCH_BLOCK
            vals = gm.reshape(-1)[safe]
            pos = jnp.where(hi < flat_n, pos, n_)
            return pos, vals

        fn = _gather_fns[(cap, high_only, cap_blocks)] = jax.jit(f)
    return fn(bits_dev, jnp.int32(input_size))


def fetch_hit_bits(bits_dev, input_size: int):
    """Download only the bitmap entries that contain hits.

    The device->host link here is the expensive resource (a tunnel
    with ~40 ms latency and limited bandwidth), and at realistic match
    densities the per-position bitmap is almost entirely zero.
    Regimes, cheapest first:

    * sparse (the realistic NIDS case) — ONE optimistic probe
      dispatch returns counts AND up to _PROBE_HITS two-level-
      compacted (pos, bits) pairs in a single fetch: most scans
      resolve in one round trip;
    * spread-out hits past the probe cap — a correctly-sized
      two-level compaction (device nonzero over hit BLOCKS, then
      within them; never over the full plane): the download is
      O(hits), 8 bytes per hit (the reference instead materializes
      [input_size x max_pat_len] match rows on device,
      master_kernel.cu:104-115);
    * dense (hits past ~1/8 of positions, e.g. english dict over
      english text at 0.42 matches/byte) — the plane's LOW BYTE at
      1 B/position plus an exception list of the rare positions whose
      bitmap extends past bit 7 (matches longer than 8 bytes): 4x less
      transfer than the raw plane, ~2x less than 8 B/hit at 25%
      density;
    * tiny planes — one bulk download (a probe round trip costs
      more than the plane).

    Returns (hit_pos int64[], hit_bits uint32[]).
    """
    n = bits_dev.shape[0]
    assert n % _FETCH_BLOCK == 0  # scan outputs are TILE-granular
    nb = n // _FETCH_BLOCK

    def bulk():
        flat = np.asarray(bits_dev).view(np.uint32)
        pos = np.nonzero(flat[:input_size])[0].astype(np.int64)
        return pos, flat[pos]

    if n <= _BULK_POSITIONS:
        return bulk()
    # optimistic probe: counts + up to _PROBE_HITS compacted hits in a
    # SINGLE dispatch + fetch — the sparse regime (the realistic NIDS
    # case: few matches in a big corpus) resolves in one ~40 ms tunnel
    # round trip instead of the old mask-fetch + block-gather-fetch
    # pair
    cnt, high, nblk, nblk_high, ppos, pvals = _device_probe(
        bits_dev, input_size
    )
    if cnt == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint32)
    if (
        cnt <= _PROBE_HITS
        and nblk <= min(_PROBE_BLOCKS, nb)
        and 8 * cnt <= input_size + 8 * high
    ):
        keep = ppos < input_size
        return ppos[keep], pvals.view(np.uint32)[keep]

    def compacted(count, high_only):
        cap = 1 << (count - 1).bit_length()
        blocks = nblk_high if high_only else nblk
        if blocks > nb // 4:
            # hit blocks are NOT sparse (dense corpora touch every
            # 1024-block): the two-level gather would materialize
            # full-plane row-gathers — one flat pass is cheaper
            idx_d, vals_d = _device_gather_flat(
                bits_dev, input_size, cap, high_only
            )
        else:
            cap_b = 1 << max(blocks - 1, 0).bit_length()
            idx_d, vals_d = _device_gather(bits_dev, input_size, cap,
                                           high_only, cap_blocks=cap_b)
        pos = np.asarray(idx_d).astype(np.int64)
        hb = np.asarray(vals_d).view(np.uint32)
        keep = pos < input_size  # drops the fill slots (index n)
        return pos[keep], hb[keep]

    # transfer-cost break-even: 8 B/hit vs 1 B/pos + 8 B/exception
    if 8 * cnt <= input_size + 8 * high:
        return compacted(cnt, False)
    u8 = np.asarray(_device_u8(bits_dev, input_size))
    pos = np.flatnonzero(u8[:input_size]).astype(np.int64)
    hb = u8[pos].astype(np.uint32)
    if high:
        hpos, hbits = compacted(high, True)  # full bitmaps of those
        ins = np.searchsorted(pos, hpos)
        present = np.zeros(len(hpos), bool)
        if pos.size:
            inc = np.minimum(ins, pos.size - 1)
            present = (ins < pos.size) & (pos[inc] == hpos)
        hb[ins[present]] = hbits[present]
        if (~present).any():
            pos = np.concatenate([pos, hpos[~present]])
            hb = np.concatenate([hb, hbits[~present]])
            order = np.argsort(pos, kind="stable")
            pos, hb = pos[order], hb[order]
    return pos, hb


def decode_bitmap(
    bits: np.ndarray,  # int32 [>= input_size] (host or device)
    data: bytes | np.ndarray,
    input_size: int,
    shard: ShardTables,
    max_steps: int,
) -> np.ndarray:
    """bitmaps -> flat int64 [(pos, step, shard-local state)] sorted by
    (pos, step), by re-walking hit positions through the shard's PHF."""
    bits = np.asarray(bits)[:input_size].view(np.uint32)
    hit_pos = np.nonzero(bits)[0].astype(np.int64)
    return decode_hits(bits[hit_pos], hit_pos, data, input_size, shard,
                       max_steps)


def decode_hits(
    hb: np.ndarray,  # uint32 [h] bitmaps of the hit positions
    hit_pos: np.ndarray,  # int64 [h]
    data: bytes | np.ndarray,
    input_size: int,
    shard: ShardTables,
    max_steps: int,
) -> np.ndarray:
    """Sparse-form decode (see fetch_hit_bits)."""
    if hit_pos.size == 0:
        return np.empty((0, 3), dtype=np.int64)
    arr = (
        np.frombuffer(bytes(data), dtype=np.uint8)
        if isinstance(data, (bytes, bytearray))
        else np.asarray(data, dtype=np.uint8)
    )
    import os

    from phfpfac_tpu.compile import native

    if native.available():
        # match-dense corpora make this walk the e2e bottleneck; the
        # threaded C++ paths are the fast lane (the NumPy code below
        # stays the semantics oracle,
        # tests/test_native.py::test_decode_hits_native_parity).
        # Plain dictionaries skip the trie walk entirely: bit t at pos
        # means data[pos..pos+t] IS a pattern, so decode is ONE
        # open-addressed hash probe per set bit (L2-resident table)
        # instead of per-step dense-table cache misses.
        if (
            shard.patterns is not None
            and shard.output_lists is None
            and os.environ.get("PHFPFAC_NO_HASH_DECODE") != "1"
        ):
            return native.decode_hits_hash_native(
                hb, hit_pos, arr[:input_size], shard, min(max_steps, 32)
            )
        return native.decode_hits_native(
            hb, hit_pos, arr[:input_size], shard, min(max_steps, 32)
        )
    # Walk backend: the PHF probe when it is already built, else the
    # dense trie table (one gather per step; keeps the decode path
    # from forcing the lazy FFDM pack, compile.tables.ShardTables).
    use_phf = shard.has_phf
    if use_phf:
        width_bit = shard.width_bit
        width_m1 = shard.width - 1
        ht_size = shard.ht_size
    else:
        dense = shard.dense_table()
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
        alive = (state >= 0) & (hit_pos + t < n)
        if use_phf:
            key = np.where(state >= 0, state, 0) * 256 + ch
            row = key >> width_bit
            col = key & width_m1
            row_ok = alive & (row < len(shard.r))
            ridx = shard.r[np.clip(row, 0, len(shard.r) - 1)] + col
            ok = row_ok & (ridx >= 0) & (ridx < ht_size)
            ridx_c = np.clip(ridx, 0, max(ht_size - 1, 0))
            ok &= shard.ht[ridx_c] == row
            state = np.where(ok, shard.val[ridx_c], -1).astype(np.int64)
        else:
            nxt = dense[np.where(alive, state, 0), ch]
            state = np.where(alive, nxt, -1).astype(np.int64)
        record(t, state)

    if not out:
        return np.empty((0, 3), dtype=np.int64)
    m = np.concatenate(out)
    return m[np.lexsort((m[:, 1], m[:, 0]))]
