"""C++ host compiler parity vs the NumPy reference implementations."""

import numpy as np
import pytest

from phfpfac_tpu.compile import native
from phfpfac_tpu.compile.phf import build_phf
from phfpfac_tpu.compile.trie import build_pfac_trie
from phfpfac_tpu.frontend.patterns import Pattern, sort_patterns

needs_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def P(i, b):
    return Pattern(pattern_id=i, data=b)


def _random_patterns(seed, n, alpha_lo=97, alpha_hi=110, max_len=12):
    rng = np.random.default_rng(seed)
    raw = list(
        dict.fromkeys(
            bytes(rng.integers(alpha_lo, alpha_hi, rng.integers(1, max_len))
                  .astype(np.uint8))
            for _ in range(n)
        )
    )
    return sort_patterns([P(i + 1, b) for i, b in enumerate(raw)])


@needs_native
class TestNativeParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_trie_exact_match(self, seed):
        pats = _random_patterns(seed, 80)
        t_np = build_pfac_trie(pats, use_native=False)
        t_cc = build_pfac_trie(pats, use_native=True)
        assert t_cc.state_num == t_np.state_num
        assert t_cc.max_pat_len == t_np.max_pat_len
        np.testing.assert_array_equal(t_cc.table, t_np.table)
        np.testing.assert_array_equal(t_cc.pattern_id_map, t_np.pattern_id_map)

    def test_trie_duplicates_and_prefixes(self):
        pats = sort_patterns(
            [P(1, b"ab"), P(2, b"ab"), P(3, b"a"), P(4, b"abc"), P(5, b"b")]
        )
        t_np = build_pfac_trie(pats, use_native=False)
        t_cc = build_pfac_trie(pats, use_native=True)
        np.testing.assert_array_equal(t_cc.table, t_np.table)

    @pytest.mark.parametrize("width", [64, 256, 1024, 4096])
    def test_ffdm_exact_match(self, width):
        pats = _random_patterns(7, 60)
        trie = build_pfac_trie(pats, use_native=False)
        p_np = build_phf(trie.table, width, use_native=False)
        p_cc = build_phf(trie.table, width, use_native=True)
        assert p_cc.ht_size == p_np.ht_size
        assert p_cc.num_keys == p_np.num_keys
        assert p_cc.max_key == p_np.max_key
        assert p_cc.max_offset == p_np.max_offset
        np.testing.assert_array_equal(p_cc.r, p_np.r)
        np.testing.assert_array_equal(p_cc.ht, p_np.ht)
        np.testing.assert_array_equal(p_cc.val, p_np.val)

    def test_ffdm_binary_alphabet(self):
        rng = np.random.default_rng(3)
        raw = list(
            dict.fromkeys(
                bytes(rng.integers(0, 256, rng.integers(1, 7)).astype(np.uint8))
                for _ in range(40)
            )
        )
        pats = sort_patterns([P(i + 1, b) for i, b in enumerate(raw)])
        trie = build_pfac_trie(pats, use_native=False)
        for width in (256, 2048):
            p_np = build_phf(trie.table, width, use_native=False)
            p_cc = build_phf(trie.table, width, use_native=True)
            np.testing.assert_array_equal(p_cc.ht, p_np.ht)
            np.testing.assert_array_equal(p_cc.r, p_np.r)

    def test_native_speedup_path_used_by_default(self):
        # the default pipeline should route through native when available
        pats = _random_patterns(11, 30)
        t_def = build_pfac_trie(pats)
        t_np = build_pfac_trie(pats, use_native=False)
        np.testing.assert_array_equal(t_def.table, t_np.table)

    @pytest.mark.parametrize("seed", [0, 5, 9])
    def test_minimize_partition_equality(self, seed):
        """Native hash-partition == NumPy np.unique partition.

        Class NUMBERING differs (first-occurrence vs lexicographic
        order); the PARTITIONS must be identical — the relabelling
        between the two must be a bijection per level.
        """
        from phfpfac_tpu.compile.depth import (
            _bfs_levels,
            _partition_numpy,
        )

        pats = _random_patterns(seed, 120, alpha_lo=97, alpha_hi=103)
        trie = build_pfac_trie(pats)
        dense = trie.table.astype(np.int32)
        init = trie.final_state_num + 1
        levels = _bfs_levels(dense, init)
        inv_np, rep_np = _partition_numpy(dense, levels, trie.final_state_num)
        inv_cc, rep_cc = native.minimize_levels_native(
            dense, levels, trie.final_state_num
        )
        for li in range(len(levels)):
            assert len(rep_np[li]) == len(rep_cc[li])  # same class count
            fwd, bwd = {}, {}
            for a, b in zip(inv_np[li], inv_cc[li]):
                a, b = int(a), int(b)
                assert fwd.setdefault(a, b) == b
                assert bwd.setdefault(b, a) == a

    @pytest.mark.parametrize("seed,colspan", [(0, 256), (3, 64), (8, 4096)])
    def test_layout_distinct_exact_match(self, seed, colspan):
        """Native CSR layout == NumPy _layout_distinct placement."""
        from phfpfac_tpu.compile.depth import _EMPTY, _layout_with_growth
        from phfpfac_tpu.compile.native import layout_distinct_native

        rng = np.random.default_rng(seed)
        n = 60
        cols_list, side_list = [], []
        for _ in range(n):
            nc = int(rng.integers(0, 9))
            ns = int(rng.integers(0, 3))
            cols_list.append(
                np.sort(
                    rng.choice(colspan, size=nc, replace=False)
                ).astype(np.int64)
            )
            side_list.append(
                np.sort(
                    rng.choice(colspan, size=ns, replace=False)
                ).astype(np.int64)
            )
        force = rng.integers(0, 2, n).astype(bool)
        off_np, len_np = _layout_with_growth(
            cols_list, colspan=colspan, force_offset=force,
            side_cols_list=side_list,
        )
        cols_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(c) for c in cols_list], out=cols_offs[1:])
        side_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(s) for s in side_list], out=side_offs[1:])
        res = layout_distinct_native(
            cols_offs,
            np.concatenate(cols_list) if cols_offs[-1] else
            np.empty(0, np.int64),
            cap=max(2048, 4 * int(cols_offs[-1] + side_offs[-1] + n)),
            colspan=colspan, force_offset=force, side_offs=side_offs,
            side_blob=np.concatenate(side_list) if side_offs[-1] else
            np.empty(0, np.int64),
            empty=_EMPTY,
        )
        assert res is not None
        off_cc, len_cc = res
        assert len_cc == len_np
        np.testing.assert_array_equal(off_cc, off_np)


def test_decode_hits_native_parity():
    """Threaded C++ bitmap decode == NumPy decode (the oracle), over
    random dictionaries/corpora, both PHF and dense-trie walk
    backends."""
    from phfpfac_tpu.compile.native import available, decode_hits_native
    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.oracle.ac import match_oracle
    from phfpfac_tpu.ops.common import padded_steps
    from phfpfac_tpu.utils.config import PfacConfig

    if not available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(5)
    for trial, sig in enumerate((27, 256, 5)):
        alpha = rng.integers(0, 256, sig, dtype=np.uint8)
        words = list(dict.fromkeys(
            bytes(rng.choice(alpha, int(rng.integers(1, 12))))
            for _ in range(300)
        ))
        pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
        cfg = PfacConfig(width=1024, num_shards=1, truncation="none")
        compiled = compile_patterns(pats, cfg)
        sh = compiled.shards[0]
        data = bytes(rng.choice(alpha, 20000))
        n = len(data)
        ms = padded_steps(compiled.max_pat_len)
        # bitmap from the oracle: bit (len-1) at each match position
        # (the kernels' contract, ops/pallas_scan.py docstring)
        plen = {pt.pattern_id: len(pt.data) for pt in pats}
        bits = np.zeros(n, dtype=np.uint32)
        for pos, pid in match_oracle(pats, data, cfg):
            bits[pos] |= np.uint32(1) << np.uint32(plen[pid] - 1)
        hit_pos = np.nonzero(bits)[0].astype(np.int64)
        hb = bits[hit_pos]
        arr = np.frombuffer(data, dtype=np.uint8)
        if trial == 0:
            sh.ensure_phf()  # exercise the PHF walk backend
        assert hit_pos.size > 0
        got = decode_hits_native(hb, hit_pos, arr, sh, min(ms, 32))
        want = _numpy_decode(hb, hit_pos, arr, sh, min(ms, 32))
        assert len(got) == int(np.bitwise_count(hb).sum())
        np.testing.assert_array_equal(got, want)
        # hash-probe decode (no trie walk): identical triples
        from phfpfac_tpu.compile.native import decode_hits_hash_native

        got_h = decode_hits_hash_native(hb, hit_pos, arr, sh, min(ms, 32))
        np.testing.assert_array_equal(got_h, want)


def _numpy_decode(hb, hit_pos, arr, shard, max_t):
    """The pre-native NumPy decode (kept verbatim as the oracle)."""
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
            out.append(np.stack(
                [hit_pos[sel], np.full(sel.sum(), t, np.int64), state[sel]],
                axis=1))

    record(0, state)
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
