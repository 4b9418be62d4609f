"""Unit tests for the host compiler: frontend, trie, PHF."""

import numpy as np
import pytest

from phfpfac_tpu.compile.phf import build_phf, phf_lookup_host
from phfpfac_tpu.compile.trie import build_pfac_trie
from phfpfac_tpu.frontend.patterns import (
    Pattern,
    decode_escaped_line,
    read_patterns,
    shard_patterns,
    sort_patterns,
)


def P(i, b):
    return Pattern(pattern_id=i, data=b)


class TestFrontend:
    def test_read_patterns_ids_in_file_order(self, tmp_path):
        f = tmp_path / "pats"
        f.write_bytes(b"zebra\napple\nmango\n")
        pats = read_patterns(str(f))
        assert [(p.pattern_id, p.data) for p in pats] == [
            (1, b"zebra"), (2, b"apple"), (3, b"mango"),
        ]

    def test_read_patterns_no_trailing_newline(self, tmp_path):
        f = tmp_path / "pats"
        f.write_bytes(b"ab\ncd")
        pats = read_patterns(str(f))
        assert [p.data for p in pats] == [b"ab", b"cd"]

    def test_read_patterns_rejects_empty_line(self, tmp_path):
        f = tmp_path / "pats"
        f.write_bytes(b"ab\n\ncd\n")
        with pytest.raises(ValueError, match="empty"):
            read_patterns(str(f))

    def test_sort_prefix_before_extension(self):
        pats = [P(1, b"aaaa"), P(2, b"aa"), P(3, b"a"), P(4, b"aaa")]
        assert [p.pattern_id for p in sort_patterns(pats)] == [3, 2, 4, 1]

    def test_sort_memcmp_semantics(self):
        pats = [P(1, b"ab"), P(2, b"a\xff"), P(3, b"a\x01")]
        assert [p.data for p in sort_patterns(pats)] == [b"a\x01", b"ab", b"a\xff"]

    def test_shard_split_sizes(self):
        pats = [P(i + 1, bytes([65 + i])) for i in range(10)]
        shards = shard_patterns(pats, 4)
        # k = 10//4 = 2; last gets 2 + 10%4 = 4 (create_table_reorder.c:220-222)
        assert [len(s) for s in shards] == [2, 2, 2, 4]
        assert shards[3][0].data == pats[6].data

    def test_shard_fewer_patterns_than_shards(self):
        pats = [P(1, b"x"), P(2, b"y")]
        shards = shard_patterns(pats, 4)
        assert [len(s) for s in shards] == [0, 0, 0, 2]

    def test_escape_decoding(self):
        assert decode_escaped_line(rb"a\nb") == b"a\nb"
        assert decode_escaped_line(rb"\x41\x42") == b"AB"
        assert decode_escaped_line(rb"\101\102") == b"AB"
        assert decode_escaped_line(rb"\t\r\a\b\v\f") == b"\t\r\x07\x08\x0b\x0c"
        assert decode_escaped_line(rb"\\") == b"\\"
        assert decode_escaped_line(rb"\q") == rb"\q"  # not an escape
        assert decode_escaped_line(rb"\779") == bytes([0o77]) + b"9"
        assert decode_escaped_line(rb"\8") == b"\x008"  # fscanf %o matches nothing

    def test_escape_hex_error(self):
        with pytest.raises(ValueError):
            decode_escaped_line(rb"\xzz")


class TestTrie:
    def test_numbering_contract(self):
        # sorted shard: a, aa, aaa, aaaa
        pats = [P(3, b"a"), P(2, b"aa"), P(4, b"aaa"), P(1, b"aaaa")]
        t = build_pfac_trie(pats)
        k = 4
        assert t.final_state_num == k
        assert t.initial_state == k + 1
        # "a": init --a--> final 0
        assert t.table[t.initial_state, ord("a")] == 0
        # "aa": final0 --a--> final 1, etc (transitions out of final states)
        assert t.table[0, ord("a")] == 1
        assert t.table[1, ord("a")] == 2
        assert t.table[2, ord("a")] == 3
        assert t.pattern_id_map.tolist() == [3, 2, 4, 1]

    def test_interior_states_from_k_plus_2(self):
        pats = [P(1, b"ab"), P(2, b"ac")]
        t = build_pfac_trie(pats)
        # 'a' from init creates interior state k+2 = 4
        assert t.table[3, ord("a")] == 4
        assert t.table[4, ord("b")] == 0
        assert t.table[4, ord("c")] == 1
        assert t.state_num == 5

    def test_duplicate_pattern_overwrites_final(self):
        pats = [P(1, b"xy"), P(2, b"xy")]
        t = build_pfac_trie(pats)
        # both walk init --x--> interior, final transition overwritten by idx 1
        inter = t.table[t.initial_state, ord("x")]
        assert t.table[inter, ord("y")] == 1  # last duplicate wins
        assert t.pattern_id_map.tolist() == [1, 2]

    def test_empty_shard(self):
        t = build_pfac_trie([])
        assert t.final_state_num == 0
        assert t.initial_state == 1
        assert (t.s0 == -1).all()


class TestPhf:
    def _roundtrip(self, table, width):
        phf = build_phf(np.asarray(table, dtype=np.int32), width)
        state_num = len(table)
        keys = np.arange(state_num * 256, dtype=np.int64)
        dense = np.asarray(table, dtype=np.int32).ravel()
        got = phf_lookup_host(phf, keys)
        np.testing.assert_array_equal(got, dense)
        return phf

    def test_lookup_equals_dense_small(self):
        rng = np.random.default_rng(0)
        table = np.full((50, 256), -1, dtype=np.int32)
        mask = rng.random((50, 256)) < 0.02
        table[mask] = rng.integers(0, 50, mask.sum())
        self._roundtrip(table, 256)

    def test_lookup_equals_dense_trie(self):
        pats = [P(i + 1, w.encode()) for i, w in enumerate(
            ["alpha", "alphabet", "beta", "bet", "be", "gamma", "gam"]
        )]
        t = build_pfac_trie(sort_patterns(pats))
        for width in (64, 256, 1024, 4096):
            self._roundtrip(t.table, width)

    def test_absent_keys_miss(self):
        table = np.full((10, 256), -1, dtype=np.int32)
        table[5, ord("a")] = 7
        phf = build_phf(table, 128)
        # probe every key; only 5*256+97 hits
        keys = np.arange(10 * 256)
        got = phf_lookup_host(phf, keys)
        assert (got >= 0).sum() == 1
        assert got[5 * 256 + ord("a")] == 7

    def test_width_must_be_pow2_and_bounded(self):
        table = np.full((4, 256), -1, dtype=np.int32)
        with pytest.raises(ValueError):
            build_phf(table, 100)
        with pytest.raises(ValueError):
            build_phf(table, 8192)

    def test_first_fit_is_dense(self):
        # single full row must land at offset 0
        table = np.zeros((1, 256), dtype=np.int32)  # row of 256 keys, width 256
        phf = build_phf(table, 256)
        assert phf.r[0] == 0
        assert phf.ht_size == 256

    def test_reference_stats_shape(self):
        # englishdic-scale invariants can't run in unit time; check the
        # stats fields exist and are consistent on a small trie.
        pats = [P(i + 1, w.encode()) for i, w in enumerate(["abc", "abd", "xyz"])]
        t = build_pfac_trie(sort_patterns(pats))
        phf = build_phf(t.table, 256)
        assert phf.num_keys == int((t.table >= 0).sum())
        assert phf.ht_size <= phf.max_offset + phf.width
        assert phf.stats_report()


def test_save_load_lazy_phf_roundtrip(tmp_path):
    """Format v2: a never-built PHF is not serialized; load restores
    the lazy state and builds it on first access to the same tables."""
    from phfpfac_tpu.compile.tables import CompiledDictionary, compile_patterns
    from phfpfac_tpu.utils.config import PfacConfig

    pats = [Pattern(i + 1, w) for i, w in enumerate(
        [b"the", b"there", b"cat", b"dog"])]
    cfg = PfacConfig(width=256, num_shards=1)
    compiled = compile_patterns(pats, cfg)
    assert not compiled.shards[0].has_phf  # lazy by default
    path = tmp_path / "tables.npz"
    compiled.save(path)
    loaded = CompiledDictionary.load(path)
    assert not loaded.shards[0].has_phf
    # forcing the PHF on both sides yields identical tables
    np.testing.assert_array_equal(loaded.shards[0].r, compiled.shards[0].r)
    np.testing.assert_array_equal(loaded.shards[0].ht, compiled.shards[0].ht)
    np.testing.assert_array_equal(loaded.shards[0].val, compiled.shards[0].val)
    assert compiled.shards[0].has_phf
    # saving WITH the PHF built keeps it eager through a round trip
    compiled.save(path)
    again = CompiledDictionary.load(path)
    assert again.shards[0].has_phf
    assert again.shards[0].ht_size == compiled.shards[0].ht_size


def test_save_load_plan_tables_v3(tmp_path):
    """Format v3: built plan tables round-trip, the loaded Matcher uses
    them without rebuilding (build_plan_tables not called), and match
    output is identical."""
    from unittest import mock

    from phfpfac_tpu.compile.tables import CompiledDictionary, compile_patterns
    from phfpfac_tpu.parallel.matcher import Matcher
    from phfpfac_tpu.utils.config import PfacConfig

    pats = [Pattern(i + 1, w) for i, w in enumerate(
        [b"the", b"then", b"there", b"cat", b"dog", b"do"])]
    cfg = PfacConfig(width=256, num_shards=1, truncation="none",
                     interpret=True)
    compiled = compile_patterns(pats, cfg)
    data = b"the cat and the dog went there and then did " * 30
    m = Matcher(compiled, cfg, engine="pallas", train=data[:256])
    want = m.match(data).tolist()
    compiled.plan_tables = m.built_plan_tables()
    assert compiled.plan_tables[0] is not None
    path = tmp_path / "tables_v3.npz"
    compiled.save(path)

    loaded = CompiledDictionary.load(path)
    pt = loaded.plan_tables[0]
    orig = compiled.plan_tables[0]
    assert pt.steps == orig.steps  # StepSpec tuples round-trip exactly
    assert pt.kinds == orig.kinds
    assert pt.live_frac == orig.live_frac
    np.testing.assert_array_equal(pt.packed_banks, orig.packed_banks)
    with mock.patch(
        "phfpfac_tpu.ops.pallas_plan.build_plan_tables",
        side_effect=AssertionError("v3 load must not rebuild plan"),
    ):
        m2 = Matcher(loaded, cfg, engine="pallas")
        got = m2.match(data).tolist()
    assert got == want
