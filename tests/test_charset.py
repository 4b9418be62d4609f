"""Charset-class frontend: parsing, determinization, engine parity."""

import numpy as np
import pytest

from phfpfac_tpu.compile.tables import compile_class_patterns
from phfpfac_tpu.frontend.charset import (
    ClassPattern,
    build_class_trie,
    parse_class_pattern,
)
from phfpfac_tpu.oracle.ac import match_oracle_charset
from phfpfac_tpu.parallel.matcher import Matcher
from phfpfac_tpu.utils.config import PfacConfig


def CP(i, spec):
    return parse_class_pattern(spec, i)


class TestParsing:
    def test_literal(self):
        cp = CP(1, b"abc")
        assert [sorted(c) for c in cp.classes] == [[97], [98], [99]]

    def test_range_class(self):
        cp = CP(1, b"[a-c]x")
        assert sorted(cp.classes[0]) == [97, 98, 99]
        assert sorted(cp.classes[1]) == [120]

    def test_negated_class(self):
        cp = CP(1, rb"[^\x00-\xfe]")
        assert sorted(cp.classes[0]) == [0xFF]

    def test_multi_member_class(self):
        cp = CP(1, b"[ace-g]")
        assert sorted(cp.classes[0]) == [97, 99, 101, 102, 103]

    def test_escaped_bracket_is_literal(self):
        cp = CP(1, rb"\[x\]")
        assert [sorted(c) for c in cp.classes] == [[91], [120], [93]]

    def test_escapes_inside_class(self):
        cp = CP(1, rb"[\x41\x43]")
        assert sorted(cp.classes[0]) == [0x41, 0x43]

    def test_dash_literal_positions(self):
        # '-' before ']' is a literal member
        cp = CP(1, b"[a-]")
        assert sorted(cp.classes[0]) == [ord("-"), ord("a")]

    def test_unterminated_class(self):
        with pytest.raises(ValueError, match="unterminated"):
            CP(1, b"[abc")


class TestDeterminization:
    def test_numbering_contract(self):
        pats = [CP(1, b"ab"), CP(2, b"[ax]b")]
        ct = build_class_trie(pats)
        # finals are 0..F-1, initial = F+1
        assert ct.final_state_num >= 1
        init = ct.initial_state
        assert (ct.table[init] >= 0).sum() == 2  # 'a' and 'x'

    def test_multi_output_final(self):
        # both patterns match "ab": one DFA final carries both ids
        pats = [CP(1, b"ab"), CP(2, b"[ab]b")]
        ct = build_class_trie(pats)
        multi = [ids for ids in ct.output_lists.values() if len(ids) > 1]
        assert multi == [[1, 2]]


def run_engines(pats, data, cfg, engines=("jnp", "turbo", "pallas")):
    compiled = compile_class_patterns(pats, cfg)
    want = match_oracle_charset(pats, data, cfg)
    for engine in engines:
        m = Matcher(compiled, cfg, engine=engine)
        got = [tuple(x) for x in m.match(data).tolist()]
        assert got == want, f"engine {engine}"


class TestEngineParity:
    def test_simple_classes(self):
        pats = [CP(1, b"[ab]c"), CP(2, b"bc"), CP(3, b"c")]
        cfg = PfacConfig(width=256, num_shards=1, interpret=True)
        run_engines(pats, b"acbc ccc abcbc", cfg)

    def test_ranges_over_text(self):
        pats = [CP(1, b"[a-z][a-z][0-9]"), CP(2, b"ab[0-9]"), CP(3, b"b7")]
        cfg = PfacConfig(width=512, num_shards=1, interpret=True)
        run_engines(pats, b"ab7 xy9 ab12 zb7b7", cfg)

    def test_negated_over_binary(self):
        pats = [CP(1, rb"[^\x00]\x00"), CP(2, rb"\x00\x00")]
        cfg = PfacConfig(width=256, num_shards=1, interpret=True)
        data = b"\x01\x00\x00\x00a\x00"
        run_engines(pats, data, cfg)

    def test_duplicate_class_patterns_both_reported(self):
        pats = [CP(1, b"xy"), CP(2, b"xy")]
        cfg = PfacConfig(width=256, num_shards=1, interpret=True)
        run_engines(pats, b"xyxy", cfg)

    def test_random_class_dictionary(self):
        rng = np.random.default_rng(31)
        pats = []
        for i in range(12):
            n = rng.integers(1, 5)
            spec = b""
            for _ in range(n):
                if rng.random() < 0.4:
                    lo = rng.integers(97, 110)
                    spec += b"[%c-%c]" % (lo, lo + rng.integers(1, 5))
                else:
                    spec += bytes([rng.integers(97, 115)])
            pats.append(CP(i + 1, spec))
        data = bytes(rng.integers(97, 115, 3000).astype(np.uint8))
        cfg = PfacConfig(width=512, num_shards=1, interpret=True)
        run_engines(pats, data, cfg)

    def test_shard_count_invariance(self):
        # class dictionaries shard like every other kind
        # (create_table_reorder.c:253-274); the canonical
        # (pos, length, id) merge order makes the output identical for
        # any shard count — including shards with multi-output finals
        # and more shards than patterns (empty shards)
        rng = np.random.default_rng(77)
        pats = [
            CP(1, b"[ab]c"), CP(2, b"bc"), CP(3, b"c"), CP(4, b"[a-c]b"),
            CP(5, b"ab"), CP(6, b"[bc][bc]"), CP(7, b"abc"),
        ]
        data = bytes(rng.integers(97, 100, 2000).astype(np.uint8))
        cfg1 = PfacConfig(width=512, num_shards=1, interpret=True)
        want = match_oracle_charset(pats, data, cfg1)
        for ns in (1, 2, 3, 4, 9):
            cfg = PfacConfig(width=512, num_shards=ns, interpret=True)
            compiled = compile_class_patterns(pats, cfg)
            assert compiled.charset and compiled.num_shards == ns
            for engine in ("turbo", "pallas"):
                m = Matcher(compiled, cfg, engine=engine)
                got = [tuple(x) for x in m.match(data).tolist()]
                assert got == want, f"shards={ns} engine={engine}"

    def test_sharded_save_load_round_trip(self, tmp_path):
        pats = [CP(1, b"[ab]c"), CP(2, b"bc"), CP(3, b"[a-c]b")]
        data = b"abcbcbabcb" * 30
        cfg = PfacConfig(width=512, num_shards=2, interpret=True)
        compiled = compile_class_patterns(pats, cfg)
        path = tmp_path / "cs.npz"
        compiled.save(path)
        from phfpfac_tpu.compile.tables import CompiledDictionary

        loaded = CompiledDictionary.load(path)
        assert loaded.charset
        assert loaded.shards[0].final_depths is not None
        want = match_oracle_charset(pats, data, cfg)
        got = [tuple(x) for x in
               Matcher(loaded, cfg, engine="turbo").match(data).tolist()]
        assert got == want
