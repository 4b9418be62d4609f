"""Turbo-engine parity vs oracle and vs the dense jnp engine."""

import numpy as np
import pytest

from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.parallel.matcher import Matcher
from phfpfac_tpu.utils.config import PfacConfig


def P(i, b):
    return Pattern(pattern_id=i, data=b)


def check(patterns, data, cfg, input_size=None, **kw):
    compiled = compile_patterns(patterns, cfg)
    m = Matcher(compiled, cfg, engine="turbo", **kw)
    got = [tuple(x) for x in m.match(data, input_size=input_size).tolist()]
    want = match_oracle(patterns, data, cfg, input_size=input_size)
    assert got == want
    return m, compiled


EXPERIMENT = [P(1, b"aaaa"), P(2, b"aa"), P(3, b"a"), P(4, b"aaa")]


class TestTurbo:
    def test_experiment_corpus(self):
        cfg = PfacConfig(width=256, num_shards=4, truncation="segment")
        check(EXPERIMENT, b"aaaaaaaaaaaais a a a a a \n", cfg, input_size=25)

    def test_full_and_tail_phases(self):
        # patterns long enough to exercise the compacted tail loop
        pats = [P(1, b"abcdefgh"), P(2, b"abc"), P(3, b"a"), P(4, b"abcdefghijkl")]
        data = b"xx abcdefghijklmnop abcdefgh abc a " * 3
        cfg = PfacConfig(width=256, num_shards=2)
        check(pats, data, cfg)

    def test_overflow_falls_back_to_dense(self):
        # every position survives deep: 'aaaa...' walks on all-'a' input;
        # cap_frac=64 makes the compaction overflow immediately.
        pats = [P(1, b"a" * 20)]
        data = b"a" * 3000
        cfg = PfacConfig(width=256, num_shards=1)
        m, _ = check(pats, data, cfg, turbo_cap_frac=64)

    def test_counts_mode(self):
        pats = EXPERIMENT
        data = b"aaaa bb aa"
        cfg = PfacConfig(width=256, num_shards=1)
        compiled = compile_patterns(pats, cfg)
        m = Matcher(compiled, cfg, engine="turbo")
        cnt = m.count_matches(data)
        want = match_oracle(pats, data, cfg)
        ref = np.zeros(len(data), dtype=np.int64)
        for p, _ in want:
            ref[p] += 1
        np.testing.assert_array_equal(cnt, ref)

    def test_counts_mode_overflow_fallback(self):
        pats = [P(1, b"a" * 20)]
        data = b"a" * 3000
        cfg = PfacConfig(width=256, num_shards=1)
        compiled = compile_patterns(pats, cfg)
        m = Matcher(compiled, cfg, engine="turbo", turbo_cap_frac=64)
        cnt = m.count_matches(data)
        want = match_oracle(pats, data, cfg)
        ref = np.zeros(len(data), dtype=np.int64)
        for p, _ in want:
            ref[p] += 1
        np.testing.assert_array_equal(cnt, ref)

    def test_segment_truncation(self):
        pat = b"y" * 600
        pats = [P(1, pat)]
        data = b"." * (4096 - 10) + pat + b"." * 50
        cfg = PfacConfig(width=4096, num_shards=1, truncation="segment")
        m, _ = check(pats, data, cfg)
        cfg2 = PfacConfig(width=4096, num_shards=1, truncation="none")
        check(pats, data, cfg2)

    def test_binary_patterns_with_high_bytes(self):
        rng = np.random.default_rng(3)
        pats_raw = list(
            dict.fromkeys(
                bytes(rng.integers(0, 256, rng.integers(1, 12)).astype(np.uint8))
                for _ in range(30)
            )
        )
        pats = [P(i + 1, b) for i, b in enumerate(pats_raw)]
        buf = bytearray(rng.integers(0, 256, 8192).astype(np.uint8).tobytes())
        for j, p in enumerate(pats[:12]):
            off = 611 * (j + 1)
            buf[off : off + len(p.data)] = p.data
        cfg = PfacConfig(width=1024, num_shards=3)
        check(pats, bytes(buf), cfg)

    def test_matches_equal_dense_engine(self):
        rng = np.random.default_rng(11)
        words = list(
            dict.fromkeys(
                bytes(rng.integers(97, 103, rng.integers(1, 7)).astype(np.uint8))
                for _ in range(60)
            )
        )
        pats = [P(i + 1, w) for i, w in enumerate(words)]
        data = bytes(rng.integers(97, 103, 5000).astype(np.uint8))
        cfg = PfacConfig(width=512, num_shards=4)
        compiled = compile_patterns(pats, cfg)
        t = Matcher(compiled, cfg, engine="turbo").match(data)
        d = Matcher(compiled, cfg, engine="jnp").match(data)
        np.testing.assert_array_equal(t, d)

    def test_packed_bit_budget_fallback(self):
        # force the split-table path by checking is_packed flag logic
        from phfpfac_tpu.ops.turbo_jnp import build_turbo_tables

        pats = [P(i + 1, bytes([65 + i % 26, 65 + (i // 26) % 26])) for i in range(100)]
        cfg = PfacConfig(width=64, num_shards=1)
        compiled = compile_patterns(pats, cfg)
        tt = build_turbo_tables(compiled.shards[0])
        # small width -> many rows -> row_bits large but still packs here;
        # just assert the probe tables are self-consistent either way
        assert (tt.is_packed and tt.packed is not None) or (
            tt.ht is not None and tt.val is not None
        )
        check(pats, b"AB BA CA ZZ AA", cfg)
