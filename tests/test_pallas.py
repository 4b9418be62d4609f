"""Pallas banked-LUT kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest

from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.parallel.matcher import Matcher
from phfpfac_tpu.utils.config import PfacConfig


def P(i, b):
    return Pattern(pattern_id=i, data=b)


def check(patterns, data, cfg, input_size=None):
    compiled = compile_patterns(patterns, cfg)
    m = Matcher(compiled, cfg, engine="pallas")
    got = [tuple(x) for x in m.match(data, input_size=input_size).tolist()]
    want = match_oracle(patterns, data, cfg, input_size=input_size)
    assert got == want


EXPERIMENT = [P(1, b"aaaa"), P(2, b"aa"), P(3, b"a"), P(4, b"aaa")]


class TestPallasKernel:
    def test_experiment_corpus(self):
        cfg = PfacConfig(
            width=256, num_shards=4, truncation="segment", interpret=True
        )
        check(EXPERIMENT, b"aaaaaaaaaaaais a a a a a \n", cfg, input_size=25)

    def test_english_words(self):
        words = [b"the", b"then", b"there", b"he", b"her", b"cat", b"a", b"an", b"and"]
        pats = [P(i + 1, w) for i, w in enumerate(words)]
        data = b"then there was a cat and he told her the story " * 8
        cfg = PfacConfig(width=256, num_shards=2, interpret=True)
        check(pats, data, cfg)

    def test_binary_patterns(self):
        rng = np.random.default_rng(17)
        raw = list(
            dict.fromkeys(
                bytes(rng.integers(0, 256, rng.integers(1, 10)).astype(np.uint8))
                for _ in range(20)
            )
        )
        pats = [P(i + 1, b) for i, b in enumerate(raw)]
        buf = bytearray(rng.integers(0, 256, 4096).astype(np.uint8).tobytes())
        for j, p in enumerate(pats[:8]):
            off = 401 * (j + 1)
            buf[off : off + len(p.data)] = p.data
        cfg = PfacConfig(width=512, num_shards=1, interpret=True)
        check(pats, bytes(buf), cfg)

    def test_segment_truncation(self):
        # needs a <=32-byte pattern straddling a segment boundary with a
        # tiny halo to show truncation in the pallas path
        pat = b"q" * 20
        pats = [P(1, pat)]
        data = b"." * (4096 - 10) + pat + b"." * 30
        cfg = PfacConfig(
            width=256, num_shards=1, truncation="segment",
            segment_bytes=4096, halo_bytes=4, interpret=True,
        )
        check(pats, data, cfg)  # truncated -> no match; oracle agrees
        cfg2 = PfacConfig(width=256, num_shards=1, truncation="none", interpret=True)
        check(pats, data, cfg2)

    def test_long_patterns_rejected(self):
        pats = [P(1, b"x" * 40)]
        cfg = PfacConfig(width=256, num_shards=1, interpret=True)
        compiled = compile_patterns(pats, cfg)
        m = Matcher(compiled, cfg, engine="pallas")
        with pytest.raises(ValueError, match="bitmap path supports"):
            m.match(b"x" * 100)

    def test_matches_turbo_engine(self):
        rng = np.random.default_rng(23)
        words = list(
            dict.fromkeys(
                bytes(rng.integers(97, 102, rng.integers(1, 6)).astype(np.uint8))
                for _ in range(30)
            )
        )
        pats = [P(i + 1, w) for i, w in enumerate(words)]
        data = bytes(rng.integers(97, 102, 3000).astype(np.uint8))
        cfg = PfacConfig(width=256, num_shards=3, interpret=True)
        compiled = compile_patterns(pats, cfg)
        got_p = Matcher(compiled, cfg, engine="pallas").match(data)
        got_t = Matcher(compiled, cfg, engine="turbo").match(data)
        np.testing.assert_array_equal(got_p, got_t)
