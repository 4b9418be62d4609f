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

    def test_long_patterns_fall_back_exactly(self):
        # patterns beyond the 32-step bitmap can't use the pallas
        # kernels; the matcher must degrade to the portable engine
        # with exact results rather than raising
        pats = [P(1, b"x" * 40), P(2, b"xx")]
        cfg = PfacConfig(
            width=256, num_shards=1, truncation="none", interpret=True
        )
        compiled = compile_patterns(pats, cfg)
        m = Matcher(compiled, cfg, engine="pallas")
        got = [tuple(x) for x in m.match(b"y" + b"x" * 100).tolist()]
        from phfpfac_tpu.oracle.ac import match_oracle

        assert got == match_oracle(pats, b"y" + b"x" * 100, cfg)

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


def test_count_scanner_falls_back_for_long_patterns():
    from phfpfac_tpu.ops.engine_select import best_count_scanner

    pats = [P(1, b"z" * 200), P(2, b"zz")]
    cfg = PfacConfig(width=256, num_shards=1, truncation="none",
                     interpret=True)
    compiled = compile_patterns(pats, cfg)
    from phfpfac_tpu.ops.common import padded_steps

    scan = best_count_scanner(compiled.shards[0], padded_steps(200))
    # must be the XLA fallback (a plain function), and must count
    from phfpfac_tpu.ops.common import pad_input
    import jax.numpy as jnp

    data = b"zz" * 300
    padded = pad_input(data, 1024, padded_steps(200))
    total = int(np.asarray(scan(jnp.asarray(padded), jnp.int32(len(data)),
                                jnp.int32(0))))
    from phfpfac_tpu.oracle.ac import match_oracle

    assert total == len(match_oracle(pats, data, cfg))


def test_match_rows_pallas_engine():
    pats = [P(1, b"ab"), P(2, b"abc")]
    cfg = PfacConfig(width=256, num_shards=1, truncation="none",
                     interpret=True, match_slots=4)
    compiled = compile_patterns(pats, cfg)
    m = Matcher(compiled, cfg, engine="pallas")
    rows = m.match_rows(b"xabcx")
    assert len(rows) == 1
    row = rows[0][1]  # position 1: matches of length 2 and 3
    assert (row >= 0).sum() == 2
