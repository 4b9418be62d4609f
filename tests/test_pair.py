"""Stride-2 pair kernel (ops.pallas_pair / compile.pair) parity."""

import numpy as np
import pytest

from phfpfac_tpu.compile.pair import (
    MAX_SIGMA,
    PairUnsupported,
    build_pair_tables,
)
from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.ops.common import pad_input, padded_steps
from phfpfac_tpu.ops.pallas_depth import DepthShardScanner
from phfpfac_tpu.ops.pallas_pair import PairShardScanner
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.utils.config import PfacConfig


def _mk(words, width=256):
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    cfg = PfacConfig(width=width, num_shards=1, truncation="none")
    return pats, cfg, compile_patterns(pats, cfg)


def _both(compiled, cfg, data):
    sh = compiled.shards[0]
    ms = padded_steps(compiled.max_pat_len)
    n = len(data)
    padded = pad_input(data, 1024, ms)
    cnt_p, bits_p = map(
        np.asarray, PairShardScanner(sh, interpret=True).scan(padded, n, cfg, ms)
    )
    cnt_d, bits_d = map(
        np.asarray, DepthShardScanner(sh, interpret=True).scan(padded, n, cfg, ms)
    )
    return cnt_p[:n], bits_p[:n], cnt_d[:n], bits_d[:n]


class TestPairParity:
    def test_experiment_corpus(self, reference_dir):
        words = (reference_dir / "experimentpattern").read_bytes().split()
        data = (reference_dir / "experimentinput").read_bytes()
        pats, cfg, compiled = _mk(words)
        cnt_p, bits_p, cnt_d, bits_d = _both(compiled, cfg, data)
        assert (cnt_p == cnt_d).all() and (bits_p == bits_d).all()
        assert cnt_p.sum() == len(match_oracle(pats, data, cfg))

    def test_odd_even_lengths_and_leaves(self):
        # odd-length final leaves exercise the odd-completion side table
        words = [b"a", b"ab", b"abc", b"abcd", b"abcde", b"bcd", b"cde",
                 b"x", b"xy", b"xyz"]
        data = b"abcdexyzbcdea" * 300 + b"abc"
        pats, cfg, compiled = _mk(words)
        cnt_p, bits_p, cnt_d, bits_d = _both(compiled, cfg, data)
        assert (cnt_p == cnt_d).all() and (bits_p == bits_d).all()
        assert cnt_p.sum() == len(match_oracle(pats, data, cfg))

    def test_english_text(self, reference_dir):
        words = (reference_dir / "xab").read_bytes().split()[:700]
        data = (reference_dir / "1M").read_bytes()[:32768]
        pats, cfg, compiled = _mk(words, width=1024)
        cnt_p, bits_p, cnt_d, bits_d = _both(compiled, cfg, data)
        assert (cnt_p == cnt_d).all() and (bits_p == bits_d).all()
        assert cnt_p.sum() == len(match_oracle(pats, data, cfg))

    def test_big_alphabet_falls_back(self):
        rng = np.random.default_rng(1)
        words = [
            bytes(rng.integers(0, 256, 6).astype(np.uint8)) for _ in range(80)
        ]
        pats, cfg, compiled = _mk(words)
        sh = compiled.shards[0]
        # >MAX_SIGMA distinct bytes across the dictionary
        distinct = len({c for w in dict.fromkeys(words) for c in w})
        if distinct > MAX_SIGMA:
            with pytest.raises(PairUnsupported):
                build_pair_tables(sh)

    def test_last_byte_matches(self):
        # depth-1 and depth-2 matches at the very end of the input
        # (the second byte of the final pair is the pad/miss code)
        words = [b"z", b"yz", b"xyz"]
        data = b"aaaxyz"
        pats, cfg, compiled = _mk(words)
        cnt_p, bits_p, cnt_d, bits_d = _both(compiled, cfg, data)
        assert (cnt_p == cnt_d).all() and (bits_p == bits_d).all()
        assert cnt_p.sum() == len(match_oracle(pats, data, cfg))

    def test_matcher_routes_to_stride2(self, reference_dir):
        from phfpfac_tpu.parallel.matcher import Matcher
        from phfpfac_tpu.ops.pallas_plan import PlanShardScanner as PSS

        words = (reference_dir / "experimentpattern").read_bytes().split()
        data = (reference_dir / "experimentinput").read_bytes()
        pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
        cfg = PfacConfig(
            width=256, num_shards=2, interpret=True, truncation="none"
        )
        compiled = compile_patterns(pats, cfg)
        m = Matcher(compiled, cfg, engine="pallas")
        got = [tuple(x) for x in m.match(data).tolist()]
        kind, scanners = m._get_pallas_scanner()
        # the plan engine (stride-2 capable) now takes precedence
        assert kind == "depth" and isinstance(scanners[0], PSS)
        assert got == match_oracle(pats, data, cfg)
