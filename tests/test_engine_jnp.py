"""End-to-end parity: jnp engine + merge vs the CPU oracle."""

import numpy as np
import pytest

from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.parallel.matcher import Matcher
from phfpfac_tpu.parallel.merge import render_result_file
from phfpfac_tpu.utils.config import PfacConfig


def P(i, b):
    return Pattern(pattern_id=i, data=b)


def run_both(patterns, data, cfg, input_size=None):
    compiled = compile_patterns(patterns, cfg)
    matcher = Matcher(compiled, cfg)
    got = matcher.match(data, input_size=input_size)
    want = match_oracle(patterns, data, cfg, input_size=input_size)
    got_list = [tuple(x) for x in got.tolist()]
    assert got_list == want
    return got


EXPERIMENT_PATTERNS = [P(1, b"aaaa"), P(2, b"aa"), P(3, b"a"), P(4, b"aaa")]
EXPERIMENT_INPUT = b"aaaaaaaaaaaais a a a a a \n"


class TestJnpEngine:
    def test_experiment_corpus_4_shards(self):
        cfg = PfacConfig(width=256, num_shards=4, truncation="segment")
        # reference CLI quirk: input_size = filesize - 1
        run_both(
            EXPERIMENT_PATTERNS,
            EXPERIMENT_INPUT,
            cfg,
            input_size=len(EXPERIMENT_INPUT) - 1,
        )

    def test_experiment_corpus_1_shard(self):
        cfg = PfacConfig(width=256, num_shards=1)
        run_both(EXPERIMENT_PATTERNS, EXPERIMENT_INPUT, cfg)

    def test_expected_match_positions(self):
        # hand-checked: input "aaaa..." (12 a's) then "is a a a a a "
        cfg = PfacConfig(width=256, num_shards=1)
        compiled = compile_patterns(EXPERIMENT_PATTERNS, cfg)
        m = Matcher(compiled, cfg).match(b"aaaa")
        # pos 0: a, aa, aaa, aaaa; pos 1: a, aa, aaa; pos 2: a, aa; pos 3: a
        assert [tuple(x) for x in m.tolist()] == [
            (0, 3), (0, 2), (0, 4), (0, 1),
            (1, 3), (1, 2), (1, 4),
            (2, 3), (2, 2),
            (3, 3),
        ]

    def test_shard_count_invariance(self):
        # NOTE: invariance requires a duplicate-free dictionary — sorted
        # duplicates that straddle a shard boundary are reported by both
        # shards (inherent to the reference's overwrite-within-shard rule,
        # create_table_reorder.c:366), so dedupe here.
        rng = np.random.default_rng(42)
        words = list(
            dict.fromkeys(
                bytes(rng.integers(97, 100, rng.integers(1, 6)).astype(np.uint8))
                for _ in range(40)
            )
        )
        patterns = [P(i + 1, w) for i, w in enumerate(words)]
        data = bytes(rng.integers(97, 100, 2000).astype(np.uint8))
        results = []
        for shards in (1, 2, 4, 8):
            cfg = PfacConfig(width=256, num_shards=shards)
            compiled = compile_patterns(patterns, cfg)
            m = Matcher(compiled, cfg).match(data)
            results.append(render_result_file(m))
        # the xxxposition == allposition invariance, automated (SURVEY §4)
        assert all(rr == results[0] for rr in results[1:])

    def test_random_binary_patterns(self):
        rng = np.random.default_rng(7)
        patterns = [
            P(i + 1, bytes(rng.integers(0, 256, rng.integers(1, 9)).astype(np.uint8)))
            for i in range(25)
        ]
        # dedupe for clarity of oracle comparison (duplicates covered below)
        seen, uniq = set(), []
        for p in patterns:
            if p.data not in seen:
                seen.add(p.data)
                uniq.append(p)
        data = bytes(rng.integers(0, 256, 4096).astype(np.uint8))
        # embed some patterns to guarantee matches
        buf = bytearray(data)
        for j, p in enumerate(uniq[:10]):
            off = 37 * (j + 1)
            buf[off : off + len(p.data)] = p.data
        cfg = PfacConfig(width=512, num_shards=3)
        run_both(uniq, bytes(buf), cfg)

    def test_duplicate_patterns_last_wins(self):
        patterns = [P(1, b"dog"), P(2, b"dog"), P(3, b"do")]
        cfg = PfacConfig(width=256, num_shards=1)
        got = run_both(patterns, b"dogs and dogs", cfg)
        ids = {i for _, i in [tuple(x) for x in got.tolist()]}
        assert 2 in ids and 1 not in ids  # later duplicate owns the final state

    def test_segment_truncation_semantics(self):
        # pattern longer than the halo straddling a segment boundary is
        # dropped in "segment" mode, found in "none" mode.
        pat = bytes(b"x" * 600)
        patterns = [P(1, pat)]
        data = b"." * (4096 - 10) + pat + b"." * 50
        cfg_trunc = PfacConfig(
            width=4096, num_shards=1, truncation="segment",
            segment_bytes=4096, halo_bytes=512,
        )
        cfg_exact = PfacConfig(width=4096, num_shards=1, truncation="none")
        got_t = run_both(patterns, data, cfg_trunc)
        got_e = run_both(patterns, data, cfg_exact)
        assert len(got_t) == 0  # needs 590 bytes past boundary > 512 halo
        assert [tuple(x) for x in got_e.tolist()] == [(4086, 1)]

    def test_match_at_input_tail(self):
        patterns = [P(1, b"end")]
        cfg = PfacConfig(width=256, num_shards=1)
        run_both(patterns, b"the very end", cfg)

    def test_empty_input_region(self):
        patterns = [P(1, b"zz")]
        cfg = PfacConfig(width=256, num_shards=1)
        got = run_both(patterns, b"zzz", cfg, input_size=1)
        assert len(got) == 0

    def test_full_parity_slot_layout(self):
        # match_slots=0 -> max_pat_len slots (reference layout)
        cfg = PfacConfig(width=256, num_shards=1, match_slots=0)
        run_both(EXPERIMENT_PATTERNS, EXPERIMENT_INPUT, cfg)

    def test_patterns_spanning_position_pad(self):
        # input not a multiple of the padding granularity
        patterns = [P(1, b"tail")]
        data = b"x" * 1500 + b"tail"
        cfg = PfacConfig(width=256, num_shards=1)
        got = run_both(patterns, data, cfg)
        assert [tuple(x) for x in got.tolist()] == [(1500, 1)]


class TestOutputFormat:
    def test_render_format(self):
        m = np.array([[5, 1154], [1490, 3]], dtype=np.int64)
        txt = render_result_file(m)
        assert txt == (
            "At position    5, match pattern 1154\n"
            "At position 1490, match pattern 3\n"
        )

    def test_wide_position_formatting(self):
        m = np.array([[123456, 7]], dtype=np.int64)
        assert render_result_file(m) == "At position 123456, match pattern 7\n"
