"""Depth-stratified kernel (ops.pallas_depth / compile.depth) parity.

Verifies the fast path's exact-match semantics against the CPU oracle
and the generic banked-LUT kernel, on the reference corpora and on
adversarial binary inputs (interpret mode; the real-TPU numbers come
from bench.py)."""

import numpy as np
import pytest

from phfpfac_tpu.compile.depth import (
    DISP_MISS,
    DepthUnsupported,
    build_depth_tables,
)
from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.ops.common import pad_input, padded_steps
from phfpfac_tpu.ops.pallas_depth import DepthShardScanner
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.utils.config import PfacConfig


def _mk(words, width=256):
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    cfg = PfacConfig(width=width, num_shards=1)
    return pats, cfg, compile_patterns(pats, cfg)


def _scan(compiled, cfg, data, input_size=None):
    sh = compiled.shards[0]
    ms = padded_steps(compiled.max_pat_len)
    n = len(data) if input_size is None else input_size
    padded = pad_input(data, 1024, ms)
    ds = DepthShardScanner(sh, interpret=True)
    cnt, bits = ds.scan(padded, n, cfg, ms)
    return np.asarray(cnt), np.asarray(bits), ms


class TestDepthTables:
    def test_experiment_corpus_counts(self, reference_dir):
        words = (reference_dir / "experimentpattern").read_bytes().split()
        data = (reference_dir / "experimentinput").read_bytes()
        pats, cfg, compiled = _mk(words)
        cnt, bits, _ = _scan(compiled, cfg, data)
        want = match_oracle(pats, data, cfg)
        assert cnt[: len(data)].sum() == len(want)

    def test_chained_displacements_die_at_leaves(self):
        pats, cfg, compiled = _mk([b"ab"])
        dt = build_depth_tables(compiled.shards[0])
        assert dt.n_steps == 2
        # the single T_1 entry: leaf -> DISP_MISS, final, char 'b'
        live = dt.packed_banks.ravel()
        entry = live[live >= 0]
        assert len(entry) == 1
        assert entry[0] & 255 == ord("b")
        assert (entry[0] >> 8) & 1 == 1
        assert entry[0] >> 9 == DISP_MISS

    def test_charset_dfa_levels_as_dag(self):
        # charset DFAs are DAGs: states recur at several depths and
        # are listed per level (multi-output finals expand at merge)
        from phfpfac_tpu.compile.tables import compile_class_patterns
        from phfpfac_tpu.frontend.charset import parse_class_pattern
        from phfpfac_tpu.ops.bitmap import decode_bitmap
        from phfpfac_tpu.oracle.ac import match_oracle_charset
        from phfpfac_tpu.parallel.merge import merge_flat_matches

        lines = [b"a[bc]d", b"abd", b"[xy]z", b"ab", b"q"]
        cps = [parse_class_pattern(ln, i + 1) for i, ln in enumerate(lines)]
        cfg = PfacConfig(width=256, num_shards=1, truncation="none",
                         interpret=True)
        compiled = compile_class_patterns(cps, cfg)
        sh = compiled.shards[0]
        rng = np.random.default_rng(5)
        alpha = np.frombuffer(b"abcdxyzq ", dtype=np.uint8)
        data = bytes(alpha[rng.integers(0, len(alpha), 4096)])
        ms = padded_steps(compiled.max_pat_len)
        padded = pad_input(data, 1024, ms)
        _cnt, bits = DepthShardScanner(sh, interpret=True).scan(
            padded, len(data), cfg, ms
        )
        flat = decode_bitmap(np.asarray(bits), data, len(data), sh, ms)
        got = [
            tuple(x)
            for x in merge_flat_matches(compiled, [flat], len(data)).tolist()
        ]
        assert got == match_oracle_charset(cps, data, cfg)


class TestDepthKernelParity:
    def test_english_text(self, reference_dir):
        words = (reference_dir / "xaa").read_bytes().split()[:600]
        data = (reference_dir / "1M").read_bytes()[:32768]
        pats, cfg, compiled = _mk(words, width=1024)
        cnt, bits, ms = _scan(compiled, cfg, data)
        want = match_oracle(pats, data, cfg)
        n = len(data)
        assert cnt[:n].sum() == len(want)
        # per-position counts against the oracle
        oc = np.zeros(n, dtype=np.int64)
        for p, _ in want:
            oc[p] += 1
        assert (cnt[:n] == oc).all()

    def test_binary_sentinel_bytes(self):
        # bytes 0x00 and 0xFF exercise the g>=0 guard in the char
        # verify (-1 & 255 == 255 would otherwise false-hit)
        rng = np.random.default_rng(7)
        words = [
            bytes(rng.integers(0, 256, int(rng.integers(1, 10))).astype(np.uint8))
            for _ in range(150)
        ] + [b"\x00", b"\xff", b"\xff\xff", b"\x00\xff"]
        data = bytes(rng.integers(0, 256, 16384).astype(np.uint8))
        pats, cfg, compiled = _mk(words)
        cnt, bits, _ = _scan(compiled, cfg, data)
        want = match_oracle(pats, data, cfg)
        assert cnt[: len(data)].sum() == len(want)

    def test_segment_truncation(self, reference_dir):
        words = (reference_dir / "xab").read_bytes().split()[:400]
        data = (reference_dir / "1M").read_bytes()[:12288]
        pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
        cfg = PfacConfig(width=1024, num_shards=1, truncation="segment")
        compiled = compile_patterns(pats, cfg)
        cnt, _, _ = _scan(compiled, cfg, data)
        want = match_oracle(pats, data, cfg)
        assert cnt[: len(data)].sum() == len(want)

    def test_bitmap_matches_banked_kernel(self, reference_dir):
        from phfpfac_tpu.ops.pallas_scan import PallasShardScanner

        words = (reference_dir / "xac").read_bytes().split()[:300]
        data = (reference_dir / "1M").read_bytes()[:8192]
        pats, cfg, compiled = _mk(words, width=1024)
        sh = compiled.shards[0]
        ms = padded_steps(compiled.max_pat_len)
        padded = pad_input(data, 1024, ms)
        n = len(data)
        cnt_d, bits_d = DepthShardScanner(sh, interpret=True).scan(
            padded, n, cfg, ms
        )
        cnt_p, bits_p = PallasShardScanner(sh, interpret=True).scan(
            padded, n, cfg, ms
        )
        assert (np.asarray(cnt_d)[:n] == np.asarray(cnt_p)[:n]).all()
        assert (np.asarray(bits_d)[:n] == np.asarray(bits_p)[:n]).all()


class TestDepthMatcherIntegration:
    def test_matcher_pallas_engine_uses_depth(self, reference_dir):
        from phfpfac_tpu.parallel.matcher import Matcher

        words = (reference_dir / "experimentpattern").read_bytes().split()
        data = (reference_dir / "experimentinput").read_bytes()
        pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
        cfg = PfacConfig(width=256, num_shards=2, interpret=True)
        compiled = compile_patterns(pats, cfg)
        m = Matcher(compiled, cfg, engine="pallas")
        got = [tuple(x) for x in m.match(data).tolist()]
        kind, _ = m._get_pallas_scanner()
        assert kind == "depth"
        want = match_oracle(pats, data, cfg)
        assert got == want
