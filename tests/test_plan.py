"""Cost-planned hybrid-stride kernel (ops.pallas_plan) parity."""

import numpy as np
import pytest

from phfpfac_tpu.compile.plan import build_plan_tables
from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.ops.common import pad_input, padded_steps
from phfpfac_tpu.ops.pallas_depth import DepthShardScanner
from phfpfac_tpu.ops.pallas_plan import PlanShardScanner
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.utils.config import PfacConfig


def _check(words, data, width=256):
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    cfg = PfacConfig(width=width, num_shards=1, truncation="none")
    compiled = compile_patterns(pats, cfg)
    sh = compiled.shards[0]
    ms = padded_steps(compiled.max_pat_len)
    n = len(data)
    padded = pad_input(data, 1024, ms)
    cnt_p, bits_p = map(
        np.asarray, PlanShardScanner(sh, interpret=True).scan(padded, n, cfg, ms)
    )
    cnt_d, bits_d = map(
        np.asarray, DepthShardScanner(sh, interpret=True).scan(padded, n, cfg, ms)
    )
    assert (cnt_p[:n] == cnt_d[:n]).all()
    assert (bits_p[:n] == bits_d[:n]).all()
    assert cnt_p[:n].sum() == len(match_oracle(pats, data, cfg))
    return sh


def test_experiment_corpus(reference_dir):
    words = (reference_dir / "experimentpattern").read_bytes().split()
    _check(words, (reference_dir / "experimentinput").read_bytes())


def test_english_mixed_plan(reference_dir):
    words = (reference_dir / "xab").read_bytes().split()[:700]
    data = (reference_dir / "1M").read_bytes()[:32768]
    sh = _check(words, data, width=1024)
    pt = build_plan_tables(sh)
    kinds = {s.kind for s in pt.steps}
    assert kinds <= {"mono", "pair"} and len(pt.steps) >= 3


def test_random_alpha():
    rng = np.random.default_rng(11)
    alpha = np.frombuffer(b"abcdefghij. -'", dtype=np.uint8)
    words = [
        bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 9)))])
        for _ in range(250)
    ]
    data = bytes(alpha[rng.integers(0, len(alpha), 16384)])
    _check(words, data)


def test_wide_alphabet_s0_prologue():
    # sigma in (63, 127]: the dense P0 gives way to the 1-bank
    # code-indexed s0 prologue; parity must hold end to end
    rng = np.random.default_rng(17)
    alpha = np.arange(70, dtype=np.uint8) + 40
    words = [
        bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 10)))])
        for _ in range(150)
    ]
    data = bytes(alpha[rng.integers(0, len(alpha), 8192)])
    sh = _check(words, data)
    pt = build_plan_tables(sh)
    assert pt.p0_mode == "s0" and pt.code_bits == 7


class TestLongTailSplit:
    """Shards with >32-byte patterns split at the bitmap depth: the
    bulk rides the fast kernels, only the long tail pays the exact XLA
    engine (parallel.matcher._split_long_shard)."""

    def test_mixed_lengths_match_oracle(self):
        from phfpfac_tpu.parallel.matcher import Matcher

        rng = np.random.default_rng(5)
        alpha = np.frombuffer(b"abcdef ", dtype=np.uint8)
        short = [
            bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 7)))])
            for _ in range(60)
        ]
        long = [
            bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(33, 48)))])
            for _ in range(4)
        ]
        words = list(dict.fromkeys(short + long))
        pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
        cfg = PfacConfig(width=256, num_shards=1, interpret=True,
                         truncation="none")
        compiled = compile_patterns(pats, cfg)
        # corpus: random text with long patterns embedded (overlapping
        # short matches inside them)
        text = bytearray(alpha[rng.integers(0, len(alpha), 8192)])
        for j, w in enumerate(long):
            o = 512 * (j + 1)
            text[o:o + len(w)] = w
        data = bytes(text)
        m = Matcher(compiled, cfg, engine="pallas")
        got = [tuple(x) for x in m.match(data).tolist()]
        kind, scanner = m._get_pallas_scanner()
        assert kind == "depth"
        assert isinstance(scanner[0], tuple) and scanner[0][0] == "split"
        assert got == match_oracle(pats, data, cfg)

    def test_all_long_falls_back(self):
        from phfpfac_tpu.parallel.matcher import Matcher

        words = [b"x" * 40, b"y" * 50]
        pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
        cfg = PfacConfig(width=256, num_shards=1, interpret=True,
                         truncation="none")
        compiled = compile_patterns(pats, cfg)
        data = b"x" * 45 + b"z" + b"y" * 55
        m = Matcher(compiled, cfg, engine="pallas")
        got = [tuple(x) for x in m.match(data).tolist()]
        assert got == match_oracle(pats, data, cfg)


def test_bounded_scan_modes_parity():
    """Both bounded-bank-scan strategies ("loop" fori with a dynamic
    bound, "geo" geometric groups behind scalar preds) must produce
    identical counts/bitmaps to the unbounded untrained scan."""
    import os

    from phfpfac_tpu.ops.pallas_plan import PlanShardScanner

    rng = np.random.default_rng(17)
    alpha = np.frombuffer(b"abcde .", dtype=np.uint8)
    words = list(dict.fromkeys(
        bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 8)))])
        for _ in range(120)))
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=256, num_shards=1, truncation="none")
    compiled = compile_patterns(pats, cfg)
    sh = compiled.shards[0]
    data = bytes(alpha[rng.integers(0, len(alpha), 8192)])
    ms = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, ms)
    n = len(data)
    c1, b1 = map(np.asarray,
                 PlanShardScanner(sh, interpret=True).scan(padded, n, cfg, ms))
    results = {}
    # GROUP_MIN_NB would keep these small tables unbounded; force the
    # bounded path by monkeypatching the threshold
    import phfpfac_tpu.ops.pallas_plan as pp

    orig, orig_u = pp._GROUP_MIN_NB, pp._UNROLL_GROUPS
    try:
        pp._GROUP_MIN_NB = 1
        # _UNROLL_GROUPS=1 forces the capped mode's cold dynamic-bank
        # fori_loop to exist (and fire) even on these small tables
        pp._UNROLL_GROUPS = 1
        for mode in ("loop", "geo", "capped"):
            os.environ["PHFPFAC_GMODE"] = mode
            sc = PlanShardScanner(sh, interpret=True, train=data)
            assert sc.pt.trained
            results[mode] = map(np.asarray, sc.scan(padded, n, cfg, ms))
        # cold-spill variant: train on a skewed head so scanned data
        # probes banks past the trained hot span (the loop tail must
        # cover them exactly)
        os.environ["PHFPFAC_GMODE"] = "capped"
        sc = PlanShardScanner(sh, interpret=True, train=data[:512])
        assert sc.pt.trained
        results["capped-spill"] = map(np.asarray, sc.scan(padded, n, cfg, ms))
    finally:
        pp._GROUP_MIN_NB = orig
        pp._UNROLL_GROUPS = orig_u
        os.environ.pop("PHFPFAC_GMODE", None)
    for mode, (c2, b2) in results.items():
        np.testing.assert_array_equal(c1[:n], c2[:n], err_msg=mode)
        np.testing.assert_array_equal(b1[:n], b2[:n], err_msg=mode)
    assert c1[:n].sum() == len(match_oracle(pats, data, cfg))


def test_wide_alphabet_sentinel_overflow_goes_mono():
    """A wide-alphabet dictionary whose pair tables would overflow the
    narrow pair-width value field must still plan (mono steps for the
    overflowing depths) rather than raise — the DP runs under both
    field-width scenarios."""
    rng = np.random.default_rng(2)
    alpha = np.arange(32, 112, dtype=np.uint8)  # sigma ~80 -> cb=7
    words = list(dict.fromkeys(
        bytes(alpha[rng.integers(0, len(alpha), 3)]) for _ in range(30000)
    ))
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=4096, num_shards=1, truncation="none")
    compiled = compile_patterns(pats, cfg)
    pt = build_plan_tables(compiled.shards[0])
    # dead-zone contract: dead displacement is 0 and every stored
    # displacement (bank extent incl. the zone) fits the value field
    assert pt.p0_miss == 0
    max_vshift = max(
        (2 * 7 + 1) if s.kind == "pair" else (7 + 1) for s in pt.steps
    )
    field_cap = (1 << (31 - max_vshift)) - 1
    for s in pt.steps:
        assert s.miss == 0
        assert (s.k0 + s.nb) * 128 <= field_cap + 1
    # correctness spot check vs the oracle on a small corpus
    data = bytes(alpha[rng.integers(0, len(alpha), 4096)])
    from phfpfac_tpu.ops.pallas_plan import PlanShardScanner
    ms = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, ms)
    cnt, _bits = map(np.asarray, PlanShardScanner(
        compiled.shards[0], interpret=True).scan(padded, len(data), cfg, ms))
    assert cnt[:len(data)].sum() == len(match_oracle(pats, data, cfg))


def test_profile_guided_grouped_scan_parity(monkeypatch):
    """Profile-guided (trained) tables + grouped bank scan must match
    the untrained scan and the oracle — including when the profile
    corpus is UNRELATED to the scanned corpus (the layout only moves
    hot classes; the grouped early exit is gated on live walkers'
    actual probe banks)."""
    import phfpfac_tpu.ops.pallas_plan as pp

    monkeypatch.setattr(pp, "_GROUP_MIN_NB", 2)  # group tiny tables too
    rng = np.random.default_rng(8)
    alpha = np.frombuffer(b"abcdefghij .", dtype=np.uint8)
    words = list(dict.fromkeys(
        bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 10)))])
        for _ in range(300)))
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=256, num_shards=1, truncation="none")
    compiled = compile_patterns(pats, cfg)
    sh = compiled.shards[0]
    train = bytes(alpha[rng.integers(0, len(alpha), 30000)])
    data = bytes(alpha[rng.integers(0, len(alpha), 16000)]) + train[:2000]
    ms = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, ms)
    n = len(data)
    su = pp.PlanShardScanner(sh, interpret=True)
    st = pp.PlanShardScanner(sh, interpret=True, train=train)
    assert st.pt.trained and not su.pt.trained
    assert any(s.nb >= pp._GROUP_MIN_NB for s in st.pt.steps)
    c1, b1 = map(np.asarray, su.scan(padded, n, cfg, ms))
    c2, b2 = map(np.asarray, st.scan(padded, n, cfg, ms))
    np.testing.assert_array_equal(c1[:n], c2[:n])
    np.testing.assert_array_equal(b1[:n], b2[:n])
    assert c1[:n].sum() == len(match_oracle(pats, data, cfg))


def test_matcher_auto_trains_on_first_input():
    """The pallas Matcher profiles the head of the first scanned input
    (PGO by default); results must stay oracle-exact."""
    from phfpfac_tpu.parallel.matcher import Matcher

    rng = np.random.default_rng(9)
    alpha = np.frombuffer(b"abcde ", dtype=np.uint8)
    words = list(dict.fromkeys(
        bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 7)))])
        for _ in range(80)))
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=256, num_shards=2, interpret=True,
                     truncation="none")
    compiled = compile_patterns(pats, cfg)
    m = Matcher(compiled, cfg, engine="pallas")
    data1 = bytes(alpha[rng.integers(0, len(alpha), 5000)])
    data2 = bytes(alpha[rng.integers(0, len(alpha), 5000)])
    got1 = [tuple(x) for x in m.match(data1).tolist()]
    assert m._train is not None  # profiled on data1's head
    got2 = [tuple(x) for x in m.match(data2).tolist()]
    assert got1 == match_oracle(pats, data1, cfg)
    assert got2 == match_oracle(pats, data2, cfg)


@pytest.mark.parametrize("seed", range(6))
def test_plan_segment_truncation_fuzz(seed):
    from phfpfac_tpu.parallel.matcher import Matcher

    """Segment-truncation mode ON the plan kernel (the parity-CLI
    default now rides it): small segments + halos force real cuts;
    results must equal the oracle's truncated-walk semantics."""
    rng = np.random.default_rng(100 + seed)
    alpha = np.frombuffer(b"abcdef .", dtype=np.uint8)
    words = list(dict.fromkeys(
        bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 14)))])
        for _ in range(150)
    ))
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(
        width=256, num_shards=1 + seed % 2, truncation="segment",
        segment_bytes=512, halo_bytes=int(rng.choice([0, 8, 64])),
        interpret=True,
    )
    compiled = compile_patterns(pats, cfg)
    data = bytes(alpha[rng.integers(0, len(alpha), 4000)])
    m = Matcher(compiled, cfg, engine="pallas")
    got = [tuple(x) for x in m.match(data).tolist()]
    # the segment config must actually ride the plan kernel
    kind, per_shard = m._get_pallas_scanner()
    from phfpfac_tpu.ops.pallas_plan import PlanShardScanner

    assert kind == "depth" and all(
        isinstance(e, PlanShardScanner) for e in per_shard
    )
    assert got == match_oracle(pats, data, cfg)


def test_cell_live_training_output():
    """level_visit_counts(cell_live_out=...) — the DP's cond-execution
    pricing input — yields one fraction per level, each in [0, 1],
    non-increasing with depth (walkers only die), and 0 exactly where
    the visit counts are zero."""
    from phfpfac_tpu.compile.depth import level_visit_counts
    from phfpfac_tpu.compile.plan import _bfs_levels, _minimize_levels

    words = [b"ab", b"abcd", b"abcdefgh", b"xy"]
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    compiled = compile_patterns(pats, PfacConfig(width=256, num_shards=1))
    sh = compiled.shards[0]
    dense = np.asarray(sh.dense_table())
    levels = _bfs_levels(dense, sh.final_state_num + 1)
    lv = _minimize_levels(dense, levels, sh.final_state_num)
    data = b"abcd xy abcdefgh zz " * 200
    cl: list = []
    w = level_visit_counts(dense, np.asarray(sh.s0), lv, data,
                           cell_live_out=cl, cell_positions=256)
    assert len(cl) == len(w)
    assert all(0.0 <= f <= 1.0 for f in cl)
    assert all(a >= b for a, b in zip(cl, cl[1:]))  # walkers only die
    for f, cnt in zip(cl, w):
        assert (f == 0.0) == (int(cnt.sum()) == 0)


def test_stage16_count_parity():
    """int16-staged count scan (PHFPFAC_STAGE16 A/B arm) must match
    the int32 path exactly — scan and in-jit chain — including the
    per-cell int32 halo blocks at tile boundaries."""
    import jax.numpy as jnp

    from phfpfac_tpu.ops.pallas_plan import plan_count_scanner

    words = [b"the", b"then", b"there", b"cat", b"dog", b"a", b"an",
             b"aaaa", b"catalog"]
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    compiled = compile_patterns(pats, PfacConfig(width=512, num_shards=1))
    shard = compiled.shards[0]
    rng = np.random.default_rng(5)
    data = bytes(rng.choice(list(b"thecandoglx "), 128 * 1024)
                 .astype(np.uint8))
    ms = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, ms)
    n = jnp.int32(len(data))

    s32 = plan_count_scanner(shard, ms, interpret=True,
                             train=data[:4096], stage16=False, tpc=16)
    d32 = s32.prepare(padded, len(data))
    t32 = int(np.asarray(s32.scan(d32, n, jnp.int32(0))))

    s16 = plan_count_scanner(shard, ms, interpret=True,
                             train=data[:4096], stage16=True, tpc=16)
    d16 = s16.prepare(padded, len(data))
    assert isinstance(d16, tuple) and d16[0].dtype == jnp.int16
    t16 = int(np.asarray(s16.scan(d16, n, jnp.int32(0))))
    assert t16 == t32 > 0
    c32 = int(np.asarray(s32.scan_chain(d32, n, jnp.int32(0), 3)))
    c16 = int(np.asarray(s16.scan_chain(d16, n, jnp.int32(0), 3)))
    assert c16 == c32


def test_pack_probe_compaction_correct():
    """The butterfly lane-compaction used to cost survivor-compaction
    v2 on hardware (bench/pack_probe.py) is a real stable compaction:
    per tile, nonzero lanes move to the front in order, tail zeroed."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    repo = str(Path(__file__).resolve().parents[1])
    r = subprocess.run(
        [_sys.executable, "bench/pack_probe.py", "--interpret",
         "--mib", "1", "--planes", "1", "--chain", "1", "--reps", "1"],
        capture_output=True, text=True, cwd=repo, timeout=900,
    )
    assert "correctness OK" in r.stdout, r.stdout + r.stderr


def test_compacted_two_phase_scan_parity():
    """The two-phase compacted scan (phase A + nonzero/gather glue +
    dense survivor phase B) must be bit-identical to the plain scan in
    exact AND segment modes, fall back on survivor-cap overflow, and
    keep count-mode totals.  Verifies VERDICT r1 item 1c (sub-cell
    skipping) without TPU hardware."""
    from phfpfac_tpu.ops.pallas_plan import (
        PlanCountScan, resolve_compact,
    )

    rng = np.random.default_rng(11)
    alpha = np.frombuffer(b"abcdefgh ._", dtype=np.uint8)
    words = list(dict.fromkeys(
        bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 12)))])
        for _ in range(400)
    ))
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    data = bytes(alpha[rng.integers(0, len(alpha), 80_000)])
    oracle_n = None

    for trunc, seg, halo in (("none", 4096, 0), ("segment", 1024, 16)):
        cfg = PfacConfig(width=1024, num_shards=1, truncation=trunc,
                         segment_bytes=seg, halo_bytes=halo)
        compiled = compile_patterns(pats, cfg)
        sh = compiled.shards[0]
        ms = padded_steps(compiled.max_pat_len)
        n = len(data)
        padded = pad_input(data, 1024, ms)
        plain = PlanShardScanner(sh, interpret=True, train=data[:8192],
                                 compact="off")
        c0, b0 = map(np.asarray, plain.scan(padded, n, cfg, ms))
        # auto may decline (dict too live); force a mid-plan cut too
        cuts = [("auto", "auto")]
        n_steps = len(plain.pt.steps)
        for cut in {max(1, n_steps // 3), max(1, n_steps // 2)}:
            cuts.append((f"cut{cut}", (cut, 16384)))
        for name, compact in cuts:
            sc = PlanShardScanner(sh, interpret=True, train=data[:8192],
                                  compact=compact)
            if resolve_compact(sc.pt, len(padded) - ms, compact) is None:
                continue
            c1, b1 = map(np.asarray, sc.scan(padded, n, cfg, ms))
            np.testing.assert_array_equal(c0[:n], c1[:n],
                                          err_msg=f"{trunc}:{name}")
            np.testing.assert_array_equal(b0[:n], b1[:n],
                                          err_msg=f"{trunc}:{name}")
        if trunc == "none":
            oracle_n = len(match_oracle(pats, data, cfg))
            assert c0[:n].sum() == oracle_n

    # ---- overflow falls back to the plain scan (never truncates) ----
    cfg = PfacConfig(width=1024, num_shards=1, truncation="none")
    compiled = compile_patterns(pats, cfg)
    sh = compiled.shards[0]
    ms = padded_steps(compiled.max_pat_len)
    dense = (words[0] * (80_000 // max(1, len(words[0]))))[:80_000]
    n = len(dense)
    padded = pad_input(dense, 1024, ms)
    sc = PlanShardScanner(sh, interpret=True, train=data[:8192],
                          compact=(1, 16384))  # cap << survivors
    c1, b1 = map(np.asarray, sc.scan(padded, n, cfg, ms))
    plain = PlanShardScanner(sh, interpret=True, train=data[:8192],
                             compact="off")
    c0, b0 = map(np.asarray, plain.scan(padded, n, cfg, ms))
    np.testing.assert_array_equal(c0[:n], c1[:n])
    np.testing.assert_array_equal(b0[:n], b1[:n])

    # ---- count mode: compacted total == plain total, no overflow ----
    n = len(data)
    padded = pad_input(data, 1024, ms)
    cnt_plain = PlanCountScan(sh, ms, interpret=True, train=data[:8192],
                              compact="off")
    t0 = int(cnt_plain(padded, n, 0))
    cut = max(1, len(cnt_plain.pt.steps) // 2)
    cnt_c = PlanCountScan(sh, ms, interpret=True, train=data[:8192],
                          compact=(cut, 16384))
    t1 = int(cnt_c(padded, n, 0))
    assert not cnt_c.check_overflow()
    assert t0 == t1 == oracle_n


def test_stacked_nibble_empty_step_uniform_dead_zone():
    """Stacking a deep shard whose DP picks NIBBLE side packing with a
    shard shallower than those depths: the shallow shard's forced
    steps are empty, and their side dead-zone base must debase with
    the lead's nibble shift (span >> 3), not the byte default —
    otherwise s_k0 differs across shards and the stacker rejects a
    perfectly stackable dictionary (regression: empty steps carried no
    'nib' and always debased byte-wise)."""
    from phfpfac_tpu.compile.plan import build_stacked_plan_tables

    rng = np.random.default_rng(103)
    alpha = np.frombuffer(b"abcdefghijklmnop", dtype=np.uint8)
    longw = list(dict.fromkeys(
        bytes(alpha[rng.integers(0, 16, int(rng.integers(8, 16)))])
        for _ in range(3000)))
    shortw = list(dict.fromkeys(
        b"z" + bytes(alpha[rng.integers(0, 16, 2)]) for _ in range(600)))
    cfg = PfacConfig(width=2048, num_shards=1)
    comp_a = compile_patterns(
        [Pattern(i + 1, w) for i, w in enumerate(sorted(longw))], cfg)
    comp_b = compile_patterns(
        [Pattern(i + 1, w) for i, w in enumerate(sorted(shortw))], cfg)
    shards = [comp_a.shards[0], comp_b.shards[0]]
    assert shards[1].max_pat_len < shards[0].max_pat_len
    pt0 = build_plan_tables(shards[0])
    deep_nib = [
        s.depth0 for s in pt0.steps
        if s.kind == "pair" and s.s_nibble
        and s.depth0 > shards[1].max_pat_len
    ]
    assert deep_nib, "construction must exercise nibble past shard B"
    st = build_stacked_plan_tables(shards)
    for s in st.steps:
        if s.kind == "pair" and s.depth0 in deep_nib:
            assert s.s_nibble and s.s_k0 == 1


def test_compact_positions_glue_modes_identical(monkeypatch):
    """Both survivor-compaction strategies (jnp.nonzero cumsum vs the
    MXU triangular-matmul rank) must return IDENTICAL position arrays
    — ascending, first-cap-kept on overflow, N-filled tails."""
    import os

    from phfpfac_tpu.ops.pallas_plan import _compact_positions

    rng = np.random.default_rng(7)
    for n, density, cap in ((1 << 15, 0.03, 8192), (1 << 15, 0.9, 8192),
                            (1 << 14, 0.0, 8192)):
        live = np.asarray(rng.random(n) < density)
        outs = {}
        for mode in ("nonzero", "mxu"):
            monkeypatch.setenv("PHFPFAC_GLUE", mode)
            outs[mode] = np.asarray(_compact_positions(live, cap))
        os.environ.pop("PHFPFAC_GLUE", None)
        np.testing.assert_array_equal(
            outs["nonzero"], outs["mxu"],
            err_msg=f"n={n} density={density}",
        )
        want = np.flatnonzero(live)[:cap]
        np.testing.assert_array_equal(outs["nonzero"][:len(want)], want)
        assert (outs["nonzero"][len(want):] == n).all()


def test_s0x_split_prologue_parity(monkeypatch):
    """Wide-alphabet (sigma=256) dictionaries adopt the s0x split
    prologue (two-byte-addressed offsets, 64-span d2 sub-rows,
    StepSpec.col_bits=6) when it prices cheaper, and its bitmaps are
    identical to the plain-s0 build's — plus both match the oracle.
    Covers compile.plan "s0x split prologue" + ops.pallas_plan._geom
    (the split-step entry geometry)."""
    rng = np.random.default_rng(11)
    # enough signatures that the d2 table's wide uniform rows pin
    # first-fit utilization low and the split wins the pricing
    sigs = list(dict.fromkeys(
        rng.integers(0, 256, (6000, 16), dtype=np.uint8).tobytes()[
            i * 16 : i * 16 + 8 + int(rng.integers(0, 8))
        ]
        for i in range(6000)
    ))
    pats = [Pattern(i + 1, s) for i, s in enumerate(sigs)]
    cfg = PfacConfig(width=4096, num_shards=1)
    comp = compile_patterns(pats, cfg)
    sh = comp.shards[0]
    data = bytearray(rng.integers(0, 256, 60_000, dtype=np.uint8).tobytes())
    for i in range(0, len(data) - 16, 2500):  # plant some matches
        s = sigs[i % len(sigs)]
        data[i : i + len(s)] = s
    data = bytes(data)
    train = data[: 1 << 14]
    ms = padded_steps(comp.max_pat_len)
    n = len(data)
    padded = pad_input(data, 1024, ms)

    pt1 = build_plan_tables(sh, train=train)
    assert pt1.p0_mode == "s0x", "split should win the pricing here"
    assert pt1.steps[0].col_bits == 6
    monkeypatch.setenv("PHFPFAC_SPLIT_S0", "0")
    pt0 = build_plan_tables(sh, train=train)
    assert pt0.p0_mode == "s0"

    s1 = PlanShardScanner(sh, interpret=True, pt=pt1, compact="off")
    s0 = PlanShardScanner(sh, interpret=True, pt=pt0, compact="off")
    c1, b1, _ = s1.scan_async(padded, n, cfg, ms)
    c0, b0, _ = s0.scan_async(padded, n, cfg, ms)
    assert int(np.asarray(c1).sum()) == int(np.asarray(c0).sum())
    assert (np.asarray(b1) == np.asarray(b0)).all()

    # serialization round-trip keeps the split geometry
    from phfpfac_tpu.compile.plan import (
        plan_tables_arrays,
        plan_tables_from,
    )

    arrays, meta = plan_tables_arrays(pt1, "t_")
    pt2 = plan_tables_from(arrays, "t_", meta)
    assert pt2.p0_mode == "s0x" and pt2.steps[0].col_bits == 6
    s2 = PlanShardScanner(sh, interpret=True, pt=pt2, compact="off")
    _c2, b2, _ = s2.scan_async(padded, n, cfg, ms)
    assert (np.asarray(b2) == np.asarray(b1)).all()


def test_multiplane_staging_parity(monkeypatch):
    """PHFPFAC_MULTIPLANE=1 (stage_planes: pre-shifted window planes,
    zero in-kernel rotates) must be bit-identical to the classic
    rolled-window staging on both the count and bitmap paths, exact
    and segment modes."""
    import jax.numpy as jnp

    from phfpfac_tpu.ops.pallas_plan import plan_count_scanner

    rng = np.random.default_rng(23)
    alpha = np.frombuffer(b"abcdefgh ,.", dtype=np.uint8)
    words = list(dict.fromkeys(
        bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 10)))])
        for _ in range(120)))
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=512, num_shards=1)
    comp = compile_patterns(pats, cfg)
    sh = comp.shards[0]
    data = bytes(alpha[rng.integers(0, len(alpha), 50_000)])
    ms = padded_steps(comp.max_pat_len)
    n = len(data)
    padded = pad_input(data, 1024, ms)

    monkeypatch.delenv("PHFPFAC_MULTIPLANE", raising=False)
    s0 = PlanShardScanner(sh, interpret=True, train=data[:8192],
                          compact="off")
    _c0, b0, _ = s0.scan_async(padded, n, cfg, ms)
    sc0 = plan_count_scanner(sh, ms, interpret=True, train=data[:8192],
                             compact="off")
    t0 = int(np.asarray(sc0.scan(sc0.prepare(padded, n), jnp.int32(n),
                                 jnp.int32(0))))

    monkeypatch.setenv("PHFPFAC_MULTIPLANE", "1")
    s1 = PlanShardScanner(sh, interpret=True, train=data[:8192])
    assert s1.multiplane
    _c1, b1, _ = s1.scan_async(padded, n, cfg, ms)
    assert (np.asarray(b0)[:n] == np.asarray(b1)[:n]).all()
    sc1 = plan_count_scanner(sh, ms, interpret=True, train=data[:8192])
    assert sc1.multiplane
    t1 = int(np.asarray(sc1.scan(sc1.prepare(padded, n), jnp.int32(n),
                                 jnp.int32(0))))
    assert t0 == t1

    # segment mode: the positional cut must gate identically on planes
    cfg_s = PfacConfig(width=512, num_shards=1, truncation="segment",
                       segment_bytes=512, halo_bytes=64)
    _c2, b2, _ = s1.scan_async(padded, n, cfg_s, ms)
    _c3, b3, _ = s0.scan_async(padded, n, cfg_s, ms)
    assert (np.asarray(b2)[:n] == np.asarray(b3)[:n]).all()


class TestHostLiteralTail:
    """Tiny >32 B tails (<= 8 patterns) ride a host literal search
    instead of a device turbo scan (r5: the 466k dictionary's single
    45 B title cost an 869 ms device scan vs ~15 ms of bytes.find);
    larger tails keep the turbo engine.  Both must match the oracle."""

    def _mk(self, n_long, seg=False):
        from phfpfac_tpu.parallel.matcher import Matcher

        rng = np.random.default_rng(41)
        alpha = np.frombuffer(b"abcdef ", dtype=np.uint8)
        short = [
            bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 7)))])
            for _ in range(40)
        ]
        long = [
            bytes(alpha[rng.integers(0, len(alpha),
                                     int(rng.integers(33, 44)))])
            for _ in range(n_long)
        ]
        words = list(dict.fromkeys(short + long))
        pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
        kw = dict(width=256, num_shards=1, interpret=True,
                  truncation="none")
        if seg:
            kw.update(truncation="segment", segment_bytes=512,
                      halo_bytes=64)
        cfg = PfacConfig(**kw)
        compiled = compile_patterns(pats, cfg)
        text = bytearray(alpha[rng.integers(0, len(alpha), 6144)])
        for j, w in enumerate(long):
            o = 500 * (j + 1)  # some straddle segment cuts
            text[o:o + len(w)] = w
        data = bytes(text)
        m = Matcher(compiled, cfg, engine="pallas")
        got = [tuple(x) for x in m.match(data).tolist()]
        assert got == match_oracle(pats, data, cfg), f"n_long={n_long}"
        return m

    def test_tiny_tail_goes_host(self):
        m = self._mk(3)
        _kind, scanners = m._get_pallas_scanner()
        parts = scanners[0][1]
        assert parts[4][0] == "host"  # long_tt is the host marker

    def test_big_tail_keeps_turbo(self):
        m = self._mk(10)
        _kind, scanners = m._get_pallas_scanner()
        parts = scanners[0][1]
        assert not isinstance(parts[4], tuple)

    def test_tiny_tail_segment_mode(self):
        self._mk(3, seg=True)


def test_window_fusion_pairing():
    """_pairing / fresh_window_offsets: mono runs pair up starting at
    the prologue's offset-0 window; pair steps break chains (their
    window covers off and off+1 but the next step starts at off+2)."""
    from phfpfac_tpu.compile.plan import StepSpec
    from phfpfac_tpu.ops.pallas_plan import (
        _pairing,
        fresh_window_offsets,
    )

    def spec(kind, depth0):
        return StepSpec(kind=kind, depth0=depth0, off=0, nb=1, k0=0,
                        s_off=0, s_nb=1, s_k0=0, s_nibble=False, miss=0)

    # pure-mono plan, s0 prologue: offsets 1..6; w0 covers offset 1,
    # then (2,3), (4,5) pair up and 6 is fresh
    steps = tuple(spec("mono", d) for d in range(2, 8))
    reuse = _pairing(steps, True, True)
    assert reuse == {0: -1, 2: 1, 4: 3}
    assert fresh_window_offsets(steps, fuse=True) == (0, 2, 4, 6)
    # fuse off: every offset fresh
    assert fresh_window_offsets(steps, fuse=False) == (0, 1, 2, 3, 4, 5, 6)

    # a pair step breaks the chain: mono@2 (w0), pair@3-4, mono@5
    # cannot reuse the pair's window (no overlap), mono@6 reuses 5's
    steps = (spec("mono", 2), spec("pair", 3), spec("mono", 5),
             spec("mono", 6))
    reuse = _pairing(steps, True, True)
    assert reuse == {0: -1, 3: 2}
    assert fresh_window_offsets(steps, fuse=True) == (0, 2, 4)

    # no w0 (phase-B style): first mono is fresh, second reuses
    reuse = _pairing(tuple(spec("mono", d) for d in (2, 3)), False, True)
    assert reuse == {1: 0}
