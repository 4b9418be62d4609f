"""Depth kernel under shard_map (parallel.mesh_pallas) parity."""

import numpy as np
import pytest

from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.parallel.matcher import Matcher
from phfpfac_tpu.parallel.mesh import make_mesh
from phfpfac_tpu.parallel.mesh_pallas import PallasMeshMatcher
from phfpfac_tpu.utils.config import PfacConfig


def _mk(words, num_shards, width=1024):
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    cfg = PfacConfig(
        width=width, num_shards=num_shards, truncation="none", interpret=True
    )
    return pats, cfg, compile_patterns(pats, cfg)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1)])
def test_oracle_parity_across_mesh_shapes(reference_dir, mesh_shape):
    n_data, n_pat = mesh_shape
    words = (reference_dir / "xaa").read_bytes().split()[:300]
    data = (reference_dir / "1M").read_bytes()[:8192]
    pats, cfg, compiled = _mk(words, n_pat)
    pm = PallasMeshMatcher(compiled, cfg, make_mesh(n_data, n_pat),
                           interpret=True)
    got = [tuple(x) for x in pm.match(data).tolist()]
    assert got == match_oracle(pats, data, cfg)


def test_matches_single_host_matcher(reference_dir):
    # mesh output must be byte-equivalent to the single-chip matcher
    words = (reference_dir / "experimentpattern").read_bytes().split()
    data = (reference_dir / "experimentinput").read_bytes()
    pats, cfg, compiled = _mk(words, 2, width=256)
    pm = PallasMeshMatcher(compiled, cfg, make_mesh(4, 2), interpret=True)
    single = Matcher(compiled, cfg, engine="pallas")
    assert pm.match(data).tolist() == single.match(data).tolist()


def test_block_boundary_straddle():
    # a match crossing the data-shard boundary must survive via the
    # ppermute halo (the cross-chip version of master_kernel.cu halos)
    words = [b"boundarycrossing"]
    pats, cfg, compiled = _mk(words, 1, width=256)
    pm = PallasMeshMatcher(compiled, cfg, make_mesh(8, 1), interpret=True)
    # place the pattern across the first 1024-byte block boundary
    data = b"x" * (1024 - 8) + b"boundarycrossing" + b"y" * 2000
    got = [tuple(x) for x in pm.match(data).tolist()]
    assert got == [(1024 - 8, 1)]


class TestPlanMesh:
    """Plan kernel over the data axis (PlanMeshMatcher)."""

    def test_oracle_parity_and_single_chip_equivalence(self, reference_dir):
        from phfpfac_tpu.parallel.mesh_pallas import PlanMeshMatcher

        words = (reference_dir / "xaa").read_bytes().split()[:300]
        data = (reference_dir / "1M").read_bytes()[:16384]
        pats, cfg, compiled = _mk(words, 2)
        pm = PlanMeshMatcher(compiled, cfg, make_mesh(8, 1), interpret=True)
        got = [tuple(x) for x in pm.match(data).tolist()]
        assert got == match_oracle(pats, data, cfg)
        single = Matcher(compiled, cfg, engine="pallas")
        assert got == [tuple(x) for x in single.match(data).tolist()]

    def test_trained_boundary_straddle(self, reference_dir):
        """Profile-guided tables + a match crossing the data-shard
        boundary (ICI halo) on the plan mesh path."""
        from phfpfac_tpu.parallel.mesh_pallas import PlanMeshMatcher

        words = [b"boundarycrossing", b"bound", b"cross"]
        pats, cfg, compiled = _mk(words, 1, width=256)
        train = (reference_dir / "1M").read_bytes()[:8192]
        pm = PlanMeshMatcher(compiled, cfg, make_mesh(8, 1),
                             interpret=True, train=train)
        assert all(pt.trained for pt in pm.pts)
        data = b"x" * (1024 - 8) + b"boundarycrossing" + b"y" * 3000
        got = [tuple(x) for x in pm.match(data).tolist()]
        assert got == match_oracle(pats, data, cfg)

    def test_stacked_patterns_axis(self, reference_dir):
        """FOUR pattern shards on the plan engine under ONE shard_map
        (data x patterns) — the stacked uniform-geometry program
        (compile.plan.build_stacked_plan_tables)."""
        from phfpfac_tpu.parallel.mesh_pallas import PlanMeshMatcher

        words = (reference_dir / "xaa").read_bytes().split()[:400]
        data = (reference_dir / "1M").read_bytes()[:16384]
        pats, cfg, compiled = _mk(words, 4)
        pm = PlanMeshMatcher(compiled, cfg, make_mesh(2, 4),
                             interpret=True, train=data)
        assert pm.stacked is not None and pm.stacked.num_shards == 4
        got = [tuple(x) for x in pm.match(data).tolist()]
        assert got == match_oracle(pats, data, cfg)
        single = Matcher(compiled, cfg, engine="pallas")
        assert got == [tuple(x) for x in single.match(data).tolist()]

    def test_stacked_uneven_depths(self):
        """Shards with very different automaton depths still stack
        (shallow shards get all-miss steps)."""
        from phfpfac_tpu.parallel.mesh_pallas import PlanMeshMatcher

        rng = np.random.default_rng(3)
        alpha = np.frombuffer(b"abcdef ", dtype=np.uint8)
        short = [bytes(alpha[rng.integers(0, 7, 2)]) for _ in range(40)]
        long = [bytes(alpha[rng.integers(0, 7, 14)]) for _ in range(40)]
        words = list(dict.fromkeys(short + long))
        pats, cfg, compiled = _mk(words, 2)
        data = bytes(alpha[rng.integers(0, 7, 8192)])
        pm = PlanMeshMatcher(compiled, cfg, make_mesh(4, 2),
                             interpret=True)
        got = [tuple(x) for x in pm.match(data).tolist()]
        assert got == match_oracle(pats, data, cfg)

    def test_mesh_compacted_scan_parity(self, reference_dir):
        """Two-phase survivor compaction under shard_map: survivors
        compact per DEVICE cell (no extra collectives); both the
        replicated data-axis path and the stacked (data x patterns)
        path must match the uncompacted mesh scan and the oracle."""
        from phfpfac_tpu.parallel.mesh_pallas import PlanMeshMatcher

        words = (reference_dir / "xaa").read_bytes().split()[:400]
        data = (reference_dir / "1M").read_bytes()[:65536]
        for n_data, n_pat in ((2, 4), (4, 1)):
            pats, cfg, compiled = _mk(words, n_pat)
            base = PlanMeshMatcher(
                compiled, cfg, make_mesh(n_data, n_pat),
                interpret=True, train=data[:8192], compact="off",
            )
            want = [tuple(x) for x in base.match(data).tolist()]
            pm = PlanMeshMatcher(
                compiled, cfg, make_mesh(n_data, n_pat),
                interpret=True, train=data[:8192], compact=(2, 8192),
            )
            if n_pat > 1:
                assert pm.stacked is not None
            got = [tuple(x) for x in pm.match(data).tolist()]
            assert got == want == match_oracle(pats, data, cfg)
        # overflow on a device cell -> exact rescan (cap 8192 is far
        # below the survivors of an all-matching corpus)
        dense = (words[0] + b" ") * (65536 // (len(words[0]) + 1))
        pats, cfg, compiled = _mk(words, 1)
        pm = PlanMeshMatcher(
            compiled, cfg, make_mesh(4, 1), interpret=True,
            train=data[:8192], compact=(1, 8192),
        )
        got = [tuple(x) for x in pm.match(dense).tolist()]
        assert got == match_oracle(pats, dense, cfg)

    def test_mesh_segment_truncation_parity(self, reference_dir):
        """Segment-truncation mode on the mesh plan matcher (the
        reference's multi-GPU runs ARE segment mode, main.cc:225-241):
        per-device slices are segment-aligned so the kernel's local
        position arithmetic yields the single-chip cut limits.  Parity
        against the oracle and the single-chip matcher, compacted and
        not."""
        from phfpfac_tpu.parallel.mesh_pallas import PlanMeshMatcher

        words = (reference_dir / "xaa").read_bytes().split()[:300]
        data = (reference_dir / "1M").read_bytes()[:40000]
        pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
        cfg = PfacConfig(
            width=1024, num_shards=2, truncation="segment",
            segment_bytes=2048, halo_bytes=32, interpret=True,
        )
        compiled = compile_patterns(pats, cfg)
        want = match_oracle(pats, data, cfg)
        single = Matcher(compiled, cfg, engine="pallas")
        assert [tuple(x) for x in single.match(data).tolist()] == want
        for compact in ("off", (2, 8192)):
            pm = PlanMeshMatcher(
                compiled, cfg, make_mesh(4, 2), interpret=True,
                train=data[:8192], compact=compact,
            )
            got = [tuple(x) for x in pm.match(data).tolist()]
            assert got == want, f"compact={compact}"
