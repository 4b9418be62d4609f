"""Multi-chip mesh runtime tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.parallel.matcher import Matcher
from phfpfac_tpu.parallel.mesh import DistributedMatcher, make_mesh
from phfpfac_tpu.utils.config import PfacConfig


def P(i, b):
    return Pattern(pattern_id=i, data=b)


def _dict_and_data(n_words=50, data_len=9000, seed=5):
    rng = np.random.default_rng(seed)
    words = list(
        dict.fromkeys(
            bytes(rng.integers(97, 104, rng.integers(1, 8)).astype(np.uint8))
            for _ in range(n_words)
        )
    )
    pats = [P(i + 1, w) for i, w in enumerate(words)]
    data = bytes(rng.integers(97, 104, data_len).astype(np.uint8))
    return pats, data


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8
class TestDistributed:
    @pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
    def test_matches_oracle_all_mesh_shapes(self, mesh_shape):
        n_data, n_pat = mesh_shape
        pats, data = _dict_and_data()
        cfg = PfacConfig(width=512, num_shards=n_pat)
        compiled = compile_patterns(pats, cfg)
        mesh = make_mesh(n_data, n_pat)
        dm = DistributedMatcher(compiled, cfg, mesh)
        got = [tuple(x) for x in dm.match(data).tolist()]
        want = match_oracle(pats, data, cfg)
        assert got == want

    def test_matches_single_chip_engine(self):
        pats, data = _dict_and_data(seed=9)
        cfg = PfacConfig(width=512, num_shards=4)
        compiled = compile_patterns(pats, cfg)
        mesh = make_mesh(2, 4)
        dm = DistributedMatcher(compiled, cfg, mesh)
        sm = Matcher(compiled, cfg, engine="turbo")
        np.testing.assert_array_equal(dm.match(data), sm.match(data))

    def test_multiple_shards_per_cell(self):
        pats, data = _dict_and_data(seed=13)
        cfg = PfacConfig(width=512, num_shards=8)  # 8 shards on 2 pattern cells
        compiled = compile_patterns(pats, cfg)
        mesh = make_mesh(4, 2)
        dm = DistributedMatcher(compiled, cfg, mesh)
        got = [tuple(x) for x in dm.match(data).tolist()]
        want = match_oracle(pats, data, cfg)
        assert got == want

    def test_halo_crossing_block_boundary(self):
        # pattern placed to straddle the data-shard boundary exactly
        pat = b"straddle"
        pats = [P(1, pat)]
        cfg = PfacConfig(width=256, num_shards=1)
        compiled = compile_patterns(pats, cfg)
        mesh = make_mesh(8, 1)
        # block size will be total/8; put pattern across the first boundary
        data_len = 8 * 2048
        for block_end in (2048, 4096, 6144):
            buf = bytearray(b"." * data_len)
            start = block_end - 3  # 3 bytes before the boundary
            buf[start : start + len(pat)] = pat
            dm = DistributedMatcher(compiled, cfg, mesh)
            got = [tuple(x) for x in dm.match(bytes(buf)).tolist()]
            assert got == [(start, 1)], (block_end, got)

    def test_count_matches(self):
        pats, data = _dict_and_data(seed=21)
        cfg = PfacConfig(width=512, num_shards=2)
        compiled = compile_patterns(pats, cfg)
        mesh = make_mesh(4, 2)
        dm = DistributedMatcher(compiled, cfg, mesh)
        cnt = dm.count_matches(data)
        want = match_oracle(pats, data, cfg)
        ref = np.zeros(len(data), dtype=np.int64)
        for p, _ in want:
            ref[p] += 1
        np.testing.assert_array_equal(cnt, ref)

    def test_overflow_fallback_distributed(self):
        pats = [P(1, b"z" * 20)]
        data = b"z" * 4096
        cfg = PfacConfig(width=256, num_shards=1)
        compiled = compile_patterns(pats, cfg)
        mesh = make_mesh(8, 1)
        dm = DistributedMatcher(compiled, cfg, mesh, cap_frac=64)
        got = [tuple(x) for x in dm.match(data).tolist()]
        want = match_oracle(pats, data, cfg)
        assert got == want

    def test_shard_count_must_divide(self):
        pats, _ = _dict_and_data()
        cfg = PfacConfig(width=512, num_shards=3)
        compiled = compile_patterns(pats, cfg)
        mesh = make_mesh(4, 2)
        with pytest.raises(ValueError, match="not divisible"):
            DistributedMatcher(compiled, cfg, mesh)
