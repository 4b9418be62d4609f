"""The driver's validation configs (BASELINE.json "configs").

1. experimentpattern over the binary 1000000byte corpus, parity + shard
   invariance;
2. PHF hash-table-width sweep over the 1M corpus (collision/occupancy
   stress);
3. multi-stream single-chip == chunked shards (covered throughout);
4. split corpora xae.. scanned by 2 cooperating processes
   (tests/test_distributed.py covers the process harness; here the
   real split files drive the single-process merge path).
"""

import numpy as np
import pytest

from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.parallel.matcher import Matcher
from phfpfac_tpu.utils.config import PfacConfig


def test_experimentpattern_over_binary_corpus(reference_dir):
    words = (reference_dir / "experimentpattern").read_bytes().split()
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    data = (reference_dir / "1000000byte").read_bytes()[:65536]
    outs = []
    for shards in (1, 4):
        cfg = PfacConfig(width=4096, num_shards=shards, truncation="none")
        compiled = compile_patterns(pats, cfg)
        m = Matcher(compiled, cfg)
        outs.append([tuple(x) for x in m.match(data).tolist()])
    assert outs[0] == outs[1]  # shard invariance
    cfg = PfacConfig(width=4096, num_shards=1, truncation="none")
    assert outs[0] == match_oracle(pats, data, cfg)


@pytest.mark.parametrize("width", [256, 1024, 4096])
def test_phf_width_sweep_parity(reference_dir, width):
    # width changes the PHF row geometry (collision/occupancy stress,
    # phf.c width argument); results must be identical
    words = (reference_dir / "xaa").read_bytes().split()[:400]
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    data = (reference_dir / "1M").read_bytes()[:16384]
    cfg = PfacConfig(width=width, num_shards=2, truncation="none")
    compiled = compile_patterns(pats, cfg)
    got = [tuple(x) for x in Matcher(compiled, cfg).match(data).tolist()]
    assert got == match_oracle(pats, data, cfg)


def test_split_corpus_merge_matches_whole(reference_dir):
    # the reference's xae.. split corpora: scanning the concatenation
    # must equal concatenating per-slice scans with a file-level halo
    # (the multi-host slicing contract, parallel.distributed)
    words = (reference_dir / "xaa").read_bytes().split()[:300]
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    cfg = PfacConfig(width=1024, num_shards=1, truncation="none")
    compiled = compile_patterns(pats, cfg)
    m = Matcher(compiled, cfg)
    a = (reference_dir / "xae").read_bytes()[:32768]
    b = (reference_dir / "xaf").read_bytes()[:32768]
    whole = [tuple(x) for x in m.match(a + b).tolist()]

    halo = compiled.max_pat_len - 1
    part1 = np.asarray(m.match(a + b[:halo]))
    part1 = part1[part1[:, 0] < len(a)]
    part2 = np.asarray(m.match(b))
    part2 = part2 + np.array([len(a), 0])
    merged = [tuple(x) for x in np.concatenate([part1, part2]).tolist()]
    assert merged == whole
