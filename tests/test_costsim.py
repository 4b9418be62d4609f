"""The offline vop-cost simulator (bench/costsim.py) replays the plan
kernel's EXACT probe/verify/chain semantics in NumPy — so its match
count is itself a correctness mirror.  Pin it to the oracle, in both
one-phase and compacted form, so sim-guided tuning can't drift from
the kernel contract."""

import importlib.util

import numpy as np

from phfpfac_tpu.compile.plan import build_plan_tables
from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.utils.config import PfacConfig


def _load_costsim():
    spec = importlib.util.spec_from_file_location(
        "costsim", "/root/repo/bench/costsim.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_costsim_match_parity_with_oracle():
    cs = _load_costsim()
    rng = np.random.default_rng(23)
    alpha = np.frombuffer(b"abcdefg .", dtype=np.uint8)
    words = list(dict.fromkeys(
        bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 11)))])
        for _ in range(300)
    ))
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=1024, num_shards=1, truncation="none")
    compiled = compile_patterns(pats, cfg)
    data = bytes(alpha[rng.integers(0, len(alpha), 50_000)])
    want = len(match_oracle(pats, data, cfg))

    pt = build_plan_tables(compiled.shards[0], train=data[:4096])
    for compact_at in (0, max(1, len(pt.steps) // 2)):
        gbps, vops, _ledger = cs.simulate(
            pt, data, tpc=8, cond_from=3, verbose=False,
            compact_at=compact_at,
        )
        assert gbps > 0 and vops > 0
        assert cs.LAST_MATCHES == want, f"compact_at={compact_at}"
