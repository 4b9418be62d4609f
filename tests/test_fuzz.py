"""Cross-engine differential fuzzing.

Random dictionaries x random corpora, every engine against the CPU
oracle and each other — the adversarial net under the five device
engines' very different table layouts."""

import numpy as np
import pytest

from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.parallel.matcher import Matcher
from phfpfac_tpu.utils.config import PfacConfig


def _dict_and_corpus(seed: int):
    rng = np.random.default_rng(seed)
    flavor = seed % 4
    if flavor == 0:  # small alphabet, heavy overlap (pair/plan kernels)
        alpha = np.frombuffer(b"abcd", dtype=np.uint8)
    elif flavor == 1:  # english-like (cb=5)
        alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", dtype=np.uint8)
    elif flavor == 2:  # 40+ symbols (cb=6: the 4096-entry dense P0)
        alpha = np.frombuffer(
            b"abcdefghijklmnopqrstuvwxyz0123456789 .,;:-'", dtype=np.uint8
        )
    else:  # full binary incl 0x00/0xff (depth kernel, code-miss edges)
        alpha = np.arange(256, dtype=np.uint8)
    n_words = int(rng.integers(5, 120))
    words = list(
        dict.fromkeys(
            bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(1, 14)))])
            for _ in range(n_words)
        )
    )
    data = bytes(alpha[rng.integers(0, len(alpha), int(rng.integers(512, 6000)))])
    return words, data


@pytest.mark.parametrize("seed", range(12))
def test_engines_match_oracle(seed):
    words, data = _dict_and_corpus(seed)
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    shards = 1 + seed % 3
    cfg = PfacConfig(
        width=256, num_shards=shards, truncation="none", interpret=True
    )
    compiled = compile_patterns(pats, cfg)
    # input_size quirk coverage: drop the final byte on odd seeds
    # (main.cc:138 scans filesize-1)
    input_size = len(data) - (seed % 2)
    want = match_oracle(pats, data[:input_size], cfg)
    for engine in ("turbo", "jnp", "pallas"):
        m = Matcher(compiled, cfg, engine=engine)
        got = [
            tuple(x) for x in m.match(data, input_size=input_size).tolist()
        ]
        assert got == want, (
            f"seed {seed} engine {engine}: {len(got)} vs {len(want)}"
        )


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_compacted_two_phase(seed):
    """Differential fuzz of the two-phase compacted plan scan: random
    dictionaries/corpora, a forced cut at every feasible step index
    mod the plan length, tiny caps included (exercising the overflow
    fallback) — always byte-identical to the plain scan."""
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.pallas_plan import PlanShardScanner

    words, data = _dict_and_corpus(1000 + seed)
    # above the compaction floor (cap*2 < n_pos: 49_152 > 2*16_384)
    data = (data * (1 + 49_152 // len(data)))[:49_152]
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=1024, num_shards=1, truncation="none")
    compiled = compile_patterns(pats, cfg)
    sh = compiled.shards[0]
    ms = padded_steps(compiled.max_pat_len)
    n = len(data)
    padded = pad_input(data, 1024, ms)
    try:
        plain = PlanShardScanner(sh, interpret=True, train=data[:8192],
                                 compact="off")
    except ValueError:
        pytest.skip("plan engine does not apply to this dictionary")
    c0, b0 = map(np.asarray, plain.scan(padded, n, cfg, ms))
    n_steps = len(plain.pt.steps)
    if n_steps < 2:
        pytest.skip("single-step plan: nothing to compact")
    cut = 1 + (seed % (n_steps - 1))
    cap = 16384 if seed % 3 else 8192  # small caps: overflow path too
    sc = PlanShardScanner(sh, interpret=True, train=data[:8192],
                          compact=(cut, cap))
    c1, b1 = map(np.asarray, sc.scan(padded, n, cfg, ms))
    np.testing.assert_array_equal(c0[:n], c1[:n])
    np.testing.assert_array_equal(b0[:n], b1[:n])
    assert c0[:n].sum() == len(match_oracle(pats, data, cfg))
