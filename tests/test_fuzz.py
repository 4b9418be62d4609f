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
