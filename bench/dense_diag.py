"""Dense-match e2e attribution (english dict over english text).

Times each stage of the match-mode path separately on the real TPU:
dispatch (pad+upload+scan enqueue), bitmap resolve (fetch), decode
(C++ hash probe), merge (order + ids).  The 0.42-matches/byte regime
is host/transfer-bound, so this is where VERDICT item-6 work must be
aimed; bench/e2e.py gives the one-line summary, this gives the why.

Usage: python bench/dense_diag.py [--mib 32] [--reps 3]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/bench")

from phfpfac_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

from corpora import corpus, load_words


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=float, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.parallel.matcher import Matcher
    from phfpfac_tpu.parallel.merge import merge_flat_matches
    from phfpfac_tpu.utils.config import PfacConfig

    words = load_words("english")
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=4096, num_shards=1, truncation="none",
                     interpret=jax.default_backend() != "tpu")
    compiled = compile_patterns(pats, cfg)
    data = corpus(args.mib)
    n = len(data)
    m = Matcher(compiled, cfg, engine="pallas", train=data[: 1 << 20])
    _ = m.match(data)  # warm compiles

    for rep in range(args.reps):
        t0 = time.perf_counter()
        resolvers = m._dispatch_flat_pallas(data, n)
        t1 = time.perf_counter()
        flats = [r() for r in resolvers]
        t2 = time.perf_counter()
        got = merge_flat_matches(compiled, flats, n)
        t3 = time.perf_counter()
        print(
            f"[dense] rep{rep}: dispatch {t1 - t0:.2f}s | resolve "
            f"(scan+fetch+decode) {t2 - t1:.2f}s | merge "
            f"{t3 - t2:.2f}s | total {t3 - t0:.2f}s "
            f"({len(got)} matches, {n / (t3 - t0) / 1e9:.4f} GB/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
