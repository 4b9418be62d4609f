"""466k-title full-Wikipedia dictionary: oracle parity on a window.

VERDICT r2 item 7: the long-tail split (parallel/matcher.py) claims
the full 466k dictionary rides the plan kernel for its <=32 B bulk
with the exact XLA engine covering the >32 B tail.  This harness
proves position-level parity against the pure-Python Aho-Corasick
oracle on a sampled corpus window, with the UNCAPPED dictionary (max
pattern 120 B) through the full Matcher path.  Throughput for the
capped single-kernel protocol is measured separately by
``bench/kexp.py --dict full --chain 8``.

Usage: python bench/fullwiki_parity.py [--window-kib 128]
(CPU-safe: interpret mode off-TPU.)
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/bench")

from phfpfac_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window-kib", type=int, default=128)
    ap.add_argument("--num-shards", type=int, default=1)
    args = ap.parse_args()

    import jax

    from corpora import corpus, load_words

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.oracle.ac import match_oracle
    from phfpfac_tpu.parallel.matcher import Matcher
    from phfpfac_tpu.utils.config import PfacConfig

    words = load_words("full")  # UNCAPPED: exercises the >32 B split
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    maxlen = max(len(w) for w in words)
    print(f"[fullwiki] {len(pats)} patterns, max len {maxlen}", flush=True)

    cfg = PfacConfig(
        width=4096, num_shards=args.num_shards, truncation="none",
        interpret=jax.default_backend() != "tpu",
    )
    t0 = time.perf_counter()
    compiled = compile_patterns(pats, cfg)
    t_build = time.perf_counter() - t0
    print(
        f"[fullwiki] host build {t_build:.1f} s "
        f"(states {sum(s.state_num for s in compiled.shards)})",
        flush=True,
    )

    data = corpus(args.window_kib / 1024)
    n = len(data)
    m = Matcher(compiled, cfg, engine="pallas", train=data[: 1 << 16])
    t0 = time.perf_counter()
    got = m.match(data)
    t_scan = time.perf_counter() - t0
    want = match_oracle(pats, data, cfg)
    ok = len(got) == len(want) and all(
        (int(p), int(i)) == w for (p, i), w in zip(got, want)
    )
    print(
        f"[fullwiki] window {n} B: {len(got)} matches, oracle "
        f"{len(want)}, parity {'OK' if ok else 'MISMATCH'} "
        f"(first scan incl compile {t_scan:.1f} s)",
        flush=True,
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
