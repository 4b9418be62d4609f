"""Compiled-TPU differential soak (real Mosaic kernels vs oracle).

The pytest fuzz (tests/test_fuzz.py) runs interpret-mode on the CPU
mesh, which checks semantics but not Mosaic compilation.  This soak
compiles the real kernels per seed on the TPU and diffs the full
Matcher against the Aho-Corasick oracle — the hardware counterpart of
the suite (r2 ran 45/75-seed soaks; rerun after any kernel change,
e.g. r3's one-shot early-exit pred).

Usage: python bench/tpu_fuzz.py [--seeds 15] [--start 100] [--segment]

``--segment`` runs the reference's segment+halo walk-truncation mode
(small 512 B segments + 64 B halos force the in-kernel positional cut
on nearly every walk) instead of exact mode — the CPU suite fuzzes
this path in interpret mode; this arm compiles the real Mosaic
segment kernels on the chip.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from phfpfac_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=15)
    ap.add_argument("--start", type=int, default=100)
    ap.add_argument("--segment", action="store_true")
    args = ap.parse_args()

    import jax

    sys.path.insert(0, "/root/repo/tests")
    from test_fuzz import _dict_and_corpus

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.oracle.ac import match_oracle
    from phfpfac_tpu.parallel.matcher import Matcher
    from phfpfac_tpu.utils.config import PfacConfig

    assert jax.default_backend() == "tpu", "this soak wants the chip"
    bad = 0
    for k in range(args.seeds):
        seed = args.start + k
        words, data = _dict_and_corpus(seed)
        pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
        if args.segment:
            cfg = PfacConfig(
                width=256, num_shards=1 + seed % 3,
                truncation="segment", segment_bytes=512, halo_bytes=64,
                interpret=False,
            )
        else:
            cfg = PfacConfig(
                width=256, num_shards=1 + seed % 3, truncation="none",
                interpret=False,
            )
        compiled = compile_patterns(pats, cfg)
        input_size = len(data) - (seed % 2)
        want = match_oracle(pats, data[:input_size], cfg)
        t0 = time.perf_counter()
        m = Matcher(compiled, cfg, engine="pallas", train=data[:2048])
        got = [
            tuple(x) for x in m.match(data, input_size=input_size).tolist()
        ]
        ok = got == want
        bad += not ok
        print(
            f"[tpu-fuzz] seed {seed}: {'OK' if ok else 'MISMATCH'} "
            f"({len(got)} matches, {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
        if not ok:
            print(f"  want {len(want)}: {want[:10]}...", flush=True)
            print(f"  got  {len(got)}: {got[:10]}...", flush=True)
    print(f"[tpu-fuzz] {args.seeds - bad}/{args.seeds} clean", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
