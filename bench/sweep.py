"""Input-size throughput sweep (the reference's bytefile/ experiment).

Scans the reference ``bytefile/`` corpora (10 KB .. 1 MB) plus larger
replications with the fastest engine and reports GB/s per size — the
scaling-curve methodology of SURVEY.md §4 (size-sweep throughput
benchmarks), on real TPU.

  python bench/sweep.py [--dict english|xaa] [--max-mib 64]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

REF = "/root/reference/regex_GPU_PHF"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dict", default="english", choices=["english", "xaa"])
    ap.add_argument("--max-mib", type=int, default=64)
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    import jax.numpy as jnp

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.engine_select import best_count_scanner
    from phfpfac_tpu.utils.config import PfacConfig

    parts = ("xaa", "xab", "xac", "xad") if args.dict == "english" else ("xaa",)
    words: list[bytes] = []
    for part in parts:
        words += open(f"{REF}/{part}", "rb").read().split()
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    compiled = compile_patterns(pats, PfacConfig(width=4096, num_shards=1))
    shard = compiled.shards[0]
    max_steps = padded_steps(compiled.max_pat_len)
    seed = open(f"{REF}/1M", "rb").read()
    # profile-guided layout: train on the corpus head (exact for any
    # input; matches bench.py)
    scan = best_count_scanner(shard, max_steps, train=seed[: 1 << 20])
    sizes = [10_000, 100_000, 1_000_000]
    mib = 2
    while mib <= args.max_mib:
        sizes.append(mib << 20)
        mib *= 4

    print(f"dict={args.dict} patterns={len(pats)} states={shard.state_num}")
    print(f"{'bytes':>12} {'ms':>9} {'GB/s':>8}  matches")
    for size in sizes:
        data = (seed * (size // len(seed) + 1))[:size]
        n = len(data)
        padded = pad_input(data, 1024, max_steps)
        if hasattr(scan, "prepare"):
            staged = scan.prepare(padded, n)
            fn = scan.scan
        else:
            staged = jnp.asarray(padded)
            fn = scan
        total = int(np.asarray(fn(staged, jnp.int32(n), jnp.int32(0))))
        reps = []
        for _ in range(3):
            s = jnp.int32(0)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                s = fn(staged, jnp.int32(n), s % 2)
            _ = int(np.asarray(s))
            reps.append((time.perf_counter() - t0) / args.reps)
        dt = float(np.median(reps))
        print(f"{n:>12} {dt*1e3:>9.3f} {n/dt/1e9:>8.3f}  {total}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
