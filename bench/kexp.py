"""Kernel-variant A/B harness (english dict, 32 MiB, count mode).

Usage:  python bench/kexp.py [--mib 32] [--dict english|big] [--untrained]

Times the plan engine via the chained-dispatch protocol (bench.py
methodology) and prints one line per run.  Used to iterate on
ops/pallas_plan.py; the headline 128 MiB number stays bench.py's job.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from phfpfac_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--dict", default="english",
                    choices=["english", "xaa", "big", "full", "binary"])
    ap.add_argument("--untrained", action="store_true")
    ap.add_argument("--tpc", type=int, default=32)
    ap.add_argument("--cond-from", default="auto",
                    help="step index or 'auto' (trained live-frac rule; "
                         "the stale fixed-4 default undersold english "
                         "by 13%% — conds at never-skipping steps cost "
                         "an any_live reduction each)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--corpus", default="text",
                    choices=["text", "random"],
                    help="'random' = uniform bytes (walkers die at "
                         "depth 1-2; measured 2.75 GB/s on the full "
                         "english dict — trained-on-random degrades "
                         "hot spans to full width, see PERF.md)")
    ap.add_argument("--head", type=int, default=0,
                    help="truncate the dictionary to its first N "
                         "patterns (narrow-table regimes: small "
                         "rulesets have 1-2-bank shallow tables and "
                         "probe at the prologue bound)")
    ap.add_argument("--compact", default="auto",
                    help='"auto", "off", a cut step, or "cut,cap"')
    ap.add_argument("--glue", default=None, choices=["nonzero", "mxu"],
                    help="survivor-compaction glue strategy A/B "
                         "(PHFPFAC_GLUE)")
    ap.add_argument("--chain", type=int, default=0, metavar="K",
                    help="time K in-jit chained scans (one dispatch; "
                         "per-scan device time = (T(2K)-T(K))/K, "
                         "cancelling dispatch+fetch like the "
                         "reference's cudaEvent span)")
    ap.add_argument("--plan", default=None,
                    help="forced step kinds from depth 1 (costsim "
                         "syntax: 'm' per 1-depth mono, 'p' per "
                         "2-depth pair, padded with the last char) — "
                         "overrides the build DP for A/B")
    args = ap.parse_args()
    if args.glue:
        import os

        os.environ["PHFPFAC_GLUE"] = args.glue

    import jax.numpy as jnp

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.pallas_plan import plan_count_scanner
    from phfpfac_tpu.utils.config import PfacConfig

    from corpora import corpus, load_words

    # "big" = the 156k-title Snort-scale dict (bigenglishdic/xaa alone,
    # matching PERF.md's round-1 numbers); "full" = all 466k titles —
    # both capped at the 32-step bitmap (single-kernel protocol).
    # "binary" = the bench.py binary-signature regime (5,000 sigs,
    # sigma=256, random bytes with planted signatures).
    if args.dict == "binary":
        from binary import make_signatures

        words = make_signatures(5000)
    else:
        words = load_words(
            args.dict, cap32=args.dict in ("big", "full")
        )
    if args.head:
        words = words[: args.head]
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=4096, num_shards=1)
    compiled = compile_patterns(pats, cfg)
    shard = compiled.shards[0]

    if args.dict == "binary":
        import numpy as _np

        rng = _np.random.default_rng(1)
        buf = bytearray(
            rng.integers(0, 256, args.mib << 20, dtype=_np.uint8).tobytes()
        )
        for i in range(0, len(buf) - 64, 1 << 18):
            s = words[i % len(words)]
            buf[i : i + len(s)] = s
        data = bytes(buf)
    elif args.corpus == "random":
        import numpy as _np

        data = _np.random.default_rng(3).integers(
            0, 256, args.mib << 20, dtype=_np.uint8
        ).tobytes()
    else:
        data = corpus(args.mib)
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)

    t0 = time.perf_counter()
    compact = args.compact
    if "," in str(compact):
        compact = tuple(int(x) for x in compact.split(","))
    elif str(compact).isdigit():
        compact = int(compact)
    cf = args.cond_from
    if cf != "auto":
        cf = int(cf)
    pt = None
    if args.plan:
        from phfpfac_tpu.compile.plan import build_plan_tables

        if set(args.plan) - set("mp"):
            raise SystemExit(f"--plan must be 'm'/'p' chars: {args.plan}")
        D, forced, d, i = shard.max_pat_len, [], 1, 0
        while d < D:
            c = args.plan[i] if i < len(args.plan) else args.plan[-1]
            if c == "p" and d + 1 < D:
                forced.append(("pair", d))
                d += 2
            else:
                forced.append(("mono", d))
                d += 1
            i += 1
        pt = build_plan_tables(
            shard, train=None if args.untrained else data[: 1 << 20],
            forced_kinds=tuple(forced),
        )
    scan = plan_count_scanner(
        shard, max_steps, tpc=args.tpc, cond_from=cf,
        train=None if args.untrained else data[: 1 << 20],
        compact=compact, pt=pt,
    )
    t_build = time.perf_counter() - t0
    dev = scan.prepare(padded, n)

    t0 = time.perf_counter()
    seed = scan.scan(dev, jnp.int32(n), jnp.int32(0))
    total = int(np.asarray(seed))
    t_compile = time.perf_counter() - t0

    if args.chain:
        K = args.chain

        def timed(k):
            out = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                r = scan.scan_chain(dev, jnp.int32(n), jnp.int32(0), k)
                _ = int(np.asarray(r))
                out.append(time.perf_counter() - t0)
            return float(np.median(out))

        t_k, t_2k = timed(K), timed(2 * K)  # first calls compile
        t_k, t_2k = timed(K), timed(2 * K)
        dt = (t_2k - t_k) / K
        print(f"[kexp] chain K={K}: T(K)={t_k*1e3:.2f} ms "
              f"T(2K)={t_2k*1e3:.2f} ms -> per-scan {dt*1e3:.2f} ms",
              flush=True)
    else:
        reps = []
        K = 8
        for _ in range(args.reps):
            s = jnp.int32(0)
            t0 = time.perf_counter()
            for _ in range(K):
                s = scan.scan(dev, jnp.int32(n), s % 2)
            _ = int(np.asarray(s))
            reps.append((time.perf_counter() - t0) / K)
        dt = float(np.median(reps))
    assert not scan.check_overflow(), "survivor cap overflow — retune"
    import os

    glue_env = os.environ.get("PHFPFAC_GLUE")  # effective, not the flag
    print(
        f"[kexp] dict={args.dict} mib={args.mib} "
        + (f"corpus={args.corpus} " if args.corpus != "text" else "")
        + f"trained={not args.untrained} "
        f"tpc={args.tpc} cf={scan.cond_from}"
        + (f" glue={glue_env}" if glue_env else "")
        + f" | {n/dt/1e9:.3f} GB/s "
        f"({dt*1e3:.2f} ms) matches={total} "
        f"build={t_build:.1f}s compile={t_compile:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
