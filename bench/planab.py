"""Plan-choice A/B: DP-chosen steps vs a forced step-kind list.

The r3b stepcurve (bench/stepcurve.py, logs/r3b_random_stepcurve.txt)
measured english's three unconditional PAIR steps (d7-12) at
~1.40 ms each vs ~0.58 ms for the deep mono steps — ~40 vs ~17
vops/tile — suggesting the DP's fixed-cost calibration
(_FIX_MONO/_FIX_PAIR = 60) undersells mono at the hot-span-heavy
depths.  This harness times the DP plan against forced alternatives
on the real chip.

Usage: python bench/planab.py [--dict english] [--mib 32]
         [--mono-through 12] [--chain 8]
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
                    choices=["english", "big", "binary"])
    ap.add_argument("--tpc", type=int, default=32)
    ap.add_argument("--mono-through", type=int, default=12,
                    help="force mono steps for depths <= N, keep the "
                         "DP's choices beyond")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from phfpfac_tpu.compile.plan import build_plan_tables
    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.pallas_plan import (
        plan_count_scanner,
        resolve_cond_from,
    )
    from phfpfac_tpu.utils.config import PfacConfig

    from corpora import corpus, load_words

    if args.dict == "binary":
        from binary import make_signatures

        words = make_signatures(5000)
        rng = np.random.default_rng(1)
        buf = bytearray(rng.integers(
            0, 256, args.mib << 20, dtype=np.uint8).tobytes())
        for i in range(0, len(buf) - 64, 1 << 18):
            s = words[i % len(words)]
            buf[i:i + len(s)] = s
        data = bytes(buf)
    else:
        words = load_words(args.dict, cap32=args.dict == "big")
        data = corpus(args.mib)
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    compiled = compile_patterns(pats, PfacConfig(width=4096, num_shards=1))
    shard = compiled.shards[0]
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)
    train = data[: 1 << 20]

    scan = plan_count_scanner(
        shard, max_steps, tpc=args.tpc, cond_from="auto",
        train=train, compact="off",
    )
    dev = scan.prepare(padded, n)
    K = args.chain

    def describe(pt):
        return " ".join(
            f"{'M' if sp.kind == 'mono' else 'P'}{sp.depth0}"
            f":{sp.nb}b(h{sp.hot_nb})"
            + (f"+{sp.s_nb}s" if sp.kind == "pair" else "")
            for sp in pt.steps
        )

    def timed(k):
        out = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = scan.scan_chain(dev, jnp.int32(n), jnp.int32(0), k)
            _ = int(np.asarray(r))
            out.append(time.perf_counter() - t0)
        return float(np.median(out))

    def run(tag):
        total = int(np.asarray(scan.scan(dev, jnp.int32(n), jnp.int32(0))))
        timed(K), timed(2 * K)
        t_k, t_2k = timed(K), timed(2 * K)
        dt = (t_2k - t_k) / K
        print(f"[planab] {tag}: {dt*1e3:7.3f} ms  {n/dt/1e9:6.3f} GB/s "
              f"matches={total} cf={scan.cond_from}", flush=True)
        print(f"         {describe(scan.pt)}", flush=True)
        return total

    base_total = run("DP plan      ")

    # forced variant: the plan's OWN kind list (pt.kinds — depths are
    # 0-based there, StepSpec.depth0 = d + 1; pair entries carry the
    # nibble choice as a third field) with pairs split to mono through
    # depth N
    forced = []
    for e in scan.pt.kinds:
        k, d = e[0], e[1]
        if k == "pair" and d + 1 <= args.mono_through:
            forced.append(("mono", d))
            forced.append(("mono", d + 1))
        else:
            forced.append(tuple(e))
    pt2 = build_plan_tables(
        shard, train=train, forced_kinds=tuple(forced))
    scan.pt = pt2
    scan.cond_from = resolve_cond_from(pt2, "auto")
    scan._p0 = jnp.asarray(pt2.p0_banks)
    scan._m = jnp.asarray(pt2.packed_banks)
    scan._s = jnp.asarray(pt2.side_banks)
    forced_total = run(f"mono<={args.mono_through}")
    assert forced_total == base_total, (forced_total, base_total)
    print("[planab] totals identical", flush=True)


if __name__ == "__main__":
    main()
