"""Per-step device-cost attribution for the plan kernel.

Times the chained scan with the step plan TRUNCATED at k steps, for
increasing k — the differences T(k+1)-T(k) are each step's real
device cost at the current knob settings (the vop-ledger's measured
counterpart; PERF.md "Roofline").  Count totals differ across k by
construction (shallower matches only) — this is a timing harness,
not a correctness one.

Each k is its own Mosaic compile (~16-200 s on the tunneled rig), so
pick --ks sparingly.

Usage: python bench/stepcurve.py [--dict english] [--mib 32]
         [--ks 0,2,4,6,8,10,12] [--chain 8]
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
    ap.add_argument("--tpc", type=int, default=32)
    ap.add_argument("--ks", default="0,2,4,6,8,10,12")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.pallas_plan import plan_count_scanner
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
        words = load_words(args.dict, cap32=args.dict in ("big", "full"))
        data = corpus(args.mib)
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    compiled = compile_patterns(pats, PfacConfig(width=4096, num_shards=1))
    shard = compiled.shards[0]
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)

    scan = plan_count_scanner(
        shard, max_steps, tpc=args.tpc, cond_from="auto",
        train=data[: 1 << 20], compact="off",
    )
    full_steps = scan.pt.steps
    full_cf = scan.cond_from
    dev = scan.prepare(padded, n)
    K = args.chain

    def timed(k):
        out = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = scan.scan_chain(dev, jnp.int32(n), jnp.int32(0), k)
            _ = int(np.asarray(r))
            out.append(time.perf_counter() - t0)
        return float(np.median(out))

    prev = None
    for ks in args.ks.split(","):
        k = min(int(ks), len(full_steps))
        scan.pt.steps = full_steps[:k]
        scan.cond_from = min(full_cf, max(k, 1))
        timed(K)  # compile + warm
        t_k, t_2k = timed(K), timed(2 * K)
        dt = (t_2k - t_k) / K
        d0 = full_steps[k - 1].depth0 if k else 1
        marg = "" if prev is None else f"  (+{(dt - prev) * 1e3:6.3f} ms)"
        print(f"[stepcurve] k={k:2d} depth<= {d0:2d}  per-scan "
              f"{dt * 1e3:7.3f} ms  {n / dt / 1e9:6.2f} GB/s{marg}",
              flush=True)
        prev = dt
    scan.pt.steps = full_steps
    scan.cond_from = full_cf


if __name__ == "__main__":
    main()
