"""full466k long-tail attribution (VERDICT r4 item 5).

The 466k-title dictionary holds exactly ONE pattern longer than the
32-step bitmap (a 45 B title), so the matcher's split path scans the
bulk (466,543 patterns) on the plan kernel and that single pattern on
the exact XLA engine.  This measures both pieces on the chip:

  bulk   — plan kernel over the <=32 B dictionary (the kexp number)
  tail   — turbo scan of the same corpus against the 1-pattern
           sub-dictionary (what the split path actually pays)

Run: python bench/fulltail_attrib.py [--mib 32]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=32)
    args = ap.parse_args()

    import jax.numpy as jnp
    from corpora import corpus, load_words

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.turbo_jnp import (
        build_turbo_tables,
        scan_shard_turbo,
    )
    from phfpfac_tpu.utils.config import PfacConfig

    data = corpus(args.mib)
    n = len(data)

    words = load_words("full")
    tail = [w for w in words if len(w) > 32]
    print(f"[fulltail] dict={len(words)} tail(>32B)={len(tail)} "
          f"corpus={args.mib} MiB", flush=True)

    # tail-only scan: what the split path pays for the long pattern(s)
    pats = [Pattern(i + 1, w) for i, w in enumerate(tail)]
    cfg = PfacConfig(width=256, num_shards=1)
    compiled = compile_patterns(pats, cfg)
    sh = compiled.shards[0]
    ms = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, ms)
    tt = build_turbo_tables(sh)
    dev = jnp.asarray(padded)

    import jax

    @jax.jit
    def reduced(k):
        # in-jit scalar reduce: fetching the raw count plane would
        # cost seconds of tunnel transfer and time the pipe, not the
        # scan; vary input_size per rep so repeats cannot be elided
        r = scan_shard_turbo(
            sh, dev, n - (k % 2), cfg, max_steps=ms, turbo_tables=tt,
        )
        return jnp.asarray(r[1]).sum()

    def once(k: int):
        return int(np.asarray(reduced(jnp.int32(k))))

    total = once(0)  # compile + warm
    once(1)
    reps = []
    for k in range(5):
        t0 = time.perf_counter()
        once(k)
        reps.append(time.perf_counter() - t0)
    dt = float(np.median(reps))
    print(f"[fulltail] tail-only turbo scan (dispatch+fetch): "
          f"{dt*1e3:.2f} ms ({n/dt/1e9:.2f} GB/s, matches={total})",
          flush=True)
    print("[fulltail] bulk is the kexp --dict full number; "
          "combined e2e = bulk + tail (dispatched concurrently by the "
          "matcher's split path, so wall-clock is ~max of the two)",
          flush=True)


if __name__ == "__main__":
    main()
