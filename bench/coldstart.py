"""Fresh-process start-to-first-byte at Snort scale (warm disk caches).

The reference pays zero startup compile (nvcc bakes the kernel at
build time; a run only reads tables).  Here a fresh process pays
(a) compiled-dictionary load (.npz), (b) host table derivation (trie +
plan tables), and (c) XLA/Mosaic executable load from the persistent
compile cache.  VERDICT round-1 item 7 target: < 30 s to the first
scanned byte on the 156k-title dictionary with warm on-disk caches.

Phase 0 (untimed, idempotent) compiles + saves the dictionary and
warms the compile cache with one scan at the benchmark shape.  Phase 1
re-executes THIS script in a fresh interpreter with --timed, which
prints the timed breakdown; the parent relays it.

Usage: python bench/coldstart.py [--dict big|english] [--mib 8]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from corpora import corpus, load_words

SAVE = "/tmp/phfpfac_coldstart_{name}.npz"


def timed_run(name: str, mib: float) -> None:
    """The measured path: everything from interpreter start counts."""
    t0 = time.perf_counter()
    from phfpfac_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from phfpfac_tpu.compile.tables import CompiledDictionary
    from phfpfac_tpu.parallel.matcher import Matcher
    from phfpfac_tpu.utils.config import PfacConfig

    t_imp = time.perf_counter()
    compiled = CompiledDictionary.load(SAVE.format(name=name))
    t_load = time.perf_counter()
    _ = jax.devices()  # force backend init (axon tunnel discovery)
    t_dev = time.perf_counter()
    data = corpus(mib)
    cfg = PfacConfig(
        width=4096, num_shards=1, truncation="none",
        interpret=jax.default_backend() != "tpu",
    )
    m = Matcher(compiled, cfg, engine="pallas", train=data[: 1 << 20])
    got = m.match(data)
    t_first = time.perf_counter()
    print(
        f"coldstart {name} {mib}MiB: {t_first - t0:.1f} s to first "
        f"result ({len(got)} matches; import {t_imp - t0:.1f}, "
        f"dict load {t_load - t_imp:.1f}, backend init "
        f"{t_dev - t_load:.1f}, tables+compile+scan "
        f"{t_first - t_dev:.1f})"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dict", default="big", choices=["big", "english"])
    ap.add_argument("--mib", type=float, default=8)
    ap.add_argument("--timed", action="store_true")
    args = ap.parse_args()

    if args.timed:
        timed_run(args.dict, args.mib)
        return

    # ---- phase 0: build artifacts + warm caches (untimed) -----------
    # AOT-export the scan programs (utils/aot.py): the timed fresh
    # process then deserializes StableHLO instead of re-tracing and
    # re-lowering the widest Mosaic kernels (minutes of CPU at Snort
    # scale even with a warm executable cache)
    os.environ["PHFPFAC_AOT_SAVE"] = "1"
    from phfpfac_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from phfpfac_tpu.compile.tables import CompiledDictionary, \
        compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.parallel.matcher import Matcher
    from phfpfac_tpu.utils.config import PfacConfig

    save = SAVE.format(name=args.dict)
    data = corpus(args.mib)
    cfg = PfacConfig(
        width=4096, num_shards=1, truncation="none",
        interpret=jax.default_backend() != "tpu",
    )
    if not os.path.exists(save):
        pats = [
            Pattern(i + 1, w)
            for i, w in enumerate(load_words(args.dict))
        ]
        compiled = compile_patterns(pats, cfg)
    else:
        compiled = CompiledDictionary.load(save)
    m = Matcher(compiled, cfg, engine="pallas", train=data[: 1 << 20])
    _ = m.match(data)  # warms the persistent compile cache
    if compiled.plan_tables is None:
        # save format v3 (built plan tables ride along): the timed
        # fresh process skips the trie + plan build
        compiled.plan_tables = m.built_plan_tables()
        compiled.save(save)
    del m, compiled

    # ---- phase 1: fresh interpreter, timed ---------------------------
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--dict", args.dict,
         "--mib", str(args.mib), "--timed"],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600,
    )
    sys.stdout.write(r.stdout)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-2000:])
        sys.exit(r.returncode)


if __name__ == "__main__":
    main()
