"""Binary-alphabet (sigma=256) signature-scan benchmark.

The reference kernel is byte-agnostic (master_kernel.cu:52-54:
``key = (state << 8) + c``), and the realistic NIDS workload is
ClamAV-style hex signatures over binary payloads.  This measures the
plan engine's mono-only sigma=256 path (compile/plan.py) on a
synthetic signature dictionary over random-byte traffic, with the
same chained-dispatch methodology as bench.py.

Run: python bench/binary.py [--sigs 5000] [--mib 32]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from phfpfac_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def make_signatures(n_sigs: int, seed: int = 7) -> list[bytes]:
    """ClamAV-style byte signatures: 8-32 random bytes each (hex
    signatures decode to raw byte strings; reference corpus analog:
    bytefile/ inputs)."""
    rng = np.random.default_rng(seed)
    sigs = set()
    while len(sigs) < n_sigs:
        ln = int(rng.integers(8, 33))
        sigs.add(bytes(rng.integers(0, 256, ln, dtype=np.uint8)))
    return sorted(sigs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigs", type=int, default=5000)
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--engine", default="plan", choices=["plan", "depth"])
    ap.add_argument("--tpc", type=int, default=32)
    ap.add_argument("--cond-from", type=int, default=4)
    args = ap.parse_args()

    import jax.numpy as jnp

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.utils.config import PfacConfig

    sigs = make_signatures(args.sigs)
    pats = [Pattern(i + 1, s) for i, s in enumerate(sigs)]
    cfg = PfacConfig(width=4096, num_shards=1)
    compiled = compile_patterns(pats, cfg)
    shard = compiled.shards[0]

    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, args.mib << 20, dtype=np.uint8).tobytes()
    # plant some signatures so the scan isn't trivially all-miss
    planted = 0
    buf = bytearray(data)
    for i in range(0, len(buf) - 64, 1 << 18):
        s = sigs[i % len(sigs)]
        buf[i : i + len(s)] = s
        planted += 1
    data = bytes(buf)
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)

    t0 = time.perf_counter()
    if args.engine == "plan":
        from phfpfac_tpu.ops.pallas_plan import plan_count_scanner

        scan = plan_count_scanner(
            shard, max_steps, train=data[: 1 << 20], tpc=args.tpc,
            cond_from=args.cond_from,
        )
    else:
        from phfpfac_tpu.ops.pallas_depth import depth_count_scanner

        scan = depth_count_scanner(shard, max_steps)
    t_build = time.perf_counter() - t0
    dev = scan.prepare(padded, n)

    seed_v = scan.scan(dev, jnp.int32(n), jnp.int32(0))
    total = int(np.asarray(seed_v))

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
    if hasattr(scan, "check_overflow"):
        assert not scan.check_overflow(), "survivor cap overflow — retune"
    import json

    print(json.dumps({
        "metric": "pfac_scan_throughput_binary_signatures",
        "value": round(n / dt / 1e9, 4),
        "unit": "GB/s",
        "detail": {
            "signatures": len(sigs), "states": shard.state_num,
            "engine": args.engine, "input_bytes": n,
            "tpc": args.tpc, "cond_from": args.cond_from,
            "matches": total, "planted": planted,
            "median_scan_ms": round(dt * 1e3, 3),
            "build_s": round(t_build, 1),
        },
    }))


if __name__ == "__main__":
    main()
