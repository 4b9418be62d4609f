"""Driver benchmark: PFAC scan throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "GB/s", "vs_baseline": N}

Baseline: the reference's headline kernel throughput — 0.664 Gbps =
0.083 GB/s (GTX 1080, full 7,989-pattern english dictionary,
`experiment/englishdicall:22-23`; see BASELINE.md).  vs_baseline is
value / 0.083.

Measurement methodology (see bench/micro_tpu.py history): the TPU in
this rig sits behind an async tunnel where (a) repeated identical
dispatches can be elided, and (b) fetching any value costs a ~40 ms
round trip.  Honest timing therefore requires (1) every call to
depend on the previous call's device output, (2) a single value fetch
at the end, amortized over many chained calls, and (3) medians across
repeats.  Throughput counts scanned input bytes (the reference's
kernel-time metric, master_kernel.cu cudaEvent span), excluding the
one-time host->device table/corpus upload exactly as the reference's
kernel number excludes its H2D copies.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BASELINE_GBPS = 0.664 / 8  # reference headline, GB/s


def main() -> None:
    from phfpfac_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.utils.config import PfacConfig

    # full english dictionary (xaa..xad = 7,989 patterns), 16 MiB corpus
    words: list[bytes] = []
    for part in ("xaa", "xab", "xac", "xad"):
        words += open(f"/root/reference/regex_GPU_PHF/{part}", "rb").read().split()
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    cfg = PfacConfig(width=4096, num_shards=1)
    compiled = compile_patterns(pats, cfg)
    shard = compiled.shards[0]

    data = open("/root/reference/regex_GPU_PHF/1M", "rb").read() * 128
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)

    from phfpfac_tpu.ops.engine_select import best_count_scanner

    # profile-guided layout: train on the corpus head (PGO; exact
    # results for any input)
    scan = best_count_scanner(shard, max_steps, train=data[: 1 << 20])
    # one-time input staging (the reference's H2D upload, excluded from
    # its kernel-time metric the same way)
    if hasattr(scan, "prepare"):
        dev_data = scan.prepare(padded, n)
        scan_fn = scan.scan
    else:
        dev_data = jnp.asarray(padded)
        scan_fn = scan

    # chained, value-forced timing
    K = 8

    def time_scan(fn):
        reps = []
        for _ in range(5):
            s = jnp.int32(0)
            t0 = time.perf_counter()
            for _ in range(K):
                s = fn(dev_data, jnp.int32(n), s % 2)
            _ = int(np.asarray(s))
            reps.append((time.perf_counter() - t0) / K)
        return float(np.median(reps))

    seed = scan_fn(dev_data, jnp.int32(n), jnp.int32(0))
    total0 = int(np.asarray(seed))  # forces compile + execution
    dt = time_scan(scan_fn)
    # compaction ENGAGED (resolve_compact may gate "auto" off) — the
    # request alone would mislabel a plain rerun as the compacted arm;
    # read before check_overflow(), which drains the counts
    is_compacted = bool(getattr(scan, "_surv_counts", []))
    overflowed = hasattr(scan, "check_overflow") and scan.check_overflow()
    compacted_ms = dt if (is_compacted and not overflowed) else None
    import os

    if os.environ.get("PHFPFAC_BENCH_AB") == "0" and not overflowed:
        # skip the plain A/B (tight time budget); an overflow still
        # forces the plain re-time — compacted totals would be wrong
        is_compacted = False
    if is_compacted:
        # Also time the UNCOMPACTED plan and report the better number:
        # both are exact, and this guards the headline against a glue
        # whose hardware constants were never calibrated (or a cap
        # overflow, whose compacted totals are truncations).
        from phfpfac_tpu.ops.pallas_plan import plan_count_scanner

        scan2 = plan_count_scanner(
            shard, max_steps, train=data[: 1 << 20], compact="off"
        )
        dev_data = scan2.prepare(padded, n)
        total0 = int(np.asarray(scan2.scan(dev_data, jnp.int32(n),
                                           jnp.int32(0))))
        dt2 = time_scan(scan2.scan)
        dt = dt2 if overflowed else min(dt, dt2)
    gbs = n / dt / 1e9

    print(
        json.dumps(
            {
                "metric": "pfac_scan_throughput_full_english_dict_128MiB",
                "value": round(gbs, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbs / BASELINE_GBPS, 2),
                "detail": {
                    "patterns": len(pats),
                    "states": shard.state_num,
                    "input_bytes": n,
                    "matches": total0,
                    "median_scan_ms": round(dt * 1e3, 3),
                    "compacted_scan_ms": (
                        round(compacted_ms * 1e3, 3)
                        if compacted_ms is not None else None
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
