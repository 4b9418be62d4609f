"""Driver benchmark: PFAC scan throughput on the real TPU chip.

Prints a JSON line after EVERY regime (the last line is always the
most complete — the driver parses that one; earlier lines make the
capture survivable if the run is killed mid-way, cf. BENCH_r03
rc=124 which captured nothing):
  {"metric": "...", "value": N, "unit": "GB/s", "vs_baseline": N,
   "regimes": {...}, "elapsed_s": N}

``value`` stays the english-dictionary 128 MiB number for round-over-
round comparability; ``regimes`` adds the Snort-scale big156 dict
(32 MiB english text) and the binary-signature regime (5,000 sigs,
sigma=256, 32 MiB random bytes) so the driver's BENCH_r{N}.json
captures all three protocol regimes without hand-run logs.

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
repeats.  Round 3 moved the chain IN-JIT (scan_chain: a lax.fori_loop
of k dependent scans in ONE dispatch, per-scan = (T(2k)-T(k))/k),
because the host-side chain pays a measured ~4.7 ms per dispatch
through this tunnel — at 32 MiB that inflated 9.6 ms kernels to
14.3 ms.  Differencing cancels dispatch + fetch exactly as the
reference's cudaEvent kernel span excludes its launch overhead and
H2D copies (master_kernel.cu:400-423); the per-dispatch arm is kept
in ``dispatch_scan_ms`` as the conservative end-to-end-dispatch
number.  Throughput counts scanned input bytes, excluding the
one-time host->device table/corpus upload exactly as the reference's
kernel number excludes its H2D copies.

Env: PHFPFAC_BENCH_REGIMES comma-list subsets {english,big,binary,random}
(default all four; english always runs first); PHFPFAC_BENCH_AB=0 skips
the english plain-vs-compacted A/B under tight time budgets;
PHFPFAC_BENCH_DEADLINE per-regime SIGALRM seconds (default 1800);
PHFPFAC_BENCH_GLOBAL total budget seconds (default 2700) after which
remaining regimes are skipped, sized under the driver's external
timeout.  `python bench.py --prewarm` additionally saves AOT program
artifacts for every bench shape (utils/aot.py) so the driver's capture
run pays no client-side tracing/lowering.  SIGTERM dumps the partial
regimes line before exiting.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BASELINE_GBPS = 0.664 / 8  # reference headline, GB/s


def _time_count_scan(scan, dev_data, n, *, reps: int = 5, k: int = 8):
    """Chained, value-forced median seconds per scan (includes the
    host/tunnel per-dispatch cost — kept as the conservative arm)."""
    import jax.numpy as jnp

    out = []
    for _ in range(reps):
        s = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(k):
            s = scan(dev_data, jnp.int32(n), s % 2)
        _ = int(np.asarray(s))
        out.append((time.perf_counter() - t0) / k)
    return float(np.median(out))


def _time_chain(sc, dev_data, n, *, samples: int = 3, k: int = 8):
    """Device-only seconds per scan via in-jit chaining.

    One dispatch runs ``k`` dependent scans (PlanCountScan.scan_chain,
    a lax.fori_loop whose shift parity depends on the previous total);
    (T(2k) - T(k)) / k cancels dispatch and fetch costs exactly as the
    reference's cudaEvent kernel span excludes its launch overhead
    (master_kernel.cu:400-423).  Returns None when the scanner has no
    chain support (non-plan engines).

    ``samples`` INDEPENDENT difference estimates are taken and the
    median reported, with each T(k)/T(2k) point the MIN of two runs
    (device time is a floor; tunnel congestion only ever adds) — the
    r4 headline rode single-run tunnel weather across a ±10% band
    (VERDICT r5 item 7); the within-process spread of this estimator
    is a few % at 128 MiB."""
    import jax.numpy as jnp

    if not hasattr(sc, "scan_chain"):
        return None

    def one(kk):
        t0 = time.perf_counter()
        r = sc.scan_chain(dev_data, jnp.int32(n), jnp.int32(0), kk)
        _ = int(np.asarray(r))
        return time.perf_counter() - t0

    one(k), one(2 * k)  # compile both shapes
    ests = []
    for _ in range(samples):
        tk = min(one(k), one(k))
        t2k = min(one(2 * k), one(2 * k))
        ests.append((t2k - tk) / k)
    return float(np.median(ests))


def _best_time(sc, dev_data, n, dt_dispatch):
    """min(dispatch-chained, in-jit-chained) seconds per scan — the
    chained arm is the honest kernel-only number; the dispatch arm
    caps it in case chaining misbehaves (overflow drains discard it).

    Returns (seconds, chain_error_or_None): a broken chain path must
    surface in the JSON (VERDICT r3 weak #4), not silently degrade the
    headline to the dispatch arm."""
    try:
        dt_dev = _time_chain(sc, dev_data, n)
        if dt_dev is not None and (
            not hasattr(sc, "check_overflow") or not sc.check_overflow()
        ):
            return min(dt_dispatch, dt_dev), None
        err = "chain overflowed survivor cap" if dt_dev is not None else None
    except Exception as e:
        err = f"{type(e).__name__}: {e}"
    return dt_dispatch, err


def _finish(scan, dev, n, dt, extra: dict) -> dict:
    """Common regime tail: best-of(dispatch, in-jit chain) + fields."""
    dt_disp, (dt, chain_err) = dt, _best_time(scan, dev, n, dt)
    out = {
        "gbs": round(n / dt / 1e9, 4),
        **extra,
        "median_scan_ms": round(dt * 1e3, 3),
        "dispatch_scan_ms": round(dt_disp * 1e3, 3),
    }
    if chain_err:
        out["chain_error"] = chain_err
    return out


def _compile_shard(pats, width: int = 4096):
    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.utils.config import PfacConfig

    compiled = compile_patterns(pats, PfacConfig(width=width, num_shards=1))
    return compiled, compiled.shards[0]


def bench_english() -> dict:
    import jax.numpy as jnp

    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.engine_select import best_count_scanner

    words: list[bytes] = []
    for part in ("xaa", "xab", "xac", "xad"):
        words += open(
            f"/root/reference/regex_GPU_PHF/{part}", "rb"
        ).read().split()
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    compiled, shard = _compile_shard(pats)

    data = open("/root/reference/regex_GPU_PHF/1M", "rb").read() * 128
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)

    # profile-guided layout: train on the corpus head (PGO; exact
    # results for any input).  tpc=64 + multi-plane staging: the r5
    # optimum under fused windows (bench/r5_results.log: 32 MiB
    # 6.81 -> 5.86 ms; 128 MiB 5.57 GB/s)
    scan = best_count_scanner(shard, max_steps, train=data[: 1 << 20],
                              tpc=64, multiplane=True)
    # one-time input staging (the reference's H2D upload, excluded from
    # its kernel-time metric the same way)
    if hasattr(scan, "prepare"):
        dev_data = scan.prepare(padded, n)
        scan_fn = scan.scan
    else:
        dev_data = jnp.asarray(padded)
        scan_fn = scan

    seed = scan_fn(dev_data, jnp.int32(n), jnp.int32(0))
    total0 = int(np.asarray(seed))  # forces compile + execution
    dt = _time_count_scan(scan_fn, dev_data, n)
    # compaction ENGAGED (resolve_compact may gate "auto" off) — the
    # request alone would mislabel a plain rerun as the compacted arm;
    # read before check_overflow(), which drains the counts
    is_compacted = bool(getattr(scan, "_surv_counts", []))
    overflowed = hasattr(scan, "check_overflow") and scan.check_overflow()
    compacted_ms = dt if (is_compacted and not overflowed) else None

    if os.environ.get("PHFPFAC_BENCH_AB") == "0" and not overflowed:
        # skip the plain A/B (tight time budget); an overflow still
        # forces the plain re-time — compacted totals would be wrong
        is_compacted = False
    final_sc = scan
    if is_compacted:
        # Also time the UNCOMPACTED plan and report the better number:
        # both are exact, and this guards the headline against a cap
        # overflow (whose compacted totals are truncations) or an
        # uncalibrated compaction constant.
        from phfpfac_tpu.ops.pallas_plan import plan_count_scanner

        scan2 = plan_count_scanner(
            shard, max_steps, train=data[: 1 << 20], compact="off",
            tpc=64, multiplane=True,
        )
        dev_data = scan2.prepare(padded, n)
        total0 = int(np.asarray(scan2.scan(dev_data, jnp.int32(n),
                                           jnp.int32(0))))
        dt2 = _time_count_scan(scan2.scan, dev_data, n)
        if overflowed or dt2 < dt:
            dt, final_sc = dt2, scan2
    dt_disp, (dt, chain_err) = dt, _best_time(final_sc, dev_data, n, dt)
    gbs = n / dt / 1e9
    out = {
        "gbs": round(gbs, 4),
        "patterns": len(pats),
        "states": shard.state_num,
        "input_bytes": n,
        "matches": total0,
        "median_scan_ms": round(dt * 1e3, 3),
        "dispatch_scan_ms": round(dt_disp * 1e3, 3),
        "compacted_scan_ms": (
            round(compacted_ms * 1e3, 3) if compacted_ms is not None
            else None
        ),
    }
    if chain_err:
        out["chain_error"] = chain_err
    return out


def bench_big156() -> dict:
    """Snort-scale regime: 156k wikipedia titles (<=32 B bulk), 32 MiB
    english text — kexp's single-kernel protocol at the quoted size."""
    import jax.numpy as jnp

    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.pallas_plan import plan_count_scanner

    sys.path.insert(0, "/root/repo/bench")
    from corpora import corpus, load_words

    words = load_words("big", cap32=True)
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    compiled, shard = _compile_shard(pats)

    data = corpus(32)
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)
    # tpc=64 + multi-plane staging: r5 optimum (7.93 -> 5.84 ms)
    scan = plan_count_scanner(shard, max_steps, train=data[: 1 << 20],
                              tpc=64, multiplane=True)
    dev = scan.prepare(padded, n)
    total = int(np.asarray(scan.scan(dev, jnp.int32(n), jnp.int32(0))))
    dt = _time_count_scan(scan.scan, dev, n)
    if scan.check_overflow():
        scan = plan_count_scanner(
            shard, max_steps, train=data[: 1 << 20], compact="off",
            tpc=64, multiplane=True,
        )
        dev = scan.prepare(padded, n)
        total = int(np.asarray(scan.scan(dev, jnp.int32(n), jnp.int32(0))))
        dt = _time_count_scan(scan.scan, dev, n)
    return _finish(scan, dev, n, dt, {
        "patterns": len(pats), "states": shard.state_num,
        "input_bytes": n, "matches": total,
    })


def bench_binary() -> dict:
    """Early-death regime: 5,000 ClamAV-style byte signatures over
    32 MiB random bytes (sigma=256 mono path)."""
    import jax.numpy as jnp

    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.pallas_plan import plan_count_scanner

    sys.path.insert(0, "/root/repo/bench")
    from binary import make_signatures

    sigs = make_signatures(5000)
    pats = [Pattern(i + 1, s) for i, s in enumerate(sigs)]
    compiled, shard = _compile_shard(pats)

    rng = np.random.default_rng(1)
    data = bytearray(rng.integers(0, 256, 32 << 20, dtype=np.uint8).tobytes())
    for i in range(0, len(data) - 64, 1 << 18):  # plant some signatures
        s = sigs[i % len(sigs)]
        data[i : i + len(s)] = s
    data = bytes(data)
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)
    # tpc=16 / cond_from=3: measured optimum for the sigma=256 regime
    # (r4 re-sweep, bench/r4_results.log: 18.9 ms vs 19.3-19.8 at
    # tpc=8, 21.9 at tpc=32, 49.7 at cf=2 — smaller cells let the
    # post-depth-4 conds skip; tpc=16 re-won under the one-pred
    # mono-first kernels)
    scan = plan_count_scanner(
        shard, max_steps, train=data[: 1 << 20], tpc=16, cond_from=3,
        multiplane=True,  # r5: 16.70 -> 16.43 ms with s0x
    )
    dev = scan.prepare(padded, n)
    total = int(np.asarray(scan.scan(dev, jnp.int32(n), jnp.int32(0))))
    dt = _time_count_scan(scan.scan, dev, n)
    if scan.check_overflow():
        scan = plan_count_scanner(
            shard, max_steps, train=data[: 1 << 20], compact="off",
            tpc=16, cond_from=3, multiplane=True,
        )
        dev = scan.prepare(padded, n)
        total = int(np.asarray(scan.scan(dev, jnp.int32(n), jnp.int32(0))))
        dt = _time_count_scan(scan.scan, dev, n)
    return _finish(scan, dev, n, dt, {
        "signatures": len(sigs), "states": shard.state_num,
        "input_bytes": n, "matches": total,
    })


def bench_full466k() -> dict:
    """Wikipedia-scale regime: all 466k titles (the one >32 B title
    rides the split path's exact engine in e2e; this times the <=32 B
    bulk on the plan kernel — the capped 32-step protocol, r5 optimum
    tpc=32 + multi-plane: 11.57 ms = 2.90 GB/s)."""
    import jax.numpy as jnp

    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.pallas_plan import plan_count_scanner

    sys.path.insert(0, "/root/repo/bench")
    from corpora import corpus, load_words

    words = load_words("full", cap32=True)
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    compiled, shard = _compile_shard(pats)

    data = corpus(32)
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)
    scan = plan_count_scanner(shard, max_steps, train=data[: 1 << 20],
                              multiplane=True)
    dev = scan.prepare(padded, n)
    total = int(np.asarray(scan.scan(dev, jnp.int32(n), jnp.int32(0))))
    dt = _time_count_scan(scan.scan, dev, n)
    return _finish(scan, dev, n, dt, {
        "patterns": len(pats), "states": shard.state_num,
        "input_bytes": n, "matches": total,
    })


def bench_random() -> dict:
    """Clean-traffic regime: the full english dictionary over 32 MiB
    uniform random bytes.  Walkers die at depth 1-2 — but measured
    2.75 GB/s (r3b), NOT the 10-15 the round-2 roofline guessed for
    early death: training on uniform bytes makes EVERY class hot
    (full-width hot spans at the shallow steps), and with 32k-walker
    cells the conded steps keep firing while any walker lives.  The
    regime pins the clean-traffic end of the rate range on the same
    tables as the headline (the reference's kernel has the same
    workload dependence: master_kernel.cu:49-72 threads die at their
    own depth); narrow-dictionary prologue-bound rates are measured
    separately (kexp --head, PERF.md)."""
    import jax.numpy as jnp

    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps
    from phfpfac_tpu.ops.pallas_plan import plan_count_scanner

    sys.path.insert(0, "/root/repo/bench")
    from corpora import load_words

    words = load_words("english")
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    compiled, shard = _compile_shard(pats)

    data = np.random.default_rng(3).integers(
        0, 256, 32 << 20, dtype=np.uint8
    ).tobytes()
    n = len(data)
    max_steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, max_steps)
    scan = plan_count_scanner(shard, max_steps, train=data[: 1 << 20],
                              multiplane=True)
    dev = scan.prepare(padded, n)
    total = int(np.asarray(scan.scan(dev, jnp.int32(n), jnp.int32(0))))
    dt = _time_count_scan(scan.scan, dev, n)
    if scan.check_overflow():
        scan = plan_count_scanner(
            shard, max_steps, train=data[: 1 << 20], compact="off",
            multiplane=True,
        )
        dev = scan.prepare(padded, n)
        total = int(np.asarray(scan.scan(dev, jnp.int32(n), jnp.int32(0))))
        dt = _time_count_scan(scan.scan, dev, n)
    return _finish(scan, dev, n, dt, {
        "patterns": len(pats), "input_bytes": n, "matches": total,
    })


def main() -> None:
    from phfpfac_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    if "--prewarm" in sys.argv:
        # pre-save AOT artifacts (+ warm the persistent XLA cache) for
        # every bench shape, so a later capture run pays no client-side
        # trace/lowering; run once per round after kernel changes
        os.environ["PHFPFAC_AOT_SAVE"] = "1"

    want = os.environ.get(
        "PHFPFAC_BENCH_REGIMES", "english,big,binary,random,full"
    ).split(",")
    runners = {
        "english": bench_english, "big": bench_big156,
        "binary": bench_binary, "random": bench_random,
        "full": bench_full466k,
    }
    # english runs FIRST regardless of env order: it is the headline
    # the driver records, and it must be on stdout before anything can
    # time out (BENCH_r03 was rc=124 with ZERO output — never again)
    want = sorted(
        (w.strip() for w in want if w.strip() in runners),
        key=lambda w: w != "english",
    )

    # Two deadlines guard the capture:
    #  * per-regime SIGALRM (PHFPFAC_BENCH_DEADLINE): the axon tunnel
    #    occasionally stalls mid-compute (observed r2/r3 — a dispatched
    #    program never returns, client burns no CPU); turns a would-be
    #    global hang into one regime's error entry
    #  * global budget (PHFPFAC_BENCH_GLOBAL): the driver runs bench.py
    #    under an external `timeout` whose window r3 exceeded (rc=124,
    #    all output lost); once the budget is spent, remaining regimes
    #    are SKIPPED rather than risking the kill
    import signal

    deadline = int(os.environ.get("PHFPFAC_BENCH_DEADLINE", "1800"))
    global_budget = int(os.environ.get("PHFPFAC_BENCH_GLOBAL", "2700"))
    t0 = time.time()

    def remaining() -> float:
        return global_budget - (time.time() - t0)

    regimes: dict = {}

    def emit(partial: bool = False) -> None:
        """Print the full JSON line NOW (flushed).  Called after every
        regime and from the SIGTERM handler: the driver parses the last
        line of stdout, so each emit supersedes the previous one and a
        kill at any point still captures everything finished so far."""
        eng = regimes.get("english", {})
        gbs = eng.get("gbs", 0.0)
        rec = {
            "metric": "pfac_scan_throughput_full_english_dict_128MiB",
            "value": gbs,
            "unit": "GB/s",
            "vs_baseline": round(gbs / BASELINE_GBPS, 2),
            "detail": eng,
            "regimes": regimes,
            "elapsed_s": round(time.time() - t0, 1),
        }
        if partial:
            rec["partial"] = True
        print(json.dumps(rec), flush=True)

    def on_term(signum, frame):
        regimes["_killed"] = f"signal {signum} at {time.time() - t0:.0f}s"
        emit(partial=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)

    def run_with_deadline(fn, budget: int):
        def handler(signum, frame):
            raise TimeoutError(f"regime exceeded {budget}s (tunnel stall?)")

        old = signal.signal(signal.SIGALRM, handler)
        signal.alarm(budget)
        try:
            return fn()
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    for name in want:
        left = remaining()
        if name != "english" and left < 180:
            regimes[name] = {"skipped": f"global budget spent "
                             f"({global_budget}s)"}
            emit()
            continue
        # english always gets the full per-regime deadline — losing the
        # headline to the global budget would defeat the point
        budget = deadline if name == "english" else int(
            min(deadline, max(120, left - 60))
        )
        try:
            regimes[name] = run_with_deadline(runners[name], budget)
        except Exception as e:  # a broken side regime must not kill
            regimes[name] = {"error": f"{type(e).__name__}: {e}"}
        emit()

    # the tunnel's stall mode can be transient WITHIN a run (observed
    # r5: a stalled english deadline while a later window was fine) —
    # if the headline regime errored and budget remains, retry it once
    if "error" in regimes.get("english", {}) and remaining() > 300:
        try:
            regimes["english"] = run_with_deadline(
                bench_english, int(min(deadline, remaining() - 60))
            )
            regimes["english"]["retried"] = True
        except Exception as e:
            regimes["english"]["retry_error"] = f"{type(e).__name__}: {e}"
        emit()


if __name__ == "__main__":
    main()
