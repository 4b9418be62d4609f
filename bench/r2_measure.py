"""Unattended round-2 TPU measurement driver.

Polls for the TPU (the axon tunnel has been flapping this round); once
a device answers, runs the full round-2 measurement protocol in order,
appending one line per result to bench/r2_results.log.  Each step runs
in a SUBPROCESS so a hung tunnel or Mosaic failure can't kill the
driver; steps are skipped once their tag already appears in the log
(idempotent across restarts).

Usage: python bench/r2_measure.py [--poll-secs 120] [--once]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = "/root/repo"
LOG = os.path.join(REPO, "bench", "r2_results.log")

# (tag, argv, timeout_s) — ordered cheapest-first so early results land
# even if the tunnel dies again; big-dict compiles can take ~25 min.
# Post-diagnosis ordering (compacted english measured 70x SLOW —
# resolve_compact now gates "auto" off): breakdown diag first, then
# the plain big-dict / binary / headline numbers, refinements after.
STEPS = [
    ("bench_headline_128",
     [sys.executable, "bench.py"], 5400),
    ("binary_32_nocompact",
     [sys.executable, "bench/binary.py", "--mib", "32",
      "--tpc", "16", "--cond-from", "2"], 3600),
    ("kexp_big_8_nocompact",
     [sys.executable, "bench/kexp.py", "--dict", "big", "--mib", "8",
      "--compact", "off"], 5400),
    ("compact_diag_32",
     [sys.executable, "bench/compact_diag.py", "--mib", "32",
      "--reps", "3"], 3600),
    ("e2e_english_32",
     [sys.executable, "bench/e2e.py", "--mib", "32"], 5400),
    ("coldstart_big_8",
     [sys.executable, "bench/coldstart.py", "--dict", "big",
      "--mib", "8"], 7200),
    # the VERDICT item-1 target regime (~25 min compile)
    ("kexp_big_32_nocompact",
     [sys.executable, "bench/kexp.py", "--dict", "big", "--mib", "32",
      "--compact", "off"], 7200),
    ("glue_cal_32_d005",
     [sys.executable, "bench/glue_cal.py", "--mib", "32",
      "--density", "0.005"], 1800),
    # post-glue-fix re-measure: explicit cut engages compaction past
    # the PHFPFAC_COMPACT_AUTO gate (the 1049 ms number predates the
    # per-offset 1-D window-gather glue)
    ("kexp_english_32_compact_fix",
     [sys.executable, "bench/kexp.py", "--mib", "32",
      "--compact", "4"], 3600),
    # headline knob probe at the 128 MiB benchmark shape (tpc=32/cf=4
    # was tuned at 32 MiB; the headline sits 1.5% under the 3.5 target)
    ("kexp_english_128_tpc64",
     [sys.executable, "bench/kexp.py", "--mib", "128", "--tpc", "64",
      "--compact", "off"], 3600),
    ("kexp_english_128_tpc16",
     [sys.executable, "bench/kexp.py", "--mib", "128", "--tpc", "16",
      "--compact", "off"], 3600),
]


def tpu_up(timeout: int = 210) -> bool:
    # cold init through the tunnel after a long outage can exceed 90 s;
    # a short probe timeout would keep reporting DOWN forever
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            cwd=REPO, capture_output=True, text=True, timeout=timeout,
        )
        return r.returncode == 0 and "tpu" in r.stdout.lower()
    except subprocess.TimeoutExpired:
        return False


def done_tags() -> set:
    """Tags with a SUCCESSFUL logged result; FAILED/TIMEOUT lines do
    not count, so a tunnel flap's casualties are retried on rerun."""
    if not os.path.exists(LOG):
        return set()
    return {
        line.split("|", 1)[0].strip()
        for line in open(LOG)
        if "|" in line
        and "FAILED" not in line and "TIMEOUT" not in line
    }


def log(tag: str, text: str) -> None:
    with open(LOG, "a") as f:
        f.write(f"{tag} | {text}\n")
    print(f"[r2] {tag} | {text}", flush=True)


def run_step(tag: str, argv: list, timeout: int) -> bool:
    t0 = time.time()
    try:
        r = subprocess.run(
            argv, cwd=REPO, capture_output=True, text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        log(tag, f"TIMEOUT after {timeout}s")
        return False
    # full stdout/stderr per step (multi-line benches like compact_diag
    # report one line per piece; the log keeps only the tail)
    os.makedirs(os.path.join(REPO, "bench", "logs"), exist_ok=True)
    with open(os.path.join(REPO, "bench", "logs", f"{tag}.txt"), "w") as f:
        f.write(r.stdout + ("\n--- stderr ---\n" + r.stderr
                            if r.stderr else ""))
    tail = (r.stdout.strip().splitlines() or ["<no stdout>"])[-1]
    if r.returncode != 0:
        err = (r.stderr.strip().splitlines() or ["<no stderr>"])[-1]
        log(tag, f"FAILED rc={r.returncode} ({time.time()-t0:.0f}s): "
                 f"{tail} :: {err[:300]}")
        return False
    log(tag, f"({time.time()-t0:.0f}s) {tail}")
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poll-secs", type=int, default=120)
    ap.add_argument("--once", action="store_true",
                    help="single TPU check, no poll loop")
    args = ap.parse_args()
    # pid file so restarts can kill the EXACT previous instance
    # (pattern kills are forbidden and match shell wrappers anyway)
    with open("/tmp/r2_measure.pid", "w") as f:
        f.write(str(os.getpid()))

    fails: dict = {}  # genuine failures (TPU stayed up), cap 3
    flaps: dict = {}  # tunnel-flap casualties, cap 8 (retried freely)

    def spent(tag: str) -> bool:
        return fails.get(tag, 0) >= 3 or flaps.get(tag, 0) >= 8

    while True:
        while not tpu_up():
            print("[r2] TPU down; waiting", flush=True)
            if args.once:
                return
            time.sleep(args.poll_secs)

        print("[r2] TPU UP — running protocol", flush=True)
        done = done_tags()
        for tag, argv, timeout in STEPS:
            if tag in done or spent(tag):
                continue
            ok = run_step(tag, argv, timeout)
            if not ok:
                if tpu_up():
                    fails[tag] = fails.get(tag, 0) + 1
                else:
                    # the flap ate this step, not the step's fault —
                    # don't burn its failure budget (done_tags also
                    # retries FAILED/TIMEOUT lines on rerun)
                    flaps[tag] = flaps.get(tag, 0) + 1
                    print("[r2] TPU lost mid-protocol; resuming poll",
                          flush=True)
                    break
        else:
            remaining = [t for t, _, _ in STEPS
                         if t not in done_tags() and not spent(t)]
            if not remaining or args.once:
                print("[r2] protocol complete"
                      + (f" ({len(remaining)} unfinished)"
                         if remaining else ""), flush=True)
                return
        time.sleep(args.poll_secs)


if __name__ == "__main__":
    main()
