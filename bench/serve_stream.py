"""Sustained-serving benchmark: GB/s over a >= 1 GiB stream
(VERDICT r4 item 6).

Two serving shapes, both AOT/compile-warm with resolve overlapped:

* ``stream``: StreamMatcher.feed_async — chunks arrive from the HOST
  (the realistic ingest path).  A deque keeps ``--depth`` resolvers
  outstanding so chunk i+1's staging+scan overlaps chunk i's download
  +decode.  On this rig the host->device corpus upload rides the
  ~25 MB/s tunnel, which caps the number regardless of engine (PERF.md
  round-3 item 6); on attached hardware the same path runs at PCIe/ICI
  rates.  The per-phase attribution separates framework time from
  tunnel time so both stories are in the log.
* ``device``: Matcher.match_chunked(device_data=...) over a corpus
  staged ONCE — the upload-free serving mode (corpus already resident,
  e.g. a scan service over device-cached content).  This is the
  sustained number the kernel actually bounds.

Regimes: ``binary`` (5,000 ClamAV-style signatures over random bytes
with planted sigs — IDS-like, low match density) and ``english`` (the
full english dictionary over english text — the pathological
match-dense end).

Usage: python bench/serve_stream.py [--gib 1] [--chunk-mib 16]
         [--depth 3] [--regime binary|english|both] [--arm both]
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


def build(regime: str):
    from binary import make_signatures

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.utils.config import PfacConfig

    if regime == "binary":
        sigs = make_signatures(5000)
        pats = [Pattern(i + 1, s) for i, s in enumerate(sigs)]
    else:
        words: list[bytes] = []
        for part in ("xaa", "xab", "xac", "xad"):
            words += open(
                f"/root/reference/regex_GPU_PHF/{part}", "rb"
            ).read().split()
        pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    cfg = PfacConfig(width=4096, num_shards=1)
    return compile_patterns(pats, cfg), cfg


def make_corpus(regime: str, gib: float) -> bytes:
    n = int(gib * (1 << 30))
    if regime == "binary":
        from binary import make_signatures

        rng = np.random.default_rng(7)
        data = bytearray(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        sigs = make_signatures(5000)
        for i in range(0, n - 64, 1 << 20):  # ~1 sig/MiB planted
            s = sigs[i % len(sigs)]
            data[i : i + len(s)] = s
        return bytes(data)
    base = open("/root/reference/regex_GPU_PHF/1M", "rb").read()
    reps = -(-n // len(base))
    return (base * reps)[:n]


def run_stream(regime: str, gib: float, chunk_mib: int, depth: int) -> dict:
    """Host-fed stream through StreamMatcher.feed_async."""
    from phfpfac_tpu.parallel.stream import StreamMatcher

    compiled, cfg = build(regime)
    data = make_corpus(regime, gib)
    chunk = chunk_mib << 20
    sm = StreamMatcher(compiled, cfg, engine="pallas")
    # train on the head (profile-guided layout) happens inside the
    # matcher on first scan; warm both window shapes (first feed has
    # no tail) before timing
    warm = StreamMatcher(compiled, cfg, engine="pallas")
    for off in (0, chunk):
        warm.feed(data[off : off + chunk])

    t0 = time.perf_counter()
    feed_s = 0.0
    pending: list = []
    total_matches = 0
    n_chunks = len(data) // chunk
    for ci in range(n_chunks):
        f0 = time.perf_counter()
        r = sm.feed_async(data[ci * chunk : (ci + 1) * chunk])
        feed_s += time.perf_counter() - f0
        pending.append(r)
        if len(pending) > depth:
            total_matches += len(pending.pop(0)())
    for r in pending:
        total_matches += len(r())
    dt = time.perf_counter() - t0
    nbytes = n_chunks * chunk
    return {
        "arm": "stream", "regime": regime,
        "gbs": round(nbytes / dt / 1e9, 4),
        "bytes": nbytes, "seconds": round(dt, 2),
        "matches": int(total_matches),
        "feed_dispatch_s": round(feed_s, 2),
        "chunk_mib": chunk_mib, "depth": depth,
    }


def run_device(regime: str, gib: float, chunk_mib: int) -> dict:
    """Upload-free sustained scan over a device-staged corpus."""
    from phfpfac_tpu.parallel.matcher import Matcher

    compiled, cfg = build(regime)
    # stage in device-RAM-bounded pieces: a staged GiB costs 4 GiB of
    # HBM as int32 pair symbols, so sustain by cycling a 256 MiB
    # resident window over the logical stream length
    piece = 256 << 20
    data = make_corpus(regime, min(gib, piece / (1 << 30)))
    piece = min(piece, len(data))
    m = Matcher(compiled, cfg, engine="pallas", train=data[: 1 << 20])
    dev = m.stage_for_chunked(data[:piece], chunk_bytes=chunk_mib << 20)
    # warm
    _ = m.match_chunked(
        data[:piece], chunk_bytes=chunk_mib << 20, device_data=dev
    )
    reps = max(1, int(gib * (1 << 30)) // piece)
    t0 = time.perf_counter()
    total = 0
    for _ in range(reps):
        out = m.match_chunked(
            data[:piece], chunk_bytes=chunk_mib << 20, device_data=dev
        )
        total += len(out)
    dt = time.perf_counter() - t0
    nbytes = reps * piece
    return {
        "arm": "device", "regime": regime,
        "gbs": round(nbytes / dt / 1e9, 4),
        "bytes": nbytes, "seconds": round(dt, 2), "matches": int(total),
        "chunk_mib": chunk_mib,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gib", type=float, default=1.0)
    ap.add_argument("--chunk-mib", type=int, default=16)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--regime", default="binary",
                    choices=["binary", "english", "both"])
    ap.add_argument("--arm", default="both",
                    choices=["stream", "device", "both"])
    args = ap.parse_args()
    import json

    regimes = (
        ["binary", "english"] if args.regime == "both" else [args.regime]
    )
    for regime in regimes:
        if args.arm in ("device", "both"):
            print(json.dumps(run_device(regime, args.gib, args.chunk_mib)),
                  flush=True)
        if args.arm in ("stream", "both"):
            print(json.dumps(
                run_stream(regime, args.gib, args.chunk_mib, args.depth)
            ), flush=True)


if __name__ == "__main__":
    main()
