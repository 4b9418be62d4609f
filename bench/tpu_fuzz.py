"""Compiled-TPU differential soak (real Mosaic kernels vs oracle).

The pytest fuzz (tests/test_fuzz.py) runs interpret-mode on the CPU
mesh, which checks semantics but not Mosaic compilation.  This soak
compiles the real kernels per seed on the TPU and diffs the full
Matcher against the Aho-Corasick oracle — the hardware counterpart of
the suite (r2 ran 45/75-seed soaks; rerun after any kernel change,
e.g. r3's one-shot early-exit pred).

Usage: python bench/tpu_fuzz.py [--seeds 15] [--start 100] [--segment]
                                [--charset]

``--segment`` runs the reference's segment+halo walk-truncation mode
(small 512 B segments + 64 B halos force the in-kernel positional cut
on nearly every walk) instead of exact mode — the CPU suite fuzzes
this path in interpret mode; this arm compiles the real Mosaic
segment kernels on the chip.

``--charset`` fuzzes random CLASS dictionaries ([a-z] ranges, [^...]
negations, \\xNN escapes, multi-member classes, duplicate patterns)
through the full charset frontend (NFA->DFA->DAG leveling,
frontend/charset.py rebuilding charset_table_reorder.c:321-427) and
the real compiled Mosaic kernels vs the charset oracle — the one
correctness surface r4 had never run through hardware compilation
(VERDICT r4 item 4).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from phfpfac_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def _class_dict_and_corpus(seed: int):
    """Random class-pattern dictionary + corpus for one seed."""
    import numpy as np

    rng = np.random.default_rng(seed)
    flavor = seed % 3
    if flavor == 0:  # narrow printable band, heavy range overlap
        lo, hi = 97, 115
    elif flavor == 1:  # full lowercase + digits
        lo, hi = 48, 123
    else:  # full binary (escape syntax, negated classes over 0x00/0xff)
        lo, hi = 0, 256
    pats = []
    n_pats = int(rng.integers(4, 24))
    for i in range(n_pats):
        n = int(rng.integers(1, 6))
        spec = b""
        for _ in range(n):
            r = rng.random()
            b = int(rng.integers(lo, hi))
            if r < 0.30:  # range class
                span = int(rng.integers(1, 6))
                a = min(b, hi - 1 - span)
                spec += b"[" + _esc(a) + b"-" + _esc(a + span) + b"]"
            elif r < 0.45:  # multi-member class
                members = rng.integers(lo, hi, int(rng.integers(2, 5)))
                spec += b"[" + b"".join(_esc(int(m)) for m in members) + b"]"
            elif r < 0.55:  # negated class
                members = rng.integers(lo, hi, int(rng.integers(1, 4)))
                spec += b"[^" + b"".join(_esc(int(m)) for m in members) + b"]"
            else:  # literal (escaped when needed)
                spec += _esc(b)
        pats.append(spec)
    if n_pats > 6 and rng.random() < 0.3:
        pats[-1] = pats[0]  # duplicate pattern (both ids must report)
    data = bytes(
        rng.integers(lo, hi, int(rng.integers(512, 6000))).astype(np.uint8)
    )
    return pats, data


def _esc(b: int) -> bytes:
    """Escape a byte for the class-pattern syntax (reference reader)."""
    if b in b"[]^-\\" or not (32 <= b < 127):
        return b"\\x%02x" % b
    return bytes([b])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=15)
    ap.add_argument("--start", type=int, default=100)
    ap.add_argument("--segment", action="store_true")
    ap.add_argument("--charset", action="store_true")
    args = ap.parse_args()

    import jax

    sys.path.insert(0, "/root/repo/tests")
    from test_fuzz import _dict_and_corpus

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.oracle.ac import match_oracle
    from phfpfac_tpu.parallel.matcher import Matcher
    from phfpfac_tpu.utils.config import PfacConfig

    assert jax.default_backend() == "tpu", "this soak wants the chip"

    if args.charset:
        from phfpfac_tpu.compile.tables import compile_class_patterns
        from phfpfac_tpu.frontend.charset import parse_class_pattern
        from phfpfac_tpu.oracle.ac import match_oracle_charset

        bad = 0
        for k in range(args.seeds):
            seed = args.start + k
            specs, data = _class_dict_and_corpus(seed)
            pats = [
                parse_class_pattern(s, i + 1) for i, s in enumerate(specs)
            ]
            cfg = PfacConfig(
                width=512, num_shards=1 + seed % 3, truncation="none",
                interpret=False,
            )
            compiled = compile_class_patterns(pats, cfg)
            want = match_oracle_charset(pats, data, cfg)
            t0 = time.perf_counter()
            m = Matcher(compiled, cfg, engine="pallas", train=data[:2048])
            got = [tuple(x) for x in m.match(data).tolist()]
            ok = got == want
            bad += not ok
            print(
                f"[tpu-fuzz charset] seed {seed}: "
                f"{'OK' if ok else 'MISMATCH'} ({len(got)} matches, "
                f"{len(pats)} classes, {time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
            if not ok:
                print(f"  want {len(want)}: {want[:10]}...", flush=True)
                print(f"  got  {len(got)}: {got[:10]}...", flush=True)
        print(f"[tpu-fuzz charset] {args.seeds - bad}/{args.seeds} clean",
              flush=True)
        sys.exit(1 if bad else 0)

    bad = 0
    for k in range(args.seeds):
        seed = args.start + k
        words, data = _dict_and_corpus(seed)
        pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
        if args.segment:
            cfg = PfacConfig(
                width=256, num_shards=1 + seed % 3,
                truncation="segment", segment_bytes=512, halo_bytes=64,
                interpret=False,
            )
        else:
            cfg = PfacConfig(
                width=256, num_shards=1 + seed % 3, truncation="none",
                interpret=False,
            )
        compiled = compile_patterns(pats, cfg)
        input_size = len(data) - (seed % 2)
        want = match_oracle(pats, data[:input_size], cfg)
        t0 = time.perf_counter()
        m = Matcher(compiled, cfg, engine="pallas", train=data[:2048])
        got = [
            tuple(x) for x in m.match(data, input_size=input_size).tolist()
        ]
        ok = got == want
        bad += not ok
        print(
            f"[tpu-fuzz] seed {seed}: {'OK' if ok else 'MISMATCH'} "
            f"({len(got)} matches, {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
        if not ok:
            print(f"  want {len(want)}: {want[:10]}...", flush=True)
            print(f"  got  {len(got)}: {got[:10]}...", flush=True)
    print(f"[tpu-fuzz] {args.seeds - bad}/{args.seeds} clean", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
