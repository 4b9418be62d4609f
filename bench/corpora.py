"""Shared dictionary/corpus loaders for the bench harnesses.

One copy of the reference-dictionary semantics (dedup via
dict.fromkeys, whitespace split for the english word lists, newline
split for the wikipedia-title files) so kexp/e2e/coldstart compile
identical dictionaries.
"""

from __future__ import annotations

REF = "/root/reference/regex_GPU_PHF"


def load_words(name: str, *, cap32: bool = False) -> list[bytes]:
    """Dictionary by name: "xaa" (one english shard), "english" (all
    four shards), "big" (156k wikipedia titles), "full" (466k titles).
    ``cap32`` drops patterns longer than the 32-step match bitmap
    (kexp's single-kernel protocol)."""
    words: list[bytes] = []
    if name == "xaa":
        words = open(f"{REF}/xaa", "rb").read().split()
    elif name == "english":
        for part in ("xaa", "xab", "xac", "xad"):
            words += open(f"{REF}/{part}", "rb").read().split()
    else:
        parts = ("xaa",) if name == "big" else ("xaa", "xab", "xac")
        for part in parts:
            words += open(
                f"{REF}/experiment/bigenglishdic/{part}", "rb"
            ).read().split(b"\n")
    if cap32:
        words = [w for w in words if 0 < len(w) <= 32]
    else:
        words = [w for w in words if w]
    return list(dict.fromkeys(words))


def corpus(mib: float) -> bytes:
    """English text corpus: the reference's 1M file tiled to size."""
    base = open(f"{REF}/1M", "rb").read()
    want = int(mib * (1 << 20))
    return (base * (want // len(base) + 1))[:want]
