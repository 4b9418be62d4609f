"""End-to-end serving walkthrough.

Compile a dictionary once, persist the tables, and serve three ways:
one-shot buffers, a chunked stream, and a batch of small buffers in a
single device dispatch.

    python examples/serve_demo.py [pattern_file] [corpus_file]

Defaults to the reference corpora when present.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from phfpfac_tpu import CompiledDictionary, Matcher, PfacConfig, StreamMatcher
from phfpfac_tpu.compile.tables import compile_dictionary
from phfpfac_tpu.parallel.stream import match_many

PATTERNS = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/regex_GPU_PHF/xaa"
)
CORPUS = sys.argv[2] if len(sys.argv) > 2 else (
    "/root/reference/regex_GPU_PHF/1M"
)


def main() -> None:
    import jax

    from phfpfac_tpu.utils.cache import honor_platform_env

    honor_platform_env()

    cfg = PfacConfig(
        width=4096, num_shards=1, truncation="none",
        interpret=jax.default_backend() != "tpu",  # pallas off-TPU
    )

    # ---- compile once, persist, reload (the reference rebuilds on
    # every invocation; table build is the slow host phase) ----------
    compiled = compile_dictionary(PATTERNS, cfg)
    compiled.save("/tmp/tables.npz")
    compiled = CompiledDictionary.load("/tmp/tables.npz")
    print(f"{compiled.num_patterns} patterns, "
          f"{sum(s.state_num for s in compiled.shards)} states")

    data = open(CORPUS, "rb").read()

    # ---- one-shot ---------------------------------------------------
    m = Matcher(compiled, cfg, engine="pallas")
    matches = m.match(data)
    print(f"one-shot: {len(matches)} matches in {len(data)} bytes")

    # ---- chunked stream (exactly-once across chunk boundaries) ------
    sm = StreamMatcher(compiled, cfg)
    total = 0
    for off in range(0, len(data), 1 << 16):
        total += len(sm.feed(data[off : off + (1 << 16)]))
    assert total == len(matches)
    print(f"stream (64 KiB chunks): {total} matches")

    # ---- batched small buffers (one dispatch) ------------------------
    bufs = [data[i * 4096 : (i + 1) * 4096] for i in range(16)]
    outs = match_many(m, bufs)
    print(f"batch of {len(bufs)}: {[len(o) for o in outs]} matches each")


if __name__ == "__main__":
    main()
