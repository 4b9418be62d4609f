"""Pallas kernel on the real TPU: correctness + honest throughput.

Scans the 1M corpus with the xaa dictionary sharded to small automata
(banked-LUT budget), sweeping shard sizes.  Honest methodology: chained
calls with varying shift, single value fetch, medians.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.ops.common import pad_input, padded_steps
from phfpfac_tpu.ops.pallas_scan import PallasTables, pallas_count_scanner
from phfpfac_tpu.utils.config import PfacConfig


def main():
    words = open("/root/reference/regex_GPU_PHF/xaa", "rb").read().split()
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    data = open("/root/reference/regex_GPU_PHF/1M", "rb").read()
    n = len(data)

    # oracle total for correctness (counted once)
    from phfpfac_tpu.oracle.ac import oracle_match_lists
    cfg1 = PfacConfig(width=4096, num_shards=1)
    want = 109555  # verified earlier vs oracle on this corpus+dict

    for num_shards, width in ((4, 1024), (8, 512), (16, 512), (32, 256)):
        cfg = PfacConfig(width=width, num_shards=num_shards)
        compiled = compile_patterns(pats, cfg)
        max_steps = padded_steps(compiled.max_pat_len)
        padded = pad_input(data, 1024, max_steps)
        dev = jnp.asarray(padded)

        scanners = [
            pallas_count_scanner(sh, max_steps) for sh in compiled.shards
        ]
        banks = [PallasTables(sh).packed.shape[0] for sh in compiled.shards]

        def total_scan(shift):
            tot = jnp.int32(0)
            for sc in scanners:
                tot = tot + sc(dev, jnp.int32(n), shift)
            return tot

        total_scan_j = jax.jit(total_scan)
        v0 = int(np.asarray(total_scan_j(jnp.int32(0))))

        reps = []
        K = 6
        for _ in range(3):
            s = jnp.int32(0)
            t0 = time.perf_counter()
            for _ in range(K):
                s = total_scan_j(s % 2)
            _ = int(np.asarray(s))
            reps.append((time.perf_counter() - t0) / K)
        dt = float(np.median(reps))
        print(
            f"shards={num_shards:3d} width={width:5d} banks={max(banks):3d} "
            f"matches={v0} (want>={want - 200}) "
            f"{dt * 1e3:9.2f} ms  {n / dt / 1e9:6.3f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
