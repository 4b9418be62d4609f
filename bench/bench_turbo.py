"""Turbo engine throughput on the real TPU.

Scans N copies of the reference 1M corpus against the xaa dictionary
(2,600 patterns) and reports GB/s for count mode and emit mode, across
full_steps / cap_frac / batch-size settings.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.ops.common import pad_input, padded_steps
from phfpfac_tpu.ops.turbo_jnp import build_turbo_tables, scan_shard_turbo
from phfpfac_tpu.utils.config import PfacConfig


def main():
    words = open("/root/reference/regex_GPU_PHF/xaa", "rb").read().split()
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    cfg = PfacConfig(width=4096, num_shards=1)
    compiled = compile_patterns(pats, cfg)
    shard = compiled.shards[0]
    tt = build_turbo_tables(shard)
    print(f"dict: {len(pats)} patterns, {shard.state_num} states, "
          f"ht_size={shard.ht_size}, max_pat_len={shard.max_pat_len}, "
          f"packed={tt.is_packed}", flush=True)

    base = open("/root/reference/regex_GPU_PHF/1M", "rb").read()
    for mult in (1, 8, 16):
        data = base * mult
        n = len(data)
        max_steps = padded_steps(compiled.max_pat_len)
        padded = pad_input(data, 1024, max_steps)

        for full_steps in (1, 2, 3):
            for cap_frac in (4, 8):
                def run(emit_counts):
                    res = scan_shard_turbo(
                        shard, padded, n, cfg, max_steps=max_steps,
                        full_steps=full_steps, cap_frac=cap_frac,
                        emit_counts=emit_counts, turbo_tables=tt,
                    )
                    jax.block_until_ready(res)
                    return res

                res = run(True)  # warmup/compile
                overflow = bool(np.asarray(res[-1]))
                t0 = time.perf_counter()
                iters = 5
                for _ in range(iters):
                    res = run(True)
                dt = (time.perf_counter() - t0) / iters
                print(f"  {mult}MiB fs={full_steps} cf={cap_frac} count: "
                      f"{dt*1e3:7.2f} ms  {n/dt/1e9:6.2f} GB/s ovf={overflow}",
                      flush=True)

        # emit mode at best-guess config
        def run_emit():
            res = scan_shard_turbo(
                shard, padded, n, cfg, max_steps=max_steps,
                full_steps=2, cap_frac=8, turbo_tables=tt,
            )
            jax.block_until_ready(res)
            return res

        run_emit()
        t0 = time.perf_counter()
        for _ in range(3):
            run_emit()
        dt = (time.perf_counter() - t0) / 3
        print(f"  {mult}MiB emit fs=2 cf=8:  {dt*1e3:7.2f} ms  "
              f"{n/dt/1e9:6.2f} GB/s", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
