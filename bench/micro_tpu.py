"""TPU microbenchmarks informing the PFAC kernel design.

Measures on the real chip:
  1. jnp.take gather throughput (table sizes 1K..64K, 1M-16M indices)
  2. count-mode jnp PFAC scan on 1 MiB input (no scatter)
  3. match-emit (scatter) jnp PFAC scan on 1 MiB input
  4. pallas: gather strategies inside a kernel (if supported)

Run:  python bench/micro_tpu.py [--quick]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_gather():
    print("== XLA gather (jnp.take) ==", flush=True)
    rng = np.random.default_rng(0)
    for tbl_size in (1024, 4096, 16384, 65536, 262144):
        table = jnp.asarray(rng.integers(0, 1 << 20, tbl_size, dtype=np.int32))
        for n_idx in (1 << 20, 1 << 23):
            idx = jnp.asarray(rng.integers(0, tbl_size, n_idx, dtype=np.int32))

            f = jax.jit(lambda t, i: jnp.take(t, i).sum())
            dt = timeit(f, table, idx)
            print(
                f"  table={tbl_size:>7} idx={n_idx:>9}  {dt*1e3:8.3f} ms  "
                f"{n_idx/dt/1e9:7.2f} G-lookups/s",
                flush=True,
            )


def bench_gather_2d():
    print("== XLA gather, 2D-shaped indices (8x128 tiles) ==", flush=True)
    rng = np.random.default_rng(0)
    tbl_size = 65536
    table = jnp.asarray(rng.integers(0, 1 << 20, tbl_size, dtype=np.int32))
    n = 1 << 23
    idx = jnp.asarray(
        rng.integers(0, tbl_size, n, dtype=np.int32).reshape(-1, 128)
    )
    f = jax.jit(lambda t, i: jnp.take(t, i).sum())
    dt = timeit(f, table, idx)
    print(f"  table={tbl_size} idx={n}(2d) {dt*1e3:8.3f} ms  {n/dt/1e9:7.2f} G/s",
          flush=True)


def bench_scan_1mb():
    print("== jnp PFAC-shaped scan, 1 MiB ==", flush=True)
    sys.path.insert(0, "/root/repo")
    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.common import pad_input, padded_steps, walk_limits
    from phfpfac_tpu.ops.reference_jnp import scan_shard_jnp
    from phfpfac_tpu.utils.config import PfacConfig

    words = open("/root/reference/regex_GPU_PHF/xaa", "rb").read().split()[:2600]
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    cfg = PfacConfig(width=4096, num_shards=1)
    compiled = compile_patterns(pats, cfg)
    shard = compiled.shards[0]
    data = open("/root/reference/regex_GPU_PHF/1M", "rb").read()
    n = len(data)
    steps = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, steps)
    n_pos = len(padded) - steps
    limits = walk_limits(n_pos, n, shard.max_pat_len, cfg)

    dt = timeit(
        lambda: scan_shard_jnp(shard, padded, limits, n, slots=0, emit_counts=True),
        iters=3, warmup=1,
    )
    print(f"  count-mode: {dt*1e3:8.2f} ms  {n/dt/1e9:6.3f} GB/s", flush=True)

    dt = timeit(
        lambda: scan_shard_jnp(shard, padded, limits, n, slots=8)[0],
        iters=3, warmup=1,
    )
    print(f"  emit-mode(8 slots): {dt*1e3:8.2f} ms  {n/dt/1e9:6.3f} GB/s", flush=True)


def bench_pallas_gather():
    print("== pallas in-kernel gather support probe ==", flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    tbl_size = 65536
    n = 1 << 20
    table = jnp.asarray(rng.integers(0, 1000, tbl_size, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, tbl_size, n, dtype=np.int32).reshape(-1, 128))

    def kernel(tbl_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], mode="clip")

    f = jax.jit(
        lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(i.shape, jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    )
    try:
        out = np.asarray(f(table, idx))
        ok = (out == np.asarray(table)[np.asarray(idx)]).all()
        dt = timeit(f, table, idx)
        print(f"  jnp.take in pallas: OK correct={ok}  {dt*1e3:.3f} ms  "
              f"{n/dt/1e9:.2f} G/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  jnp.take in pallas: FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def bench_vpu_ilp():
    """Peak (8,128)-int32 vop issue rate vs dependency structure.

    Discriminates "the kernel is at the VPU ceiling" from "Mosaic
    issues ~1 op/cycle on a dependent chain": v5e's VPU has multiple
    vector ALUs, so K independent chains should exceed one chain's
    rate if the scheduler can dual-issue.  Also measures the banked
    probe triple (broadcast row + take_along_axis + select) in
    isolation — the plan kernel's dominant op mix.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("== VPU ILP (pallas, (8,128) int32) ==", flush=True)
    rng = np.random.default_rng(0)
    rows = 512  # 64 tiles of (8,128)
    x = jnp.asarray(rng.integers(1, 1000, (rows, 128), dtype=np.int32))
    N_OPS = 4096  # vops per tile per call

    def run(label, kernel):
        f = jax.jit(
            lambda a: pl.pallas_call(
                kernel,
                grid=(rows // 8,),
                in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            )(a)
        )
        dt = timeit(f, x)
        total = N_OPS * (rows // 8)
        print(f"  {label:24s} {dt*1e3:8.3f} ms  "
              f"{total/dt/1e9:6.2f} Gvop/s", flush=True)

    def k_chain(in_ref, out_ref):
        v = in_ref[:]
        for _ in range(N_OPS):
            v = v * 3 + 1
        out_ref[:] = v

    def k_ilp4(in_ref, out_ref):
        vs = [in_ref[:] + i for i in range(4)]
        for _ in range(N_OPS // 4 - 1):
            vs = [v * 3 + 1 for v in vs]
        out_ref[:] = vs[0] ^ vs[1] ^ vs[2] ^ vs[3]

    def k_ilp8(in_ref, out_ref):
        vs = [in_ref[:] + i for i in range(8)]
        for _ in range(N_OPS // 8 - 1):
            vs = [v * 3 + 1 for v in vs]
        r = vs[0]
        for v in vs[1:]:
            r = r ^ v
        out_ref[:] = r

    run("dependent chain", k_chain)
    run("4 indep chains", k_ilp4)
    run("8 indep chains", k_ilp8)

    # the probe mix: broadcast+gather+select per "bank"
    banks = jnp.asarray(rng.integers(0, 1000, (64, 128), dtype=np.int32))

    def k_probe(bank_ref, in_ref, out_ref):
        idx = in_ref[:] & 127
        bank = in_ref[:] & 63
        acc = jnp.full((8, 128), -1, jnp.int32)
        n_banks = N_OPS // 3
        for k in range(n_banks):
            row = jnp.broadcast_to(bank_ref[k % 64, :][None, :], idx.shape)
            g = jnp.take_along_axis(row, idx, axis=1)
            acc = jnp.where(bank == (k % 64), g, acc)
        out_ref[:] = acc

    f = jax.jit(
        lambda b, a: pl.pallas_call(
            k_probe,
            grid=(rows // 8,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        )(b, a)
    )
    dt = timeit(f, banks, x)
    total = N_OPS * (rows // 8)
    print(f"  {'probe triple':24s} {dt*1e3:8.3f} ms  "
          f"{total/dt/1e9:6.2f} Gvop/s (3 vops/bank accounting)",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    if "--ilp" in sys.argv:
        bench_vpu_ilp()
    else:
        bench_gather()
        bench_gather_2d()
        bench_pallas_gather()
        bench_scan_1mb()
        bench_vpu_ilp()
