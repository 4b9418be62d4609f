"""Calibrate the two-phase compaction's XLA glue on real hardware.

Times the glue in isolation — nonzero(size=cap) over a survivor plane,
the window-plane gather, and the scatter-add merge — at several corpus
sizes and survivor densities, reporting cycles/position and
cycles/survivor to set bench/costsim.py's C_GLUE_PER_POS /
C_GLUE_PER_SURV from measurement instead of estimates.

Usage: python bench/glue_cal.py [--mib 32] [--density 0.04] [--cap-x 4]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from phfpfac_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import functools

import numpy as np

CLOCK = 0.94e9  # matches costsim.VOP_RATE


@functools.partial(
    __import__("jax").jit, static_argnames=("cap", "n_offs")
)
def glue(surv, flat, *, cap: int, n_offs: int):
    import jax.numpy as jnp

    from phfpfac_tpu.ops.pallas_plan import _compact_positions

    N = surv.shape[0]
    live = surv != 0
    count = live.sum()
    pos = _compact_positions(live, cap)  # honors PHFPFAC_GLUE
    posc = jnp.minimum(pos, N - 1)
    disp_b = jnp.where(pos < N, surv[posc], 0)
    offs = jnp.arange(n_offs, dtype=jnp.int32) * 2 + 1
    g = flat[jnp.minimum(posc[:, None] + offs[None, :], flat.shape[0] - 1)]
    # scatter-merge representative: one add back at survivor positions
    merged = jnp.zeros((N,), jnp.int32).at[pos].add(
        disp_b + g[:, 0], mode="drop"
    )
    return merged, count


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--density", type=float, default=0.04)
    ap.add_argument("--cap-x", type=float, default=4.0)
    ap.add_argument("--n-offs", type=int, default=7)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--glue", default=None, choices=["nonzero", "mxu"])
    args = ap.parse_args()
    if args.glue:
        import os

        os.environ["PHFPFAC_GLUE"] = args.glue

    import jax
    import jax.numpy as jnp

    n = args.mib << 20
    rng = np.random.default_rng(0)
    surv_np = np.where(
        rng.random(n) < args.density,
        rng.integers(64, 4096, n).astype(np.int32), 0
    )
    cap = 8192
    while cap < args.cap_x * args.density * n:
        cap <<= 1
    surv = jnp.asarray(surv_np)
    flat = jnp.asarray(rng.integers(0, 1 << 12, n + 1024, dtype=np.int32))

    out, count = glue(surv, flat, cap=cap, n_offs=args.n_offs)
    out.block_until_ready()
    reps = []
    K = 8
    for _ in range(args.reps):
        s = surv
        t0 = time.perf_counter()
        for _ in range(K):
            # chain: next call's survivor plane depends on the merge
            m, _c = glue(s, flat, cap=cap, n_offs=args.n_offs)
            s = jnp.where(surv != 0, jnp.maximum(m, 1), 0)
        s.block_until_ready()
        reps.append((time.perf_counter() - t0) / K)
    dt = float(np.median(reps))
    n_surv = int(count)
    cyc = dt * CLOCK
    import os

    mode = os.environ.get("PHFPFAC_GLUE", "nonzero")  # effective, not flag
    print(
        f"[glue] mode={mode} "
        f"mib={args.mib} density={args.density} cap={cap} "
        f"surv={n_surv} offs={args.n_offs} | {dt*1e3:.3f} ms "
        f"= {cyc/n:.4f} cyc/pos  ({(cyc - 0.02*n)/max(n_surv,1):.2f} "
        f"cyc/surv if 0.02/pos base)",
        flush=True,
    )


if __name__ == "__main__":
    main()
