"""By-construction vop ledger for a trained plan (bound derivation).

Prints, per step of the REAL trained PlanTables: kind, covered depths,
table/hot-bank geometry, trained live fraction, and the constructed
(8,128)-vop count per tile — the semantic op floor of the current
kernel structure (probe = 3 vops/bank over the hot group, window roll
3, index 1-2, verify/update 8 mono / 13 pair, bound 2/probe, step
fix ~4).  Dividing the total by the MEASURED chained time gives the
kernel's effective vop issue rate; the bound at a given rate is
  GB/s = rate * 1024 / vops_per_cell_tilesum.

Usage: python bench/ledger.py --dict big --mib 32 [--measured-ms 10.56]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/bench")

import numpy as np

C_BANK, C_WINDOW = 3.0, 3.0
C_IDX = {"mono": 2.0, "pair": 1.0}
C_FIN = {"mono": 8.0, "pair": 13.0}
C_BOUND, C_STEP_FIX, C_ALIVE = 2.0, 4.0, 1.5
from phfpfac_tpu.compile.depth import GROUP_FLOOR, GROUP_MIN_NB


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dict", default="big")
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--tpc", type=int, default=32)
    ap.add_argument("--measured-ms", type=float, default=0.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from corpora import corpus, load_words

    from phfpfac_tpu.compile.plan import build_plan_tables
    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.ops.pallas_plan import resolve_cond_from
    from phfpfac_tpu.utils.config import PfacConfig

    words = load_words(args.dict, cap32=(args.dict == "big"))
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    compiled = compile_patterns(pats, PfacConfig(width=4096, num_shards=1))
    data = corpus(args.mib)
    pt = build_plan_tables(compiled.shards[0], train=data[: 1 << 20])
    cf = resolve_cond_from(pt, "auto")

    # prologue
    nb_p0 = pt.p0_banks.shape[0]
    v_p0 = nb_p0 * C_BANK + (2.0 if pt.p0_mode == "dense" else 1.0) + 4.0
    print(f"[ledger] dict={args.dict} mib={args.mib} tpc={args.tpc} "
          f"p0_mode={pt.p0_mode} nb_p0={nb_p0} cond_from(auto)={cf}")
    print(f"  prologue: {v_p0:.0f} vops/tile")
    total_tile = v_p0
    for si, sp in enumerate(pt.steps):
        f = pt.live_frac[si] if si < len(pt.live_frac) else 1.0
        # executed fraction of cells: step si runs iff the cell was
        # live entering step cond_from-1 (the one-shot pred) — a cell
        # of tpc*1024 walkers is live with prob 1-(1-f_pred)^W
        if si < cf:
            exec_frac = 1.0
        else:
            f_pred = pt.live_frac[cf - 1] if cf - 1 < len(pt.live_frac) else f
            exec_frac = 1.0 - (1.0 - min(f_pred, 1.0)) ** (args.tpc * 1024)
        hot = max(sp.hot_nb, 1) if pt.trained else sp.nb
        hot = min(max(hot, min(GROUP_FLOOR, sp.nb)), sp.nb)
        v = C_WINDOW + C_IDX[sp.kind] + hot * C_BANK + C_FIN[sp.kind]
        v += C_BOUND if (pt.trained and sp.nb >= GROUP_MIN_NB) else 0.0
        if sp.kind == "pair":
            s_hot = max(sp.s_hot_nb, 1) if pt.trained else sp.s_nb
            s_hot = min(max(s_hot, min(GROUP_FLOOR, sp.s_nb)), sp.s_nb)
            v += s_hot * C_BANK
            v += C_BOUND if (pt.trained and sp.s_nb >= GROUP_MIN_NB) else 0
        v += C_STEP_FIX + (C_ALIVE if si == cf - 1 else 0.0)
        eff = v * exec_frac
        total_tile += eff
        print(f"  s{si}:{sp.kind}@d{sp.depth0}"
              f"{'' if sp.kind == 'mono' else f'-{sp.depth0+1}'} "
              f"nb={sp.nb} hot={sp.hot_nb} s_nb={sp.s_nb} "
              f"s_hot={sp.s_hot_nb} live={f:.2e} exec={exec_frac:.3f} "
              f"vops/tile={v:.0f} -> {eff:.1f}")
    n_pos = args.mib << 20
    n_tiles = n_pos // 1024
    vops = total_tile * n_tiles
    print(f"  TOTAL {total_tile:.0f} vops/tile = {vops/1e6:.1f} M vops "
          f"at {args.mib} MiB")
    for rate, tag in ((0.94e9, "1.00 vop/cyc"), (1.5e9, "1.6 vops/cyc")):
        t = vops / rate
        print(f"  bound @ {tag}: {t*1e3:.2f} ms = {n_pos/t/1e9:.2f} GB/s")
    if args.measured_ms:
        t = args.measured_ms / 1e3
        print(f"  measured {args.measured_ms} ms = {n_pos/t/1e9:.2f} GB/s "
              f"-> effective {vops/t/0.94e9:.2f} vops/cycle "
              f"({vops/t/1e9:.2f} G vops/s)")


if __name__ == "__main__":
    main()
