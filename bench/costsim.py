"""Offline vop-cost simulator for the plan kernel (no TPU needed).

Replays ops/pallas_plan's EXACT runtime control flow — prologue, per-
step windows/probes, the trained grouped-scan boundaries gated by the
cell-wide max live probe index, and the cell-level early-exit conds —
over a real corpus with the real PlanTables, in vectorized NumPy, and
prints the predicted per-step vop ledger and GB/s.

Purpose: iterating on group geometry / layout / tpc / cond_from costs
minutes of Mosaic compile per candidate on hardware; the simulator
ranks candidates in seconds.  Constants below are calibrated against
measured kexp runs (see PERF.md roofline); predictions are for
RANKING, the TPU run of the winner is the number of record.

Usage: python bench/costsim.py --dict english --mib 32 [--tpc 32]
       [--cond-from 4] [--growth 3] [--floor 4]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

_LANE = 128
TILE = 1024
from phfpfac_tpu.compile.depth import (  # single shared knobs
    GROUP_FLOOR,
    GROUP_MIN_NB,
)

# calibrated per-(8,128)-vop costs (cycles); see PERF.md roofline
C_BANK = 3.0      # broadcast + lane-gather + select, per bank per tile
C_WINDOW = 3.0    # two static rolls + masked select (off > 0)
C_IDX_MONO = 2.0  # mask + add
C_IDX_PAIR = 1.0  # add
C_FIN_MONO = 8.0
C_FIN_PAIR = 13.0
C_BOUND = 2.0     # unmasked max tree per bounded probe, per tile
                  # (dead-zone layout: dead probes sit below k0, no
                  # live-masking selects in the bound)
C_GCHECK = 1.0    # per evaluated group boundary, per tile
C_ALIVE = 1.5     # any_live min-tree, per tile
C_STEP_FIX = 4.0  # residual per executed step per tile (scheduling)
C_PROLOGUE_S0 = 8.0
C_PROLOGUE_DENSE_PER_BANK = 3.0
C_CELL_FIX = 40.0  # per-cell grid/epilogue overhead (cycles)
C_BANK_LOOP = 6.0  # cold dynamic-loop bank cost (gmode=capped tail)
UNROLL_GROUPS = 2  # must track ops.pallas_plan._UNROLL_GROUPS
VOP_RATE = 0.94e9  # measured effective (8,128)-vop issue rate (v5e)


def group_ends(nb: int, first: int = 4, growth: int = 2) -> list:
    ends, e, size = [], 0, max(first, 2)
    while e < nb:
        e = min(e + size, nb)
        ends.append(e)
        size *= growth
    return ends


# XLA glue for the two-phase compacted scan (nonzero + tail gather +
# scatter-merge): HBM-bound passes over the corpus (cumsum + scatter
# a few x 4B/pos at ~800 GB/s ~= 0.02-0.05 cyc/pos at 0.94 GHz; pad
# to 0.1 for XLA slack) plus per-survivor gather/scatter line traffic.
# Placeholders until calibrated on hardware.
C_GLUE_PER_POS = 0.033  # ~5 HBM passes x 4B/pos at 800 GB/s, 0.94 GHz
C_GLUE_PER_SURV = 1.5   # tail-gather + scatter line traffic / survivor


def simulate(pt, data: bytes, *, tpc: int, cond_from: int,
             growth: int = 3, floor: int = GROUP_FLOOR, gmode: str = "capped",
             ggeom: str = "hot", verbose: bool = True,
             compact_at: int = 0, compact_tpc: int = 8,
             compact_at2: int = 0):
    """Returns (pred_gbps, vops_total, per_step_ledger).

    compact_at > 0 models the two-phase compacted scan: phase A runs
    steps [0, compact_at) over every position, then live walkers are
    compacted (survivor positions + disps) and phase B runs the
    remaining steps over dense survivor tiles only.  compact_at2 >
    compact_at models a THREE-phase scan: a second compaction at that
    step (its nonzero runs over the first cap's plane, not the
    corpus), letting the first cut sit early (~15-25% live) without
    dragging every deep step along at that density."""
    code_of = np.asarray(pt.code_of, np.int32)
    cb = pt.code_bits
    cbm = (1 << cb) - 1
    pair_mask = (1 << (2 * cb)) - 1
    miss = pt.p0_miss
    n = len(data)
    cell_pos = tpc * TILE
    n_cells = -(-n // cell_pos)
    pad = n_cells * cell_pos - n

    raw = np.frombuffer(data, np.uint8).astype(np.int32)
    codes = code_of[raw]
    miss_code = int(code_of.max())
    # staged pair-symbol stream, padded with the miss code (stage_pairs)
    ext = np.full(n + 64, miss_code, np.int32)
    ext[:n] = codes
    pair_sym = (np.append(ext[1:], miss_code) << cb) | ext

    main_flat = np.asarray(pt.packed_banks, np.int32).ravel()
    side_flat = np.asarray(pt.side_banks, np.int32).ravel()
    p0_flat = np.asarray(pt.p0_banks, np.int32).ravel()

    def lut(flat, idx, off, nb, k0):
        rel = idx - k0 * _LANE
        ok = (rel >= 0) & (rel < nb * _LANE)
        out = np.full(idx.shape, -1, np.int32)
        out[ok] = flat[off * _LANE + rel[ok]]
        return out

    # ---- prologue
    ledger = []
    vops = 0.0
    matches = 0
    if pt.p0_mode == "s0":
        v = lut(p0_flat, ext[:n] * 1, 0, pt.p0_banks.shape[0], 0)
        alive = v >= 0
        matches += int((alive & ((v & 1) == 1)).sum())
        disp = np.where(alive, v >> 1, miss)
        vops += C_PROLOGUE_S0 * (n_cells * tpc)
    else:
        # dense P0: indexed by the raw pair symbol, covers depths 1+2
        # ((next_disp << 2) | (fin2 << 1) | fin1; -1 = miss)
        v = lut(p0_flat, pair_sym[:n], 0, pt.p0_banks.shape[0], 0)
        alive = v >= 0
        matches += int((alive & ((v & 1) == 1)).sum())
        matches += int((alive & ((v & 2) == 2)).sum())
        disp = np.where(alive, v >> 2, miss)
        vops += (
            C_PROLOGUE_DENSE_PER_BANK * pt.p0_banks.shape[0]
            * (n_cells * tpc)
        )
    ledger.append(("p0", vops, 1.0, 0.0, 0.0))

    trained = pt.trained

    def run_steps(disp, positions, si0, si1, tpc_r, cond_from_r, tag=""):
        """Replay steps [si0, si1) over walkers at ``positions`` whose
        incoming displacements are ``disp``.  Windows gather from the
        corpus-wide pair-symbol stream at positions + off, so the same
        loop serves phase A (positions = arange(n)) and the compacted
        phase B (positions = survivor positions)."""
        nonlocal vops, matches
        nw = len(positions)
        cell_r = tpc_r * TILE
        nc_r = -(-nw // cell_r)
        posc = np.clip(positions, 0, len(pair_sym) - 64)

        def cell_reduce_max(arr):
            full = np.full(nc_r * cell_r, -1, np.int32)
            full[:nw] = arr
            return full.reshape(nc_r, cell_r).max(axis=1)

        def cell_reduce_any(mask):
            full = np.zeros(nc_r * cell_r, bool)
            full[:nw] = mask
            return full.reshape(nc_r, cell_r).any(axis=1)

        executed = np.ones(nc_r, bool)
        for si in range(si0, si1):
            sp = pt.steps[si]
            off_chars = sp.depth0 - 1
            live = disp != miss
            if si >= cond_from_r:
                executed = cell_reduce_any(live)
            exec_frac = executed.mean()
            n_exec = int(executed.sum())

            cur = pair_sym[posc + off_chars]
            if sp.kind == "mono":
                idx = disp + (cur & cbm)
                c_idx, c_fin = C_IDX_MONO, C_FIN_MONO
            else:
                idx = disp + cur
                c_idx, c_fin = C_IDX_PAIR, C_FIN_PAIR

            step_v = (C_WINDOW + c_idx + c_fin + C_ALIVE + C_STEP_FIX) \
                * tpc_r * n_exec

            def probe_cost(nb, hot, k0, pidx):
                """(vops, mean probed banks, mean loop banks) for one
                bounded probe, mirroring probe_bounded + gmode."""
                if not (trained and nb >= GROUP_MIN_NB):
                    return C_BANK * nb * tpc_r * n_exec, float(nb), 0.0
                if ggeom == "fine":
                    # fine geometric ladder from the floor; unroll every
                    # group up to the hot span, cold loop past it.  Cells
                    # whose live walkers stay in the first banks stop at
                    # the matching rung instead of paying the hot span.
                    ends, e = [], 0
                    size = max(floor, 2)
                    while e < min(hot + 1, nb):
                        e = min(e + size, nb)
                        ends.append(e)
                        size *= 2
                    tail_lo = ends[-1] if ends[-1] < nb else None
                else:
                    first = max(floor, hot + 1)
                    ends = group_ends(nb, first=first, growth=growth)
                    tail_lo = None
                    if gmode == "capped" and len(ends) > UNROLL_GROUPS:
                        ends, tail_lo = (
                            ends[:UNROLL_GROUPS], ends[UNROLL_GROUPS - 1])
                midx = np.where(live, pidx, -1)
                mx = cell_reduce_max(midx)
                fired = np.full(nc_r, float(ends[0]))
                checks = float(len(ends) - 1)
                loop_banks = np.zeros(nc_r)
                for lo, hi in zip(ends[:-1], ends[1:]):
                    fired += np.where(mx >= ((k0 + lo) << 7), hi - lo, 0)
                if tail_lo is not None:
                    checks += 1
                    n_hi = np.clip((mx >> 7) - k0 + 1, tail_lo, nb)
                    loop_banks = np.where(
                        mx >= ((k0 + tail_lo) << 7), n_hi - tail_lo, 0.0)
                v = (C_BOUND + C_GCHECK * checks) * tpc_r * n_exec
                v += C_BANK * tpc_r * fired[executed].sum()
                v += C_BANK_LOOP * tpc_r * loop_banks[executed].sum()
                pb = fired[executed].mean() if n_exec else 0.0
                lb = loop_banks[executed].mean() if n_exec else 0.0
                return v, pb, lb

            v, probed_banks, loop_banks = probe_cost(
                sp.nb, sp.hot_nb, sp.k0, idx)
            step_v += v

            g = lut(main_flat, idx, sp.off, sp.nb, sp.k0)

            # side probe (pair steps): cost only, side never chains
            if sp.kind == "pair":
                wshift = 3 if sp.s_nibble else 2
                widx_raw = disp + (cur & cbm)
                widx = widx_raw >> wshift
                sv, _, _ = probe_cost(sp.s_nb, sp.s_hot_nb, sp.s_k0, widx)
                step_v += sv + 2.0 * tpc_r * n_exec  # widx shift+add

            # chain + match counting (parity check vs the TPU run)
            if sp.kind == "mono":
                hit = live & ((g & cbm) == (cur & cbm))
                matches += int((hit & ((g & (1 << cb)) != 0)).sum())
                disp = np.where(hit, g >> (cb + 1), miss)
            else:
                w = lut(side_flat, widx, sp.s_off, sp.s_nb, sp.s_k0)
                a1 = cur & cbm
                if sp.s_nibble:
                    nib = (w >> ((widx_raw & 7) << 2)) & 15
                    fin_mid = live & (nib == (a1 & 7) + 1)
                else:
                    byte = (w >> ((widx_raw & 3) << 3)) & 255
                    fin_mid = live & (byte == a1 + 1)
                hit = live & ((g & pair_mask) == cur)
                matches += int(fin_mid.sum())
                matches += int((hit & ((g & (1 << (2 * cb))) != 0)).sum())
                disp = np.where(hit, g >> (2 * cb + 1), miss)

            vops += step_v
            ledger.append((f"{tag}s{si}:{sp.kind}@d{sp.depth0}", step_v,
                           exec_frac, probed_banks, loop_banks))
        vops += C_CELL_FIX * nc_r
        return disp

    n_steps = len(pt.steps)
    cut = min(compact_at, n_steps) if compact_at > 0 else n_steps
    disp = run_steps(disp, np.arange(n), 0, cut, tpc, cond_from)
    surv = 0
    if cut < n_steps:
        # XLA glue: nonzero + tail gather + scatter-merge
        alive_idx = np.nonzero(disp != miss)[0]
        surv = len(alive_idx)
        glue_v = C_GLUE_PER_POS * n + C_GLUE_PER_SURV * surv
        vops += glue_v
        ledger.append((f"glue(surv={surv})", glue_v, surv / n, 0.0, 0.0))
        cut2 = (
            min(compact_at2, n_steps)
            if cut < compact_at2 < n_steps else n_steps
        )
        disp_b = run_steps(disp[alive_idx], alive_idx, cut, cut2,
                           compact_tpc, 0, tag="B:")
        if cut2 < n_steps:
            alive2 = np.nonzero(disp_b != miss)[0]
            surv2 = len(alive2)
            glue2_v = C_GLUE_PER_POS * surv + C_GLUE_PER_SURV * surv2
            vops += glue2_v
            ledger.append((f"glue2(surv={surv2})", glue2_v,
                           surv2 / n, 0.0, 0.0))
            run_steps(disp_b[alive2], alive_idx[alive2], cut2, n_steps,
                      compact_tpc, 0, tag="B2:")
    cycles = vops
    t = cycles / VOP_RATE
    gbps = n / t / 1e9
    if verbose:
        for name, v, ef, pb, *lb in ledger:
            print(f"  {name:16s} vops/cell={v / n_cells:8.0f} "
                  f"exec={ef:6.3f} banks={pb:6.1f}"
                  + (f" loop={lb[0]:5.2f}" if lb else ""))
        print(f"  total vops/cell={vops / n_cells:.0f}  "
              f"predicted {gbps:.3f} GB/s  matches={matches}")
    global LAST_MATCHES
    LAST_MATCHES = matches  # parity hook (tests/test_costsim.py)
    return gbps, vops, ledger


LAST_MATCHES = -1


def load_dict(which):
    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.utils.config import PfacConfig

    if which == "binary":
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "binbench", "/root/repo/bench/binary.py")
        bb = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bb)
        sigs = bb.make_signatures(5000)
        pats = [Pattern(i + 1, w) for i, w in enumerate(sigs)]
        return compile_patterns(
            pats, PfacConfig(width=4096, num_shards=1)).shards[0]
    words = []
    if which == "english":
        for part in ("xaa", "xab", "xac", "xad"):
            words += open(
                f"/root/reference/regex_GPU_PHF/{part}", "rb").read().split()
    elif which == "xaa":
        words = open("/root/reference/regex_GPU_PHF/xaa", "rb").read().split()
    else:
        parts = ("xaa",) if which == "big" else ("xaa", "xab", "xac")
        for part in parts:
            words += open(
                f"/root/reference/regex_GPU_PHF/experiment/bigenglishdic/"
                f"{part}", "rb").read().split(b"\n")
        words = [w for w in words if 0 < len(w) <= 32]
    pats = [Pattern(i + 1, w) for i, w in enumerate(dict.fromkeys(words))]
    compiled = compile_patterns(pats, PfacConfig(width=4096, num_shards=1))
    return compiled.shards[0]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from phfpfac_tpu.compile.plan import build_plan_tables

    ap = argparse.ArgumentParser()
    ap.add_argument("--dict", default="english",
                    choices=["english", "xaa", "big", "full", "binary"])
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--tpc", type=int, default=32)
    ap.add_argument("--cond-from", type=int, default=4)
    ap.add_argument("--growth", type=int, default=3)
    ap.add_argument("--floor", type=int, default=GROUP_FLOOR)
    ap.add_argument("--gmode", default="capped",
                    choices=["capped", "geo"])
    ap.add_argument("--ggeom", default="hot", choices=["hot", "fine"])
    ap.add_argument("--untrained", action="store_true")
    ap.add_argument("--compact-at", type=int, default=0,
                    help="model the two-phase compacted scan with the "
                         "cut before step N (0 = off)")
    ap.add_argument("--compact-at2", type=int, default=0,
                    help="second compaction cut (three-phase scan; "
                         "must exceed --compact-at)")
    ap.add_argument("--compact-sweep", action="store_true",
                    help="sweep the compaction cut over every step")
    ap.add_argument("--compact-sweep2", action="store_true",
                    help="sweep (cut1, cut2) pairs of the three-phase "
                         "scan")
    ap.add_argument("--plan", default=None,
                    help="forced step kinds from depth 1, e.g. 'mmmpppp' "
                         "(m = mono/1 depth, p = pair/2 depths); padded "
                         "with the last char to cover the automaton")
    args = ap.parse_args()

    shard = load_dict(args.dict)
    if args.dict == "binary":
        rng = __import__("numpy").random.default_rng(1)
        data = rng.integers(0, 256, args.mib << 20, dtype="uint8").tobytes()
    else:
        data = open("/root/reference/regex_GPU_PHF/1M", "rb").read() * args.mib
    forced = None
    if args.plan:
        D = shard.max_pat_len
        forced, d, i = [], 1, 0
        while d < D:
            c = args.plan[i] if i < len(args.plan) else args.plan[-1]
            if c == "p" and d + 1 < D:
                forced.append(("pair", d)); d += 2
            else:
                forced.append(("mono", d)); d += 1
            i += 1
        forced = tuple(forced)
    pt = build_plan_tables(
        shard, train=None if args.untrained else data[: 1 << 20],
        forced_kinds=forced)
    print(f"[costsim] dict={args.dict} mib={args.mib} tpc={args.tpc} "
          f"cf={args.cond_from} growth={args.growth} floor={args.floor} "
          f"plan={args.plan or 'auto'} kinds={''.join(k[0] for k in pt.kinds)}")
    if args.compact_sweep:
        base, _, _ = simulate(
            pt, data, tpc=args.tpc, cond_from=args.cond_from,
            growth=args.growth, floor=args.floor, gmode=args.gmode,
            ggeom=args.ggeom, verbose=False)
        print(f"  cut=off  {base:.3f} GB/s")
        for cut in range(1, len(pt.steps)):
            g, _, led = simulate(
                pt, data, tpc=args.tpc, cond_from=args.cond_from,
                growth=args.growth, floor=args.floor, gmode=args.gmode,
                ggeom=args.ggeom, verbose=False, compact_at=cut)
            surv = next(e for n_, *e in led if n_.startswith("glue"))[1]
            print(f"  cut={cut:2d}  {g:.3f} GB/s  surv={surv:.5f}")
        return
    if args.compact_sweep2:
        ns = len(pt.steps)
        best = (0.0, None)
        for cut1 in range(1, ns - 1):
            for cut2 in range(cut1 + 1, ns):
                g, _, _ = simulate(
                    pt, data, tpc=args.tpc, cond_from=args.cond_from,
                    growth=args.growth, floor=args.floor,
                    gmode=args.gmode, ggeom=args.ggeom, verbose=False,
                    compact_at=cut1, compact_at2=cut2)
                if g > best[0]:
                    best = (g, (cut1, cut2))
                print(f"  cut=({cut1:2d},{cut2:2d})  {g:.3f} GB/s")
        print(f"  best {best[1]} -> {best[0]:.3f} GB/s")
        return
    simulate(pt, data, tpc=args.tpc, cond_from=args.cond_from,
             growth=args.growth, floor=args.floor, gmode=args.gmode,
             ggeom=args.ggeom, compact_at=args.compact_at,
             compact_at2=args.compact_at2)


if __name__ == "__main__":
    main()
