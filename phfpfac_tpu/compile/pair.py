"""Stride-2 ("pair") depth-stratified PFAC tables.

Builds on compile.depth: the trie is stratified by depth and
level-minimized, then adjacent depth levels are fused so the device
consumes TWO bytes per probe.  Only even-depth states materialize as
table rows — the odd levels exist implicitly inside pair transitions —
which roughly halves both total table size and walk-step count (the
two multiplicative costs of the banked-LUT walk, ops.pallas_scan._lut).

Requires a compact alphabet: the dictionary's distinct bytes map to
codes of CODE_BITS = ceil(log2(sigma+1)) bits, and a pair symbol is
``code1 << CODE_BITS | code2``.  Dictionaries with more than
MAX_SIGMA distinct bytes raise PairUnsupported (callers fall back to
the stride-1 depth kernel).  All non-dictionary bytes (and the
past-input pad) share the reserved miss code, which no stored entry
contains — such probes can never verify.

Per pair step k (covering depths 2k+1 and 2k+2):

* **P_k** — the pair table: rows = depth-2k classes, col = pair
  symbol, FFDM layout with distinct displacements (depth.py).  Entry
  ``(next_disp << (2*CB+1)) | (fin_end << 2*CB) | pair`` — probe
  verification compares the stored pair (sound by displacement
  distinctness), fin_end flags the landed depth-2k+2 class, next_disp
  chains into P_{k+1}.
* **S_k** — the odd-completion side table: records which (row, c1)
  have a FINAL depth-2k+1 child, so matches ending on the odd level
  are emitted even when no pair transition continues the walk.  S_k
  is direct-indexed by ``row_disp + code1`` — it reuses P_k's
  displacement (soundness again from distinctness), so the walker
  carries ONE displacement.  Entries are bytes (code1 + 1; 0 = empty)
  packed 4-per-int32, costing a quarter of a pair-table probe.

Rows that have no pair transitions but DO have final odd children
still get a distinct displacement (force_offset) so S_k can address
them.

The first step fuses depths 1+2 into a dense sigma^2-indexed table
P_0 (entry ``disp << 2 | fin2 << 1 | fin1``, -1 = no depth-1 state),
replacing the s0 row (master_kernel.cu:41).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from phfpfac_tpu.compile.depth import (
    _EMPTY,
    DepthUnsupported,
    MAX_DEPTH_STEPS,
    _bfs_levels,
    _layout_with_growth,
    _minimize_levels,
    _reconstruct_dense,
    _to_banks,
    _to_banks_trimmed,
)
from phfpfac_tpu.compile.tables import ShardTables

_LANE = 128

MAX_SIGMA = 63  # distinct dictionary bytes; miss code = sigma


class PairUnsupported(DepthUnsupported):
    """Shard cannot use the stride-2 layout (big alphabet, DAG, ...)."""


@dataclass
class PairTables:
    """Banked stride-2 tables for the pair kernel (one shard)."""

    code_of: np.ndarray  # uint8/int32 [256]: byte -> code (miss = sigma)
    code_bits: int  # CB
    p0_banks: np.ndarray  # int32 (2^(2CB)/128, 128) dense depths-1+2 table
    packed_banks: np.ndarray  # int32 (NB, 128): concat P_1..P_K
    side_banks: np.ndarray  # int32 (NS, 128): concat S_1..S_K (4 B/word)
    p_offs: tuple
    p_nbs: tuple
    p_k0s: tuple  # leading trimmed banks per P_k (ops.pallas_scan._lut k0)
    s_offs: tuple
    s_nbs: tuple
    s_k0s: tuple
    n_pair_steps: int  # K+1 = number of pair probes incl the dense P_0
    disp_miss: int  # dead/leaf displacement sentinel (entry-width bound)
    max_pat_len: int


def collect_alphabet(shard: ShardTables, class_tr, D: int,
                     max_sigma: int = MAX_SIGMA):
    """(code_of int32[256], sigma, cb): compact the dictionary bytes.

    Unused bytes (and the staging pad) map to the reserved miss code
    ``sigma``, which no stored entry contains."""
    used = np.zeros(256, dtype=bool)
    used[[c for c in range(256) if shard.s0[c] >= 0]] = True
    for li in range(D):
        for tr in class_tr[li]:
            for c, _ in tr:
                used[c] = True
    sigma = int(used.sum())
    if sigma > max_sigma:
        raise PairUnsupported(f"alphabet too large ({sigma} > {max_sigma})")
    cb = max(sigma.bit_length(), 1)
    code_of = np.full(256, sigma, dtype=np.int32)
    code_of[np.flatnonzero(used)] = np.arange(sigma, dtype=np.int32)
    return code_of, sigma, cb


def build_dense_p0(
    shard: ShardTables, class_fin, class_tr, s0_class, code_of, cb: int,
    D: int, landing_fn, miss: int,
) -> np.ndarray:
    """Dense depths-1+2 table: entry (disp << 2) | (fin2 << 1) | fin1,
    indexed by pair symbol (code2 << cb) | code1; -1 = no depth-1
    state.  ``landing_fn(cls)`` supplies the displacement stored for a
    depth-2 landing; fin1-only rows backfill EVERY second code
    (including the miss code) because a depth-1 match exists whatever
    follows it."""
    p0 = np.full(1 << (2 * cb), -1, dtype=np.int32)
    for c1 in range(256):
        u = int(shard.s0[c1])
        if u < 0:
            continue
        a = int(code_of[c1])
        u_cls = s0_class[u]
        fin1 = 1 if class_fin[0][u_cls] else 0
        seen_b = set()
        if D >= 2:
            for c2, v_cls in class_tr[0][u_cls]:
                bcode = int(code_of[c2])
                seen_b.add(bcode)
                fin2 = 1 if class_fin[1][v_cls] else 0
                p0[(bcode << cb) | a] = (
                    (landing_fn(v_cls) << 2) | (fin2 << 1) | fin1
                )
        if fin1:
            for bcode in range(1 << cb):
                if bcode not in seen_b:
                    p0[(bcode << cb) | a] = (miss << 2) | fin1
    return p0


def build_pair_tables(shard: ShardTables, *, minimize: bool = True) -> PairTables:
    if shard.max_pat_len > MAX_DEPTH_STEPS:
        raise PairUnsupported("max pattern length exceeds bitmap width")
    nf = shard.final_state_num
    init = nf + 1
    if shard.state_num <= init:
        raise PairUnsupported("degenerate automaton")
    dense = _reconstruct_dense(shard)
    dense[init] = shard.s0
    levels = _bfs_levels(dense, init)
    D = len(levels)
    if D == 0:
        raise PairUnsupported("empty automaton")
    if not minimize:
        raise PairUnsupported("pair tables require class minimization")
    class_fin, class_tr, s0_class = _minimize_levels(dense, levels, nf)

    # ---- alphabet coding -------------------------------------------------
    code_of, sigma, cb = collect_alphabet(shard, class_tr, D)
    pair_span = 1 << (2 * cb)

    # ---- per-even-level pair transitions + side entries ------------------
    # pair step k >= 1 walks from depth 2k classes.  K = number of
    # non-dense pair tables; step k covers depths 2k+1 (side) / 2k+2.
    K = (D - 1) // 2  # deepest start level with anything to cover: 2K < D
    val_shift = 2 * cb + 1
    # the miss sentinel must survive << val_shift inside an int32 entry
    pair_miss = (1 << (31 - val_shift)) - 1
    # trans[k]: rows = classes at depth 2k (level index 2k-1);
    #   cols_list[r] = pair symbols; vals[r] = (next_class, fin_end)
    p_cols: list[list[np.ndarray]] = []
    p_vals: list[list[list]] = []
    s_rows: list[list[list[int]]] = []  # final-odd-child codes per row
    for k in range(1, K + 1):
        li = 2 * k - 1  # classes at depth 2k
        trs = class_tr[li]
        cols_list, vals_list, side_list = [], [], []
        for tr in trs:
            cols, vals, side = [], [], []
            for c1, mid_cls in tr:
                a = int(code_of[c1])
                if class_fin[li + 1][mid_cls]:
                    side.append(a)
                if li + 2 < D:
                    for c2, end_cls in class_tr[li + 1][mid_cls]:
                        b = int(code_of[c2])
                        # pair symbol = (second << CB) | first: a row's
                        # columns spread across the whole span instead
                        # of clustering in one 2^CB block per mid
                        # child, which packs far tighter under the
                        # distinct-offset first-fit
                        cols.append((b << cb) | a)
                        vals.append((end_cls, class_fin[li + 2][end_cls]))
            order = np.argsort(cols) if cols else []
            cols_list.append(
                np.asarray(cols, dtype=np.int64)[order]
                if len(cols)
                else np.empty(0, dtype=np.int64)
            )
            vals_list.append([vals[i] for i in order] if len(cols) else [])
            side_list.append(side)
        p_cols.append(cols_list)
        p_vals.append(vals_list)
        s_rows.append(side_list)

    # ---- layouts (deep -> shallow so next-step disps are known) ----------
    offsets_k: list[np.ndarray] = [None] * (K + 1)  # 1-based
    ht_lens: list[int] = [0] * (K + 1)
    for k in range(1, K + 1):
        force = np.array(
            [len(s) > 0 for s in s_rows[k - 1]], dtype=bool
        )
        side_cols = [
            np.asarray(sorted(s), dtype=np.int64) for s in s_rows[k - 1]
        ]
        offsets, ht_len = _layout_with_growth(
            p_cols[k - 1], colspan=pair_span, force_offset=force,
            side_cols_list=side_cols,
        )
        offsets_k[k] = offsets
        ht_lens[k] = ht_len

    def disp_into(cls: int, k: int) -> int:
        """Displacement carried by a walker landing on a depth-2k class."""
        if k > K:
            return pair_miss
        off = offsets_k[k][cls]
        return int(off) if off != _EMPTY else pair_miss

    max_disp = pair_miss - 1

    # ---- fill pair + side tables -----------------------------------------
    p_tables, s_tables = [], []
    for k in range(1, K + 1):
        offsets = offsets_k[k]
        if offsets.max(initial=0) > max_disp:
            raise PairUnsupported("displacement exceeds entry bits")
        ptbl = np.full(ht_lens[k], -1, dtype=np.int32)
        stbl_len = ht_lens[k] + (1 << cb)
        sbytes = np.zeros(stbl_len, dtype=np.uint8)  # 0 = empty
        for r, cols in enumerate(p_cols[k - 1]):
            off = offsets[r]
            if off == _EMPTY:
                continue
            for j, pair in enumerate(cols):
                end_cls, fin_end = p_vals[k - 1][r][j]
                dn = disp_into(end_cls, k + 1)
                ptbl[off + int(pair)] = (
                    (dn << val_shift)
                    | (int(bool(fin_end)) << (2 * cb))
                    | int(pair)
                )
            for a in s_rows[k - 1][r]:
                sbytes[off + a] = a + 1
        p_tables.append(ptbl)
        # pack side bytes 4-per-int32 (little-endian)
        pad = (-len(sbytes)) % 4
        sb = np.concatenate([sbytes, np.zeros(pad, np.uint8)])
        s_tables.append(sb.view("<u4").astype(np.int64).astype(np.int32))

    # ---- dense P_0 (depths 1 + 2) ----------------------------------------
    p0 = build_dense_p0(
        shard, class_fin, class_tr, s0_class, code_of, cb, D,
        landing_fn=lambda cls: disp_into(cls, 1), miss=pair_miss,
    )

    trimmed_p = [_to_banks_trimmed(t) for t in p_tables]
    trimmed_s = [_to_banks_trimmed(t, fill=0) for t in s_tables]
    banked_p = [b for b, _ in trimmed_p]
    banked_s = [b for b, _ in trimmed_s]
    p_k0s = tuple(k for _, k in trimmed_p)
    s_k0s = tuple(k for _, k in trimmed_s)
    p_offs, p_nbs, acc = [], [], 0
    for b in banked_p:
        p_offs.append(acc)
        p_nbs.append(b.shape[0])
        acc += b.shape[0]
    s_offs, s_nbs, acc = [], [], 0
    for b in banked_s:
        s_offs.append(acc)
        s_nbs.append(b.shape[0])
        acc += b.shape[0]
    return PairTables(
        code_of=code_of,
        code_bits=cb,
        p0_banks=_to_banks(p0),
        packed_banks=(
            np.concatenate(banked_p)
            if banked_p
            else np.full((1, _LANE), -1, np.int32)
        ),
        side_banks=(
            np.concatenate(banked_s)
            if banked_s
            else np.zeros((1, _LANE), np.int32)
        ),
        p_offs=tuple(p_offs),
        p_nbs=tuple(p_nbs),
        p_k0s=p_k0s,
        s_offs=tuple(s_offs),
        s_nbs=tuple(s_nbs),
        s_k0s=s_k0s,
        n_pair_steps=K + 1,
        disp_miss=pair_miss,
        max_pat_len=shard.max_pat_len,
    )
