"""Engine selection for benchmark/serving entry points.

``best_count_scanner`` returns the fastest available count-mode scan
for one shard: the Pallas banked-LUT kernel when the tables fit its
constraints, else the XLA fori-loop scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phfpfac_tpu.compile.tables import ShardTables
from phfpfac_tpu.ops.turbo_jnp import build_turbo_tables


def xla_count_scanner(shard: ShardTables, max_steps: int):
    """Count-mode scan: full-width fori walk, XLA gathers.

    Returned fn(data_padded_u8[n_pos+max_steps], input_size, shift)
    -> int32 total match count over positions [shift, input_size).
    ``shift`` exists so benchmark harnesses can chain calls with
    distinct computations (see bench.py methodology note).
    """
    tt = build_turbo_tables(shard)
    s0 = jnp.asarray(tt.s0)
    r = jnp.asarray(tt.r)
    tbl_a = jnp.asarray(tt.packed if tt.is_packed else tt.ht)
    tbl_b = jnp.asarray(tt.val) if tt.val is not None else None
    wb, rb = tt.width_bit, tt.row_bits
    dead, nf = tt.dead, tt.num_final
    width_m1 = (1 << wb) - 1
    row_mask = (1 << rb) - 1

    @jax.jit
    def scan(data, input_size, shift):
        n_pos = data.shape[0] - max_steps
        pos = jnp.arange(n_pos, dtype=jnp.int32)
        chars = data.astype(jnp.int32)
        lim = jnp.minimum(input_size, pos + max_steps)
        valid = (pos >= shift) & (pos < input_size)
        state = jnp.where(valid, jnp.take(s0, chars[:n_pos]), dead)
        cnt = (state < nf).astype(jnp.int32)

        def body(t, carry):
            state, cnt = carry
            state = jnp.where(pos + t < lim, state, dead)
            ch = jax.lax.dynamic_slice(chars, (t,), (n_pos,))
            key = (state << 8) + ch
            row = jax.lax.shift_right_logical(key, wb)
            col = key & width_m1
            idx = jnp.take(r, row, mode="clip") + col
            if tbl_b is None:
                g = jnp.take(tbl_a, idx, mode="clip")
                hit = (g & row_mask) == row
                nxt = jax.lax.shift_right_logical(g, rb)
            else:
                hrow = jnp.take(tbl_a, idx, mode="clip")
                hit = hrow == row
                nxt = jnp.take(tbl_b, idx, mode="clip")
            state = jnp.where(hit, nxt, dead)
            cnt = cnt + (state < nf).astype(jnp.int32)
            return state, cnt

        _, cnt = jax.lax.fori_loop(1, max_steps, body, (state, cnt))
        return cnt.sum()

    return scan


def best_count_scanner(shard: ShardTables, max_steps: int,
                       train: bytes | None = None, **plan_kw):
    """Fastest available count-mode scan for one shard.

    Preference order: cost-planned hybrid-stride kernel
    (ops.pallas_plan — compact alphabets) > stride-2 pair kernel >
    depth-stratified kernel (any leveled automaton, max_pat_len <= 32)
    > banked-LUT pallas kernel > XLA fori-loop scan.  ``train`` is an
    optional profile corpus for the plan kernel's profile-guided
    layout + grouped bank scan (exact for any input).
    """
    def _attempt(make):
        try:
            return make()
        except ValueError:
            return None  # Pair/DepthUnsupported — expected fallback
        except Exception as e:  # noqa: BLE001
            import warnings

            warnings.warn(
                f"scanner construction failed unexpectedly "
                f"({type(e).__name__}: {e}); falling back"
            )
            return None

    from phfpfac_tpu.ops.pallas_depth import depth_count_scanner
    from phfpfac_tpu.ops.pallas_pair import pair_count_scanner
    from phfpfac_tpu.ops.pallas_plan import plan_count_scanner

    scan = _attempt(
        lambda: plan_count_scanner(shard, max_steps, train=train,
                                   **plan_kw)
    )
    if scan is not None:
        return scan
    for maker in (pair_count_scanner, depth_count_scanner):
        scan = _attempt(lambda m=maker: m(shard, max_steps))
        if scan is not None:
            return scan
    try:
        from phfpfac_tpu.ops.pallas_scan import pallas_count_scanner

        return pallas_count_scanner(shard, max_steps)
    except Exception:  # noqa: BLE001 — pallas path optional until stable
        return xla_count_scanner(shard, max_steps)
