"""Single-host matcher orchestration.

The TPU analog of the reference's per-shard dispatch loop
(main.cc:225-241): each dictionary shard scans the full input, results
are merged shard-major.  Engines:

* ``jnp``    — portable XLA engine (ops.reference_jnp)
* ``pallas`` — TPU Pallas kernel (ops.pallas_scan)

Multi-chip dispatch over a ``jax.sharding.Mesh`` lives in
``phfpfac_tpu.parallel.mesh``.
"""

from __future__ import annotations

from typing import Literal

import numpy as np

from phfpfac_tpu.compile.tables import CompiledDictionary
from phfpfac_tpu.ops.common import pad_input, padded_steps, walk_limits
from phfpfac_tpu.parallel.merge import merge_match_rows, render_result_file
from phfpfac_tpu.utils.config import PfacConfig
from phfpfac_tpu.utils.timing import PhaseTimer

_POS_PAD = 1024  # position-count padding granularity


class Matcher:
    """Scans inputs against a compiled dictionary."""

    def __init__(
        self,
        compiled: CompiledDictionary,
        config: PfacConfig,
        *,
        engine: Literal["jnp", "pallas"] = "jnp",
        timer: PhaseTimer | None = None,
    ):
        self.compiled = compiled
        self.config = config
        self.engine = engine
        self.timer = timer or PhaseTimer()

    def _slots(self) -> int:
        if self.config.match_slots > 0:
            return self.config.match_slots
        # full parity layout: a walk emits at most one match per step
        return max(self.compiled.max_pat_len, 1)

    def match_rows(
        self, data: bytes, *, input_size: int | None = None
    ) -> list[np.ndarray]:
        """Per-shard match rows [n_pos, slots] of shard-local final states."""
        if input_size is None:
            input_size = len(data)
        max_steps = padded_steps(self.compiled.max_pat_len)
        padded = pad_input(data, _POS_PAD, max_steps)
        n_pos = len(padded) - max_steps
        slots = self._slots()

        rows: list[np.ndarray] = []
        with self.timer.phase("match"):
            for shard in self.compiled.shards:
                limits = walk_limits(
                    n_pos, input_size, shard.max_pat_len, self.config
                )
                if self.engine == "jnp":
                    from phfpfac_tpu.ops.reference_jnp import scan_shard_jnp

                    out, _cnt = scan_shard_jnp(
                        shard, padded, limits, input_size, slots=slots
                    )
                else:
                    from phfpfac_tpu.ops.pallas_scan import scan_shard_pallas

                    out, _cnt = scan_shard_pallas(
                        shard,
                        padded,
                        limits,
                        input_size,
                        slots=slots,
                        interpret=self.config.interpret,
                    )
                rows.append(np.asarray(out))
        return rows

    def match(
        self, data: bytes, *, input_size: int | None = None
    ) -> np.ndarray:
        """Flat [(position, global pattern id)] in reference output order."""
        if input_size is None:
            input_size = len(data)
        rows = self.match_rows(data, input_size=input_size)
        return merge_match_rows(self.compiled, rows, input_size)

    def match_to_text(self, data: bytes, *, input_size: int | None = None) -> str:
        """GPU_match_result.txt-identical text."""
        return render_result_file(self.match(data, input_size=input_size))
