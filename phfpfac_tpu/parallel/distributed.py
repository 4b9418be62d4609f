"""Multi-host scale-out: jax.distributed + per-host data parallelism.

The reference has no real multi-node story — multi-GPU is one process
with OpenMP threads (main.cc:180-241), and the author faked input
sharding by splitting corpora with ``split`` (the xae..xaj files,
SURVEY.md §2/§4).  The TPU-native replacement automates exactly that
split:

* ``initialize()`` — jax.distributed process bootstrap (coordinator +
  process id);
* the byte stream is sharded at HOST granularity (``local_slice``:
  each process seek/reads only its contiguous range, plus a
  ``max_pat_len - 1``-byte halo re-read from the file — walks crossing
  a host boundary survive without any DCN traffic, the cross-host
  version of the kernel's segment halo, master_kernel.cu:129-135);
* within a host, the slice is scanned on a host-local
  ("data", "patterns") mesh (parallel.mesh.DistributedMatcher), so ICI
  carries the device-level halo exchange and table replication;
* per-host match lists are exchanged with
  ``multihost_utils.process_allgather`` (sizes first, then padded
  payloads) and merged by position — positions partition across
  hosts, so the reference's (position, shard-major) output order is
  preserved exactly.

Single-process usage degrades gracefully to the mesh matcher plus the
IO helpers.
"""

from __future__ import annotations

import numpy as np

from phfpfac_tpu.compile.tables import CompiledDictionary
from phfpfac_tpu.parallel.mesh import DistributedMatcher, make_mesh
from phfpfac_tpu.utils.config import PfacConfig


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bootstrap jax.distributed (no-op for single-process runs)."""
    import jax

    if num_processes is None or num_processes == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_slice(path: str, *, input_size: int | None = None) -> tuple:
    """This host's contiguous byte-stream slice and global metadata.

    Returns (local_bytes, global_start, global_input_size).  Only the
    local range is read — no host touches the full corpus (the
    reference's xae..xaj manual split, automated).
    """
    import os

    import jax

    total = os.path.getsize(path)
    if input_size is None:
        input_size = total
    n_proc, pid = jax.process_count(), jax.process_index()
    block = -(-input_size // n_proc)
    start = min(pid * block, input_size)
    end = min(start + block, input_size)
    with open(path, "rb") as f:
        f.seek(start)
        data = f.read(end - start)
    return data, start, input_size


def _allgather_matches(local: np.ndarray) -> np.ndarray:
    """Exchange variable-length (pos, id) lists across processes."""
    from jax.experimental import multihost_utils

    sizes = np.asarray(
        multihost_utils.process_allgather(
            np.array([local.size], dtype=np.int64)
        )
    ).reshape(-1)
    cap = int(sizes.max(initial=0))
    if cap == 0:
        return np.empty((0, 2), dtype=np.int64)
    payload = np.zeros(cap, dtype=np.int64)
    payload[: local.size] = local.reshape(-1)
    gathered = np.asarray(multihost_utils.process_allgather(payload))
    gathered = gathered.reshape(len(sizes), cap)
    parts = [
        gathered[i, : int(sizes[i])].reshape(-1, 2)
        for i in range(len(sizes))
    ]
    return np.concatenate(parts)


class MultiHostMatcher:
    """Pod-wide PFAC matcher: hosts shard the input stream, each
    host's devices form a ("data", "patterns") mesh over its slice."""

    def __init__(
        self,
        compiled: CompiledDictionary,
        config: PfacConfig,
        *,
        n_patterns_axis: int | None = None,
    ):
        import jax

        local = jax.local_devices()
        n_dev = len(local)
        n_pat = n_patterns_axis or min(compiled.num_shards, n_dev)
        while n_dev % n_pat or compiled.num_shards % n_pat:
            n_pat -= 1
        self.mesh = make_mesh(n_dev // n_pat, n_pat, devices=local)
        self.dm = DistributedMatcher(compiled, config, self.mesh)
        self.compiled = compiled
        self.config = config
        self._local = local
        # flagship plan kernel over the local mesh (built lazily: its
        # profile-guided layout trains on the first input's head);
        # turbo mesh stays the fallback for shards the plan can't
        # express (charset, >32-step patterns, non-pow2 segments)
        self._plan = None
        self._plan_failed = False
        # which engine the last _match_local actually used ("plan" or
        # "turbo") — lets callers (and the driver dryrun) ASSERT the
        # flagship path ran instead of a silent warning-only fallback
        self.last_engine: str | None = None

    def _get_plan(self, train: bytes):
        import jax

        if self._plan_failed:
            return None
        if not (self.config.interpret or
                jax.default_backend() == "tpu"):
            self._plan_failed = True  # no pallas backend here
            return None
        if self._plan is None:
            from phfpfac_tpu.parallel.mesh_pallas import PlanMeshMatcher

            n_dev, ns = len(self._local), self.compiled.num_shards
            if n_dev % ns == 0:
                mesh = make_mesh(n_dev // ns, ns, devices=self._local)
            else:  # pure data mesh; shards loop on the host
                mesh = make_mesh(n_dev, 1, devices=self._local)
            try:
                self._plan = PlanMeshMatcher(
                    self.compiled, self.config, mesh,
                    interpret=self.config.interpret, train=train,
                )
            except Exception as e:  # noqa: BLE001 — expected fallback
                import warnings

                warnings.warn(
                    f"plan mesh unavailable ({type(e).__name__}: {e}); "
                    f"multi-host path falls back to the turbo mesh"
                )
                self._plan_failed = True
                return None
        return self._plan

    def _match_local(self, data: bytes, input_size: int):
        plan = self._get_plan(bytes(data[: 1 << 20]))
        if plan is not None:
            try:
                out = plan.match(data, input_size=input_size)
                self.last_engine = "plan"
                return out
            except Exception as e:  # noqa: BLE001 — expected fallback
                import warnings

                warnings.warn(
                    f"plan mesh scan failed ({type(e).__name__}: {e}); "
                    f"falling back to the turbo mesh"
                )
                self._plan_failed = True
        self.last_engine = "turbo"
        return self.dm.match(data, input_size=input_size)

    def match(self, data: bytes, *, input_size: int | None = None):
        """Match when this host holds the whole input (single-host or
        replicated-corpus mode)."""
        if input_size is None:
            input_size = len(data)
        return self._match_local(data, input_size)

    def match_file(self, path: str, *, input_size: int | None = None):
        """Cooperatively match a corpus file, each host reading only
        its slice; every host returns the full merged match list."""
        import jax

        if jax.process_count() == 1:
            with open(path, "rb") as f:
                data = f.read()
            if input_size is None:
                input_size = len(data)
            return self._match_local(data, input_size)

        data, start, input_size = local_slice(path, input_size=input_size)
        halo = max(self.compiled.max_pat_len - 1, 0)
        with open(path, "rb") as f:
            f.seek(start + len(data))
            tail = f.read(halo)
        ext = data + tail

        local = np.asarray(
            self._match_local(ext, min(len(ext), input_size - start))
        )
        # keep matches starting inside this host's slice; global coords
        if local.size:
            local = local[local[:, 0] < max(len(data), 1)]
            local = local + np.array([start, 0], dtype=np.int64)
        out = _allgather_matches(local.astype(np.int64))
        # positions partition across hosts and each part is already in
        # reference order, so a stable sort by position reproduces the
        # global reference order
        order = np.argsort(out[:, 0], kind="stable")
        return out[order]
