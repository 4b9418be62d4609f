"""Persistent executable cache (compile-once, reuse across processes).

The reference pays zero compile cost — nvcc compiles ``TraceTable_kernel``
once at build time and every run launches the same SASS
(master_kernel.cu:406-408).  The TPU rebuild JIT-compiles its Mosaic
kernels per (table-geometry, input-shape) signature, and the widest
plans cost minutes of XLA/Mosaic compile (PERF.md "Mosaic compile
latency").  This module wires JAX's persistent compilation cache to an
on-disk directory so a fresh process reuses every previously compiled
executable: start-to-first-byte at Snort scale drops from minutes to
the host table-build time.

Enabled by default from the CLI / bench / driver entry points; opt out
with ``PHFPFAC_NO_COMPILE_CACHE=1`` or relocate with
``PHFPFAC_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")

_enabled = False


def _host_key() -> str:
    """Short digest of the host CPU identity (model + ISA flags)."""
    import hashlib
    import platform

    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    ident += "|" + line.strip()
                    if ident.count("|") >= 2:
                        break
    except OSError:
        ident += "|" + (platform.processor() or "")
    return hashlib.sha256(ident.encode()).hexdigest()[:12]


def honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` effective under the site hook.

    This rig's site hook pre-registers the TPU plugin, which overrides
    the ``JAX_PLATFORMS`` environment variable; re-applying the value
    through ``jax.config`` wins (a stalled TPU tunnel otherwise hangs
    CPU-only runs at backend init).  No-op when the variable is unset.
    """
    v = os.environ.get("JAX_PLATFORMS")
    if v:
        import jax

        jax.config.update("jax_platforms", v)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's compilation cache at an on-disk directory.

    Idempotent; returns the cache dir (or None when disabled by env).
    Safe to call before or after backend initialization.  Also applies
    ``honor_platform_env`` so every entry point that enables the cache
    (CLI, bench harnesses, the driver hooks) respects ``JAX_PLATFORMS``.
    """
    global _enabled
    honor_platform_env()
    if os.environ.get("PHFPFAC_NO_COMPILE_CACHE"):
        return None
    path = (
        cache_dir
        or os.environ.get("PHFPFAC_COMPILE_CACHE_DIR")
        or os.path.abspath(_DEFAULT_DIR)
    )
    # HOST-KEYED subdirectory: CPU-path executables embed host ISA
    # features, and a cache entry compiled on a different host triggers
    # XLA's "could lead to SIGILL" warning (observed in the r4 driver
    # dryrun capture, VERDICT weak #5) or worse.  Keying by the CPU
    # model + feature flags makes entries host-compatible by
    # construction while still sharing across same-CPU processes.
    path = os.path.join(path, _host_key())
    if _enabled:
        return path
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took real compile time; tiny executables
    # are cheaper to recompile than to hash/load
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return path
