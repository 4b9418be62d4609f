"""Disk-backed AOT program artifacts (zero-trace cold start).

The persistent XLA cache (utils.cache) only skips *backend compile*;
a fresh process still pays Python tracing + Pallas->Mosaic lowering,
which for Snort-scale plan kernels is minutes of single-core CPU work
(bench/logs/r3_coldstart_diag.txt: ~212 s of silent lowering between
the last small compile and the first fetch, with the big kernel's
executable HITTING the cache).  The reference pays neither cost — its
kernel is SASS baked at build time (master_kernel.cu:406-408).

This module closes the gap with ``jax.export``: a warm process (the
CLI's --save-tables path, bench/coldstart.py phase 0, a serving
warmer) exports each scan program's StableHLO to
``<compile-cache>/aot/<name>-<key>.jaxexp``; a fresh process
deserializes the module bytes and jit-compiles them directly —
skipping tracing and lowering entirely — and that compile hits the
persistent XLA cache because the warm process compiled the exact same
deserialized module.

Keying: program name + jax version + backend + repr of the static
kwargs (table geometry, step plan, knobs) + arg shapes/dtypes.  Any
mismatch is a clean miss; a stale or incompatible artifact falls back
to the normal jit path.  Knobs:

* ``PHFPFAC_AOT_SAVE=1`` — export + save artifacts on miss (tracing
  twice is the save-time cost; default off so tests and everyday runs
  pay nothing).
* ``PHFPFAC_NO_AOT=1`` — bypass entirely (normal jit path).
"""

from __future__ import annotations

import hashlib
import os
import pathlib

_SAVE = "PHFPFAC_AOT_SAVE"
_OFF = "PHFPFAC_NO_AOT"

# path -> jitted exp.call (avoids re-jitting per call)
_loaded: dict = {}


def aot_dir() -> pathlib.Path:
    from phfpfac_tpu.utils.cache import _DEFAULT_DIR

    base = os.environ.get("PHFPFAC_COMPILE_CACHE_DIR") or os.path.abspath(
        _DEFAULT_DIR
    )
    return pathlib.Path(base) / "aot"


def _key(name: str, statics: dict, args: tuple) -> str:
    import jax

    from phfpfac_tpu.ops.pallas_plan import trace_knob_state

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(jax.default_backend().encode())
    h.update(trace_knob_state().encode())  # env knobs change kernels
    h.update(repr(sorted(statics.items())).encode())
    for a in jax.tree.leaves(args):  # args may be pytrees (stage16)
        h.update(f"{a.shape}|{a.dtype};".encode())
    return h.hexdigest()[:24]


def save_enabled() -> bool:
    return os.environ.get(_SAVE) == "1"


def aot_call(name: str, fn, args: tuple, statics: dict):
    """Run ``fn(*args, **statics)`` through the AOT artifact store.

    ``fn`` must be a jax.jit-wrapped function whose non-static
    arguments are exactly ``args`` (arrays / scalars).  Behavior is
    bit-identical to the direct call; only the trace/lower work moves.
    """
    if os.environ.get(_OFF) == "1":
        return fn(*args, **statics)
    try:
        import jax

        key = _key(name, statics, args)
    except Exception:
        return fn(*args, **statics)
    path = aot_dir() / f"{name}-{key}.jaxexp"
    cached = _loaded.get(path)
    if cached is not None:
        return cached(*args)
    if path.exists():
        try:
            exp = jax.export.deserialize(path.read_bytes())
            call = jax.jit(exp.call)
            out = call(*args)  # compile may still hit the XLA cache
            _loaded[path] = call
            return out
        except Exception:
            pass  # stale/incompatible artifact: fall back to jit
    if not save_enabled():
        return fn(*args, **statics)
    try:
        import functools

        exp = jax.export.export(
            jax.jit(functools.partial(fn, **statics))
        )(*jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args
        ))
        blob = exp.serialize()
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp%d" % os.getpid())
        tmp.write_bytes(blob)
        tmp.replace(path)
        # execute THROUGH the artifact so the persistent XLA cache is
        # warmed with the exact module a fresh process will compile
        exp2 = jax.export.deserialize(blob)
        call = jax.jit(exp2.call)
        out = call(*args)
        _loaded[path] = call
        return out
    except Exception:
        return fn(*args, **statics)
