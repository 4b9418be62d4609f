"""scan_chain parity + the AOT artifact store (utils/aot.py)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.ops.common import pad_input, padded_steps
from phfpfac_tpu.ops.pallas_plan import plan_count_scanner
from phfpfac_tpu.utils.config import PfacConfig


def _setup():
    words = [b"the", b"he", b"she", b"hers", b"a", b"an", b"and", b"stream"]
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    compiled = compile_patterns(pats, PfacConfig(width=256, num_shards=1))
    rng = np.random.default_rng(0)
    data = bytes(rng.choice(list(b"theandrsm "), 1 << 15).astype(np.uint8))
    return compiled, data


@pytest.mark.parametrize("compact", ["off", 1])
def test_scan_chain_matches_scan(compact):
    compiled, data = _setup()
    n = len(data)
    ms = padded_steps(compiled.max_pat_len)
    padded = pad_input(data, 1024, ms)
    sc = plan_count_scanner(
        compiled.shards[0], ms, interpret=True, train=data[:4096],
        compact=compact,
    )
    dev = sc.prepare(padded, n)
    t1 = int(np.asarray(sc.scan(dev, jnp.int32(n), jnp.int32(0))))
    # k=3 chain: last iteration's shift parity depends on the totals;
    # totals are even for this corpus so shift stays 0 and the final
    # count must equal the single scan's
    tc = int(np.asarray(sc.scan_chain(dev, jnp.int32(n), jnp.int32(0), 3)))
    assert t1 == tc
    assert not sc.check_overflow()


def test_aot_call_roundtrip(tmp_path, monkeypatch):
    from phfpfac_tpu.utils import aot

    monkeypatch.setenv("PHFPFAC_COMPILE_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("PHFPFAC_AOT_SAVE", "1")
    aot._loaded.clear()

    calls = {"n": 0}

    @functools.partial(jax.jit, static_argnames=("k",))
    def f(x, *, k):
        calls["n"] += 1  # traces count, not executions
        return (x * k).sum()

    x = jnp.arange(256, dtype=jnp.int32).reshape(2, 128)
    expect = int((np.arange(256) * 3).sum())
    out = aot.aot_call("toy", f, (x,), {"k": 3})
    assert int(out) == expect
    arts = list((tmp_path / "aot").glob("toy-*.jaxexp"))
    assert len(arts) == 1, "artifact written on save-mode miss"

    # fresh-process simulation: drop the in-memory handle, call again —
    # must serve from the artifact without re-tracing f
    aot._loaded.clear()
    calls["n"] = 0
    out2 = aot.aot_call("toy", f, (x,), {"k": 3})
    assert int(out2) == expect
    assert calls["n"] == 0, "served from artifact, no retrace"

    # different statics -> different key -> normal path (no artifact
    # unless saved); save mode writes a second artifact
    out3 = aot.aot_call("toy", f, (x,), {"k": 5})
    assert int(out3) == int((np.arange(256) * 5).sum())
    assert len(list((tmp_path / "aot").glob("toy-*.jaxexp"))) == 2

    # kill switch bypasses artifacts entirely
    monkeypatch.setenv("PHFPFAC_NO_AOT", "1")
    out4 = aot.aot_call("toy", f, (x,), {"k": 3})
    assert int(out4) == expect


def test_aot_call_stale_artifact_falls_back(tmp_path, monkeypatch):
    from phfpfac_tpu.utils import aot

    monkeypatch.setenv("PHFPFAC_COMPILE_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("PHFPFAC_AOT_SAVE", raising=False)
    aot._loaded.clear()

    @jax.jit
    def g(x):
        return x + 1

    x = jnp.int32(41)
    key = aot._key("g", {}, (x,))
    p = aot.aot_dir() / f"g-{key}.jaxexp"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(b"not a serialized module")
    assert int(aot.aot_call("g", g, (x,), {})) == 42


def test_match_chunked_device_data():
    """Upload-free chunked matching (device-resident corpus windows)
    is byte-identical to match() and to host-upload chunking."""
    from phfpfac_tpu.parallel.matcher import Matcher

    compiled, data = _setup()
    cfg = PfacConfig(width=256, num_shards=1, interpret=True)
    m = Matcher(compiled, cfg, engine="pallas", train=data[:4096])
    want = m.match(data)
    dev = m.stage_for_chunked(data, chunk_bytes=8192)
    got = m.match_chunked(data, chunk_bytes=8192, device_data=dev)
    np.testing.assert_array_equal(want, got)
    got2 = m.match_chunked(data, chunk_bytes=8192)
    np.testing.assert_array_equal(want, got2)


def test_merge_sorted_fast_path_matches_lexsort():
    """The sorted-parts merge shortcuts (no-sort emit / single stable
    argsort) must reproduce the (pos, shard, step) lexsort contract on
    random multi-shard inputs, including ties at equal positions."""
    from phfpfac_tpu.parallel import merge as M

    words = [b"the", b"he", b"she", b"hers", b"a", b"an", b"and",
             b"stream", b"rust", b"iron"]
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    compiled = compile_patterns(pats, PfacConfig(width=256, num_shards=3))
    rng = np.random.default_rng(3)
    for trial in range(20):
        parts = []
        for sh in compiled.shards:
            k = int(rng.integers(0, 50))
            pos = np.sort(rng.integers(0, 40, k))
            step = rng.integers(0, 5, k)
            # sort within part by (pos, step) — the decode contract
            o = np.lexsort((step, pos))
            local = rng.integers(0, sh.final_state_num, k)
            parts.append(
                np.stack([pos[o], step[o], local], axis=1).astype(np.int64)
            )
        got = M.merge_flat_matches(compiled, parts, 40)
        # oracle: the explicit 3-key lexsort
        pos = np.concatenate([p[:, 0] for p in parts])
        step = np.concatenate([p[:, 1] for p in parts])
        shard = np.concatenate(
            [np.full(len(p), i) for i, p in enumerate(parts)]
        )
        ids = np.concatenate(
            [
                compiled.shards[i].pattern_id_map[p[:, 2]]
                for i, p in enumerate(parts)
            ]
        ).astype(np.int64)
        order = np.lexsort((step, shard, pos))
        want = np.stack([pos[order], ids[order]], axis=1)
        np.testing.assert_array_equal(got, want)


def test_merge_unsorted_parts_fall_back():
    """Parts violating the (pos, step) order must take the lexsort
    path and still produce contract order."""
    from phfpfac_tpu.parallel import merge as M

    compiled, _ = _setup()
    sh = compiled.shards[0]
    part = np.array(
        [[5, 1, 0], [5, 0, 1], [2, 0, 0]], dtype=np.int64
    )  # pos decreasing + step swap: unsorted
    got = M.merge_flat_matches(compiled, [part], 40)
    assert list(got[:, 0]) == [2, 5, 5]
    ids = sh.pattern_id_map
    assert list(got[:, 1]) == [ids[0], ids[1], ids[0]]
