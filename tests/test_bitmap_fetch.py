"""fetch_hit_bits: all three transfer regimes return identical
(pos, bits) to a naive host-side nonzero over the plane.

The branch taken depends on hit layout (clustered vs spread) and plane
size; thresholds are monkeypatched so every branch runs at test shapes.
"""

import numpy as np
import pytest

from phfpfac_tpu.ops import bitmap


def _naive(plane: np.ndarray, input_size: int):
    flat = plane[:input_size].view(np.uint32)
    pos = np.nonzero(flat)[0].astype(np.int64)
    return pos, flat[pos]


def _check(plane: np.ndarray, input_size: int):
    import jax.numpy as jnp

    got_pos, got_bits = bitmap.fetch_hit_bits(
        jnp.asarray(plane), input_size
    )
    want_pos, want_bits = _naive(plane, input_size)
    np.testing.assert_array_equal(got_pos, want_pos)
    np.testing.assert_array_equal(got_bits, want_bits)


def _plane(n, rng, density, clustered):
    plane = np.zeros(n, np.int32)
    k = max(1, int(n * density))
    if clustered:
        start = rng.integers(0, n - k)
        idx = np.arange(start, start + k)
    else:
        idx = rng.choice(n, size=k, replace=False)
    plane[idx] = rng.integers(1, 2**31 - 1, size=k, dtype=np.int32)
    return plane


@pytest.mark.parametrize("clustered", [True, False])
@pytest.mark.parametrize("density", [0.0005, 0.02, 0.6])
def test_fetch_regimes(clustered, density, monkeypatch):
    # force the compacted path to be reachable at small planes
    monkeypatch.setattr(bitmap, "_BULK_POSITIONS", 1 << 12)
    rng = np.random.default_rng(int(density * 1e4) + clustered)
    n = 64 * 1024
    plane = _plane(n, rng, density, clustered)
    # input_size below the padded plane: tail hits must be dropped
    input_size = n - 1500
    plane[input_size + 3] = 7  # a hit in the padding zone
    _check(plane, input_size)


def test_fetch_empty_and_tiny(monkeypatch):
    monkeypatch.setattr(bitmap, "_BULK_POSITIONS", 1 << 12)
    _check(np.zeros(8192, np.int32), 8000)
    one = np.zeros(8192, np.int32)
    one[0] = 1
    one[7999] = 2**30
    _check(one, 8000)


def test_fetch_bulk_small_plane():
    # below _BULK_POSITIONS the spread case must take the bulk branch
    rng = np.random.default_rng(0)
    plane = _plane(16 * 1024, rng, 0.01, clustered=False)
    _check(plane, 16 * 1024)


@pytest.mark.parametrize("high_frac", [0.0, 0.03, 1.0])
def test_fetch_dense_u8_plane(high_frac, monkeypatch):
    """Dense regime (u8 plane + high-bit exception list): exceptions
    whose low byte is zero, nonzero, or absent all reconstruct the
    exact (pos, bits) set."""
    monkeypatch.setattr(bitmap, "_BULK_POSITIONS", 1 << 12)
    rng = np.random.default_rng(int(high_frac * 100))
    n = 64 * 1024
    plane = np.zeros(n, np.int32)
    idx = rng.choice(n, size=n // 3, replace=False)  # ~33% density
    plane[idx] = rng.integers(1, 256, size=idx.size, dtype=np.int32)
    n_high = int(idx.size * high_frac)
    if n_high:
        hsel = rng.choice(idx, size=n_high, replace=False)
        # half keep their low byte, half are high-bits-only
        plane[hsel] |= rng.integers(1, 1 << 23, size=n_high,
                                    dtype=np.int32) << 8
        plane[hsel[: n_high // 2]] &= ~0xFF
    input_size = n - 777
    plane[input_size + 5] = 1 << 20  # padding-zone hit must drop
    _check(plane, input_size)


def test_device_gather_shape_cache_across_plane_lengths():
    """The jitted two-level gather is cached by (cap, high_only,
    cap_blocks); jit re-traces per input SHAPE, so the plane geometry
    must come from the traced shape, not build-time closures — r5
    regression: StreamMatcher's first-feed window (one pad block
    shorter than tail-extended feeds) hit a stale-nb reshape error."""
    import numpy as np

    from phfpfac_tpu.ops.bitmap import _device_gather

    rng = np.random.default_rng(3)

    def plane(n, hits):
        b = np.zeros(n, dtype=np.int32)
        idx = rng.choice(n, size=hits, replace=False)
        b[idx] = 7
        return b, set(idx.tolist())

    for n in (16 * 1024, 17 * 1024):  # different lengths, same caps
        b, want = plane(n, 50)
        pos, vals = _device_gather(b, n, cap=64, cap_blocks=16)
        pos = np.asarray(pos)
        got = set(int(p) for p in pos[pos < n].tolist())
        assert got == want, f"n={n}"
