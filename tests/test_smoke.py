"""Environment smoke tests — the omp_hello analog (SURVEY.md §2).

The reference ships an OpenMP hello-world to sanity-check its host
parallel backend; the equivalent here is that the virtual device mesh
exists and a trivial collective runs over both axes."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from phfpfac_tpu.parallel.mesh import make_mesh


def test_devices_present():
    assert len(jax.devices()) >= 8  # conftest forces 8 virtual devices


def test_mesh_collectives_both_axes():
    mesh = make_mesh(4, 2)

    def cell(x):
        s = jax.lax.psum(x, "data")
        return jax.lax.psum(s, "patterns")

    f = jax.shard_map(
        cell, mesh=mesh, in_specs=P("data", "patterns"), out_specs=P()
    )
    x = jnp.arange(8.0).reshape(4, 2)
    np.testing.assert_allclose(np.asarray(f(x)), x.sum())


def test_host_thread_pool():
    # the reference's omp_hello: host threads actually run concurrently
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        assert sorted(pool.map(lambda i: i * i, range(8))) == [
            i * i for i in range(8)
        ]
