"""Multi-host (multi-process) runtime: parallel.distributed.

Launches real separate processes coordinated by jax.distributed over
a local TCP coordinator, each with 4 virtual CPU devices — the
multi-host test harness the reference lacks entirely (SURVEY.md §4:
"multi-node without a cluster: not addressed")."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys, os, time
    sys.path.insert(0, {repo!r})
    pid, nproc, port, corpus = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from phfpfac_tpu.parallel.distributed import (
        MultiHostMatcher, initialize, local_slice,
    )
    initialize(f"localhost:{{port}}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.oracle.ac import match_oracle
    from phfpfac_tpu.utils.config import PfacConfig

    words = [b"the", b"then", b"there", b"cat", b"dog", b"do", b"a", b"an"]
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=256, num_shards=2)
    comp = compile_patterns(pats, cfg)
    data = open(corpus, "rb").read()

    # each host reads only its slice
    sl, start, total = local_slice(corpus)
    assert total == len(data)
    assert sl == data[start : start + len(sl)]

    mh = MultiHostMatcher(comp, cfg)
    got = [tuple(x) for x in mh.match_file(corpus).tolist()]
    want = match_oracle(pats, data, cfg)
    assert got == want, f"pid {{pid}}: {{len(got)}} vs {{len(want)}}"
    print(f"pid {{pid}} verified {{len(got)}} matches")
    """
)


@pytest.mark.slow
def test_two_process_match_file(tmp_path):
    data = b"the cat sat on the dog and then there was an end " * 200
    corpus = tmp_path / "corpus.bin"
    corpus.write_bytes(data)
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), str(corpus)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"pid {i} verified" in out


def test_multihost_single_process_rides_plan_mesh(tmp_path):
    """MultiHostMatcher prefers the flagship plan-mesh kernel when a
    pallas backend exists (interpret on CPU), matching the oracle; the
    turbo mesh stays the fallback elsewhere."""
    from phfpfac_tpu.compile.tables import compile_patterns
    from phfpfac_tpu.frontend.patterns import Pattern
    from phfpfac_tpu.oracle.ac import match_oracle
    from phfpfac_tpu.parallel.distributed import MultiHostMatcher
    from phfpfac_tpu.utils.config import PfacConfig

    words = [b"the", b"then", b"there", b"cat", b"dog", b"do", b"an"]
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=256, num_shards=2, truncation="none",
                     interpret=True)
    comp = compile_patterns(pats, cfg)
    data = b"the cat sat on the dog and then there was an end " * 120
    corpus = tmp_path / "c.bin"
    corpus.write_bytes(data)

    mh = MultiHostMatcher(comp, cfg)
    got = [tuple(x) for x in mh.match_file(str(corpus)).tolist()]
    assert got == match_oracle(pats, data, cfg)
    assert mh._plan is not None and not mh._plan_failed  # rode the plan

    # and the explicit fallback stays byte-identical
    got2 = [tuple(x) for x in mh.dm.match(data).tolist()]
    assert got2 == got
