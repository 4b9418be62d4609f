"""phfpfac_tpu — TPU-native Parallel Failureless Aho-Corasick (PFAC) framework.

A brand-new JAX/XLA/Pallas implementation of exact multi-pattern string
matching with Perfect-Hash-Function (PHF) compressed transition tables.

Capabilities mirror the reference CUDA implementation (mickeyjoe666/PHFPFAC):

* host-side pattern compiler: newline-separated dictionary -> per-shard
  failureless Aho-Corasick tries (``phfpfac_tpu.compile.trie``)
* First-Fit-Descending-Method PHF table compaction
  (``phfpfac_tpu.compile.phf``)
* device scan: one logical walker per input byte offset, vectorized over
  TPU vector lanes (``phfpfac_tpu.ops``)
* parallel dispatch across a ``jax.sharding.Mesh`` with ``data`` (input
  byte stream, halo-overlapped) and ``patterns`` (dictionary shard) axes
  (``phfpfac_tpu.parallel``)
* a ``gphf``-compatible CLI producing byte-identical
  ``GPU_match_result.txt`` output (``phfpfac_tpu.cli``)

The architecture is TPU-first: tables live in VMEM, walks are vectorized
over (sublane, lane) tiles of byte offsets, scale-out uses shard_map +
XLA collectives instead of OpenMP + CUDA streams.
"""

__version__ = "0.1.0"

from phfpfac_tpu.compile.tables import (  # noqa: F401
    CompiledDictionary,
    ShardTables,
    compile_dictionary,
    compile_patterns,
)
from phfpfac_tpu.frontend.patterns import read_patterns, shard_patterns  # noqa: F401
from phfpfac_tpu.parallel.matcher import Matcher  # noqa: F401
from phfpfac_tpu.parallel.stream import StreamMatcher, match_many  # noqa: F401
from phfpfac_tpu.utils.config import PfacConfig  # noqa: F401
