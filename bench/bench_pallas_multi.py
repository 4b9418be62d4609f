"""Fused multi-shard pallas kernel throughput sweep on the real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.ops.common import pad_input, padded_steps
from phfpfac_tpu.ops.pallas_scan import multi_count_scanner
from phfpfac_tpu.utils.config import PfacConfig

def main():
    words = open("/root/reference/regex_GPU_PHF/xaa","rb").read().split()
    pats = [Pattern(i+1,w) for i,w in enumerate(dict.fromkeys(words))]
    base = open("/root/reference/regex_GPU_PHF/1M","rb").read()

    for mib in (1, 4):
        data = base * mib
        n = len(data)
        for num_shards, width in ((1, 4096), (2, 2048), (4, 1024), (8, 512)):
            cfg = PfacConfig(width=width, num_shards=num_shards)
            compiled = compile_patterns(pats, cfg)
            ms_ = padded_steps(compiled.max_pat_len)
            padded = pad_input(data, 1024, ms_)
            dev = jnp.asarray(padded)
            try:
                scan = multi_count_scanner(compiled.shards, ms_, cfg)
                v0 = int(np.asarray(scan(dev, jnp.int32(n), jnp.int32(0))))
            except Exception as e:
                print(f"{mib}MiB shards={num_shards}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)
                continue
            reps=[]
            K=10
            for _ in range(3):
                s = jnp.int32(0)
                t0=time.perf_counter()
                for _ in range(K):
                    s = scan(dev, jnp.int32(n), s % 2)
                _ = int(np.asarray(s))
                reps.append((time.perf_counter()-t0)/K)
            dt=float(np.median(reps))
            print(f"{mib}MiB shards={num_shards:2d} width={width:5d} matches={v0} "
                  f"{dt*1e3:9.2f} ms {n/dt/1e9:6.3f} GB/s", flush=True)

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
