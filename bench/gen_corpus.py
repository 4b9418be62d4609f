"""Benchmark-corpus generator.

Port of the reference's corpus tooling (SURVEY.md §2):
* ``creatbiginput.sh:1-5`` — replicate a seed file N times;
* ``creatfile.sh`` — doubling loop (broken Windows syntax there; fixed
  here as ``--double``);
* the ``bytefile/`` size series (10 KB .. 1 MB truncations of a seed)
  used for the reference's throughput scaling curves.

Usage:
  python bench/gen_corpus.py replicate SEED OUT [--times 10000]
  python bench/gen_corpus.py double SEED OUT [--rounds 10]
  python bench/gen_corpus.py series SEED OUTDIR [--sizes 10000,50000,...]
  python bench/gen_corpus.py random OUT --bytes N [--seed 0] [--alpha]
"""

from __future__ import annotations

import argparse
import os


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    rep = sub.add_parser("replicate", help="cat SEED OUT x times")
    rep.add_argument("seed")
    rep.add_argument("out")
    rep.add_argument("--times", type=int, default=10000)

    dbl = sub.add_parser("double", help="double SEED's content N rounds")
    dbl.add_argument("seed")
    dbl.add_argument("out")
    dbl.add_argument("--rounds", type=int, default=10)

    ser = sub.add_parser("series", help="bytefile/-style size series")
    ser.add_argument("seed")
    ser.add_argument("outdir")
    ser.add_argument(
        "--sizes",
        default="10000,50000,100000,150000,200000,300000,400000,"
        "500000,600000,700000,800000,900000,1000000",
    )

    rnd = sub.add_parser("random", help="uniform random bytes")
    rnd.add_argument("out")
    rnd.add_argument("--bytes", type=int, required=True, dest="nbytes")
    rnd.add_argument("--seed", type=int, default=0)
    rnd.add_argument("--alpha", action="store_true",
                     help="lowercase letters + space instead of full bytes")

    args = p.parse_args()

    if args.cmd == "replicate":
        blob = open(args.seed, "rb").read()
        with open(args.out, "wb") as f:
            for _ in range(args.times):
                f.write(blob)
        print(f"{args.out}: {len(blob) * args.times} bytes")
    elif args.cmd == "double":
        blob = open(args.seed, "rb").read()
        for _ in range(args.rounds):
            blob = blob + blob
        open(args.out, "wb").write(blob)
        print(f"{args.out}: {len(blob)} bytes")
    elif args.cmd == "series":
        seed = open(args.seed, "rb").read()
        os.makedirs(args.outdir, exist_ok=True)
        for size in (int(s) for s in args.sizes.split(",")):
            blob = (seed * (size // len(seed) + 1))[:size]
            path = os.path.join(args.outdir, f"{size}byte")
            open(path, "wb").write(blob)
            print(f"{path}: {size} bytes")
    elif args.cmd == "random":
        import numpy as np

        rng = np.random.default_rng(args.seed)
        if args.alpha:
            alphabet = np.frombuffer(
                b"abcdefghijklmnopqrstuvwxyz ", dtype=np.uint8
            )
            blob = alphabet[rng.integers(0, len(alphabet), args.nbytes)]
        else:
            blob = rng.integers(0, 256, args.nbytes).astype(np.uint8)
        open(args.out, "wb").write(blob.tobytes())
        print(f"{args.out}: {args.nbytes} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
