"""gphf-compatible command-line interface.

Usage (README.md:12 of the reference):

    python -m phfpfac_tpu.cli <pattern file> <stream number> <hash table width> <input file>

Produces ``GPU_match_result.txt`` with lines
``At position %4d, match pattern %d`` (main.cc:335-350) plus the
reference's phase-timing taxonomy (main.cc:279-287) and PHF stats
(phf.c:262-282) on stdout.

Notes on fidelity:

* shard count = 4 * streamnum, reproducing the intended configuration
  (create_table_reorder.c:207 hardcodes GPU_S = 4); ``--num-shards``
  overrides.  The merged output is shard-count invariant.
* ``input_size = filesize - 1`` (main.cc:138 ``ftell(fpin)-1`` —
  assumes a trailing newline and drops it); ``--full-input`` disables
  the quirk.
* walk truncation defaults to the reference's 4 KiB segment + 512 B
  halo (master_kernel.cu:8-11); ``--exact`` removes the truncation.
"""

from __future__ import annotations

import argparse
import os
import sys

from phfpfac_tpu.compile.tables import compile_dictionary
from phfpfac_tpu.parallel.matcher import Matcher
from phfpfac_tpu.utils.config import PfacConfig
from phfpfac_tpu.utils.timing import PhaseTimer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gphf",
        description="TPU-native PFAC multi-pattern matcher (PHFPFAC-compatible)",
    )
    p.add_argument("pattern_file")
    p.add_argument("streamnum", type=int, help="streams per device (shards = 4*streamnum)")
    p.add_argument("width", type=int, help="PHF hash table width (power of two)")
    p.add_argument("input_file")
    p.add_argument("-o", "--output", default="GPU_match_result.txt")
    p.add_argument("--num-shards", type=int, default=None,
                   help="override shard count (default 4*streamnum)")
    p.add_argument("--engine", choices=["turbo", "jnp", "pallas"],
                   default="pallas",
                   help="pallas = the TPU kernels (plan/pair/depth, "
                        "segment-cut aware) with exact-XLA fallbacks; "
                        "turbo/jnp = portable XLA engines")
    p.add_argument("--exact", action="store_true",
                   help="disable reference segment+halo walk truncation")
    p.add_argument("--full-input", action="store_true",
                   help="scan all filesize bytes (reference scans filesize-1)")
    p.add_argument("--escapes", action="store_true",
                   help="decode \\xNN, \\ooo and C escapes in patterns (fgetc_ext)")
    p.add_argument("--charset", action="store_true",
                   help="enable [a-z] / [^...] charset classes in patterns "
                        "(NFA->DFA frontend; shards like plain dicts)")
    p.add_argument("--save-tables", default=None,
                   help="serialize compiled tables to this .npz path")
    p.add_argument("--load-tables", default=None,
                   help="load compiled tables instead of building")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of the match phase")
    mh = p.add_argument_group("multi-host (jax.distributed)")
    mh.add_argument("--coordinator", default=None,
                    help="coordinator address host:port")
    mh.add_argument("--num-processes", type=int, default=1)
    mh.add_argument("--process-id", type=int, default=0)
    mh.add_argument("--mesh", action="store_true",
                    help="scan on a (data x patterns) device mesh even "
                         "single-process (all local devices)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from phfpfac_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # also applies honor_platform_env
    if args.num_processes > 1:
        from phfpfac_tpu.parallel.distributed import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)
    num_shards = args.num_shards or 4 * args.streamnum
    interpret = False
    if args.engine == "pallas":
        import jax

        # pallas compiles only for TPU; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    cfg = PfacConfig(
        width=args.width,
        num_shards=num_shards,
        truncation="none" if args.exact else "segment",
        match_slots=0,  # full parity layout
        interpret=interpret,
    )
    timer = PhaseTimer()

    with timer.phase("create_pfac"):
        if args.load_tables:
            from phfpfac_tpu.compile.tables import CompiledDictionary

            compiled = CompiledDictionary.load(args.load_tables)
        elif args.charset:
            from phfpfac_tpu.compile.tables import compile_class_patterns
            from phfpfac_tpu.frontend.charset import read_class_patterns

            compiled = compile_class_patterns(
                read_class_patterns(args.pattern_file), cfg
            )
        else:
            compiled = compile_dictionary(
                args.pattern_file, cfg, escapes=args.escapes,
                verbose=not args.quiet,
            )
    # save immediately (a failed scan must not cost the compile), then
    # pallas single-host runs RE-save after the scan so the built plan
    # tables ride along (format v3: a later --load-tables run skips
    # the trie + plan build, bench/coldstart.py)
    if args.save_tables:
        compiled.save(args.save_tables)
        if not interpret:
            # a --save-tables run is the explicit "build" step: also
            # export AOT scan artifacts (utils/aot.py) so later runs
            # at the same input shape skip trace+lowering entirely
            os.environ.setdefault("PHFPFAC_AOT_SAVE", "1")
    resave_with_plan = (
        args.save_tables and args.engine == "pallas"
        and not (args.num_processes > 1 or args.mesh)
    )

    for i, sh in enumerate(compiled.shards):
        if not args.quiet:
            # mirrors main.cc:113-117
            print(f"state num on shard {i} : {sh.state_num}")
            print(f"final state num on shard {i} : {sh.final_state_num}")
            print(f"max pattern length on shard {i} : {sh.max_pat_len}")

    file_size = os.path.getsize(args.input_file)
    input_size = file_size if args.full_input else max(file_size - 1, 0)
    if not args.quiet:
        print(f"input size is {input_size} char")  # main.cc:140

    import contextlib

    prof = contextlib.nullcontext()
    if args.profile:
        import jax

        prof = jax.profiler.trace(args.profile)

    if args.num_processes > 1 or args.mesh:
        from phfpfac_tpu.parallel.distributed import MultiHostMatcher
        from phfpfac_tpu.parallel.merge import render_result_file

        mh = MultiHostMatcher(compiled, cfg)
        with prof, timer.phase("match"):
            matches = mh.match_file(args.input_file, input_size=input_size)
        text = render_result_file(matches)
        write_out = args.process_id == 0
    else:
        with open(args.input_file, "rb") as f:
            data = f.read()
        matcher = Matcher(compiled, cfg, engine=args.engine, timer=timer)
        with prof:
            # big inputs scan in pipelined chunks: chunk i+1's
            # upload+scan overlaps chunk i's result download/decode
            # (match_chunked falls through to one-shot when small)
            from phfpfac_tpu.parallel.merge import render_result_file

            text = render_result_file(
                matcher.match_chunked(data, input_size=input_size)
            )
        if resave_with_plan:
            try:
                plan = matcher.built_plan_tables()
            except Exception:  # noqa: BLE001 — scanner construction
                plan = None  # may raise where the scan fell back
            if plan and any(p is not None for p in plan):
                compiled.plan_tables = plan
                compiled.save(args.save_tables)
        write_out = True

    if write_out:
        with open(args.output, "w") as f:
            f.write(text)

    if not args.quiet:
        print(timer.report())
        match_s = timer.phases.get("match")
        if match_s:
            # the reference's throughput line (older gphf binary;
            # commented out in current main.cc:285)
            print(
                f"The throughput is {input_size * 8 / match_s / 1e9:.6f} Gbps"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
