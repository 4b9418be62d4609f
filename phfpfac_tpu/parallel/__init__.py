from phfpfac_tpu.parallel.merge import merge_match_rows, render_result_file  # noqa: F401
