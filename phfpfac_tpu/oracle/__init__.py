from phfpfac_tpu.oracle.ac import match_oracle, oracle_match_lists  # noqa: F401
