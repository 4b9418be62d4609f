from phfpfac_tpu.frontend.patterns import (  # noqa: F401
    Pattern,
    decode_escaped_line,
    read_patterns,
    shard_patterns,
    sort_patterns,
)
