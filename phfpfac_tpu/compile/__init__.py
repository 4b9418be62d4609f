from phfpfac_tpu.compile.phf import PhfTable, build_phf  # noqa: F401
from phfpfac_tpu.compile.tables import (  # noqa: F401
    CompiledDictionary,
    ShardTables,
    compile_dictionary,
    compile_patterns,
)
from phfpfac_tpu.compile.trie import TrieTables, build_pfac_trie  # noqa: F401
