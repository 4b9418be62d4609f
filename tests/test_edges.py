"""Degenerate-input behavior (the reference mostly crashes on these)."""

import pytest

from phfpfac_tpu.compile.tables import compile_patterns
from phfpfac_tpu.frontend.patterns import Pattern, read_patterns
from phfpfac_tpu.parallel.matcher import Matcher
from phfpfac_tpu.utils.config import PfacConfig


def _cfg(**kw):
    return PfacConfig(
        width=256, num_shards=2, truncation="none", interpret=True, **kw
    )


def test_empty_dictionary_scans_cleanly():
    compiled = compile_patterns([], _cfg())
    assert Matcher(compiled, _cfg()).match(b"hello world").size == 0


def test_empty_input():
    compiled = compile_patterns([Pattern(1, b"a")], _cfg())
    assert Matcher(compiled, _cfg()).match(b"").size == 0


def test_duplicate_patterns_single_match_line():
    # the reference maps duplicate patterns onto one final state and
    # reports one id per position (patternIdMap last-writer,
    # create_table_reorder.c:318)
    pats = [Pattern(1, b"abc"), Pattern(2, b"abc"), Pattern(3, b"ab")]
    compiled = compile_patterns(pats, _cfg())
    got = [tuple(x) for x in Matcher(compiled, _cfg()).match(b"xabcx").tolist()]
    assert got == [(1, 3), (1, 2)]


def test_empty_pattern_line_rejected(tmp_path):
    f = tmp_path / "p.txt"
    f.write_bytes(b"abc\n\nxy\n")
    with pytest.raises(ValueError, match="empty"):
        read_patterns(str(f))


def test_oversized_pattern_rejected(tmp_path):
    # the reference exits on patterns over 1024 B
    # (create_table_reorder.c:74-77)
    f = tmp_path / "p.txt"
    f.write_bytes(b"x" * 2000 + b"\nab\n")
    with pytest.raises(ValueError, match="1024"):
        read_patterns(str(f))
