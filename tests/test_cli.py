"""End-to-end CLI (phfpfac_tpu.cli) — the gphf-compatible surface."""

import numpy as np

from phfpfac_tpu.cli import main
from phfpfac_tpu.frontend.patterns import Pattern
from phfpfac_tpu.oracle.ac import match_oracle
from phfpfac_tpu.parallel.merge import render_result_file
from phfpfac_tpu.utils.config import PfacConfig


def _run(args):
    assert main([str(a) for a in args]) == 0


def _expected(words, data, input_size, truncation="segment"):
    pats = [Pattern(i + 1, w) for i, w in enumerate(words)]
    cfg = PfacConfig(width=256, num_shards=1, truncation=truncation)
    want = [(p, i) for p, i in match_oracle(pats, data, cfg) if p < input_size]
    return render_result_file(np.asarray(want).reshape(-1, 2))


def test_experiment_corpus_output(reference_dir, tmp_path):
    out = tmp_path / "out.txt"
    _run([reference_dir / "experimentpattern", 1, 4096,
          reference_dir / "experimentinput", "-o", out, "--quiet"])
    words = (reference_dir / "experimentpattern").read_bytes().split()
    data = (reference_dir / "experimentinput").read_bytes()
    assert out.read_text() == _expected(words, data, len(data) - 1)


def test_shard_count_invariance(reference_dir, tmp_path):
    outs = []
    for streams, extra in ((1, []), (3, []), (1, ["--num-shards", 5])):
        out = tmp_path / f"out{streams}{len(extra)}.txt"
        _run([reference_dir / "experimentpattern", streams, 256,
              reference_dir / "experimentinput", "-o", out, "--quiet",
              *extra])
        outs.append(out.read_text())
    assert outs[0] == outs[1] == outs[2]


def test_save_load_tables_roundtrip(reference_dir, tmp_path):
    npz = tmp_path / "tables.npz"
    out1, out2 = tmp_path / "a.txt", tmp_path / "b.txt"
    _run([reference_dir / "experimentpattern", 1, 256,
          reference_dir / "experimentinput", "-o", out1, "--quiet",
          "--save-tables", npz])
    _run([reference_dir / "experimentpattern", 1, 256,
          reference_dir / "experimentinput", "-o", out2, "--quiet",
          "--load-tables", npz])
    assert npz.exists()
    assert out1.read_text() == out2.read_text()


def test_escapes_flag(tmp_path):
    pat = tmp_path / "pat.txt"
    pat.write_bytes(b"a\\x41b\nx\\tz\n")  # = "aAb", "x\tz"
    inp = tmp_path / "in.txt"
    inp.write_bytes(b"..aAb..x\tz..\n")
    out = tmp_path / "out.txt"
    _run([pat, 1, 256, inp, "-o", out, "--quiet", "--escapes"])
    assert out.read_text() == (
        "At position    2, match pattern 1\n"
        "At position    7, match pattern 2\n"
    )


def test_charset_flag(tmp_path):
    pat = tmp_path / "pat.txt"
    pat.write_bytes(b"a[bc]d\nabd\n")
    inp = tmp_path / "in.txt"
    inp.write_bytes(b"xabdxacdx\n")
    out = tmp_path / "out.txt"
    _run([pat, 1, 256, inp, "-o", out, "--quiet", "--charset"])
    assert out.read_text() == (
        "At position    1, match pattern 1\n"
        "At position    1, match pattern 2\n"
        "At position    5, match pattern 1\n"
    )


def test_engines_agree(reference_dir, tmp_path):
    outs = []
    for engine in ("turbo", "jnp", "pallas"):
        out = tmp_path / f"{engine}.txt"
        _run([reference_dir / "experimentpattern", 1, 256,
              reference_dir / "experimentinput", "-o", out, "--quiet",
              "--exact", "--engine", engine])
        outs.append(out.read_text())
    assert outs[0] == outs[1] == outs[2]


def test_charset_save_load_preserves_multi_output(tmp_path):
    pat = tmp_path / "pat.txt"
    pat.write_bytes(b"a[bc]d\nabd\n")
    inp = tmp_path / "in.txt"
    inp.write_bytes(b"xabdx\n")
    out1, out2, npz = tmp_path / "a.txt", tmp_path / "b.txt", tmp_path / "t.npz"
    _run([pat, 1, 256, inp, "-o", out1, "--quiet", "--charset",
          "--save-tables", npz])
    _run([pat, 1, 256, inp, "-o", out2, "--quiet", "--load-tables", npz])
    # both pattern ids must survive the round-trip (output_lists)
    assert out1.read_text() == out2.read_text()
    assert "pattern 1" in out2.read_text() and "pattern 2" in out2.read_text()
