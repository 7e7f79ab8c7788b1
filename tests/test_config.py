import pytest

from sibelia_tpu.core.config import PRESETS, read_stage_file


def test_presets_match_reference():
    # reference: src/util.cpp:52-87
    assert PRESETS["loose"] == [(30, 150), (100, 1000), (1000, 5000), (5000, 15000)]
    assert PRESETS["fine"] == [(30, 150), (100, 500), (500, 1500)]
    assert PRESETS["far"] == [(15, 120), (100, 500), (500, 1500)]


def test_stage_file_parsing(tmp_path):
    f = tmp_path / "stages.txt"
    f.write_text("2\n10 40\n20 80\n")
    assert read_stage_file(str(f)) == [(10, 40), (20, 80)]


def test_stage_file_zero_stages(tmp_path):
    # NEWS 3.0.6 crash-fix case: a stage file containing 0
    f = tmp_path / "stages.txt"
    f.write_text("0\n")
    assert read_stage_file(str(f)) == []


@pytest.mark.parametrize("content,msg", [
    ("x", "cannot read stage file"),
    ("-1", "nonnegative"),
    ("1\n1 40", "at least 2"),
    ("1\n10 -5", "nonnegative"),
    ("2\n10 40", "too few"),
])
def test_stage_file_errors(tmp_path, content, msg):
    f = tmp_path / "stages.txt"
    f.write_text(content)
    with pytest.raises(RuntimeError, match=msg):
        read_stage_file(str(f))


def test_zero_stage_pipeline_runs(tmp_path):
    # 0 simplification stages: blocks at lastK only
    import io
    import contextlib
    import numpy as np
    from sibelia_tpu.cli.sibelia import run
    rng = np.random.default_rng(0)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=1500))
    fasta = tmp_path / "g.fasta"
    fasta.write_text(f">a\n{seq}\n>b\n{seq[:700] + seq[720:]}\n")
    stage = tmp_path / "st.txt"
    stage.write_text("0\n")
    out = tmp_path / "out"
    with contextlib.redirect_stdout(io.StringIO()):
        rc = run(["-k", str(stage), "-m", "100", "--lastk", "12",
                  "-o", str(out), str(fasta)])
    assert rc == 0
    assert (out / "blocks_coords.txt").exists()
