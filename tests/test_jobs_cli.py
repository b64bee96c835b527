"""kg_construct job CLI: argument validation happens before any Spark
session is built (bad invocations fail fast on the submit host)."""

from __future__ import annotations

import pytest

from csvw_rdf_convertor_spark.jobs.kg_construct import main


def test_requires_input_or_synth(capsys):
    with pytest.raises(SystemExit) as e:
        main(["--output", "/tmp/x"])
    assert e.value.code == 2
    assert "--input" in capsys.readouterr().err


def test_input_and_synth_mutually_exclusive(capsys):
    with pytest.raises(SystemExit) as e:
        main(["--input", "t", "--synth", "5", "--output", "/tmp/x"])
    assert e.value.code == 2


def test_output_required(capsys):
    with pytest.raises(SystemExit) as e:
        main(["--synth", "5"])
    assert e.value.code == 2
    assert "--output" in capsys.readouterr().err


def test_bad_format_rejected(capsys):
    with pytest.raises(SystemExit) as e:
        main(["--input", "t", "--input-format", "orc", "--output", "/tmp/x"])
    assert e.value.code == 2
