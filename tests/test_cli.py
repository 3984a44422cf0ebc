"""CLI surface (reference nomenklatura/cli.py verbs as batch jobs)."""

from __future__ import annotations

import json
import os

import pytest
from click.testing import CliRunner

from nomenklatura_spark.cli import cli

DONATIONS = "/root/reference/tests/fixtures/donations.ijson"


@pytest.fixture()
def runner():
    return CliRunner()


@pytest.mark.skipif(
    not os.path.exists(DONATIONS), reason="reference fixture not available"
)
def test_cli_xref(runner, tmp_path, spark):
    out = tmp_path / "candidates"
    res = runner.invoke(
        cli, ["xref", DONATIONS, "-o", str(out), "-l", "100"]
    )
    assert res.exit_code == 0, res.output
    rows = spark.read.parquet(str(out))
    assert rows.count() > 0
    assert {"lid", "rid", "score"} <= set(rows.columns)


@pytest.mark.skipif(
    not os.path.exists(DONATIONS), reason="reference fixture not available"
)
def test_cli_resolver_roundtrip_and_apply(runner, tmp_path, spark):
    # build a tiny resolver dump: merge two ids
    dump = tmp_path / "resolver.json"
    dump.write_text(
        json.dumps(
            [
                "NK-test",
                "f9c295f21b233ac878fbac4d271bb6fd13d7952a",
                "positive",
                1.0,
                "test",
                "2024-01-01T00:00:00",
            ]
        )
        + "\n"
    )
    edges_pq = tmp_path / "edges"
    res = runner.invoke(
        cli, ["load-resolver", str(dump), "-o", str(edges_pq)]
    )
    assert res.exit_code == 0, res.output
    assert spark.read.parquet(str(edges_pq)).count() == 1

    dump2 = tmp_path / "resolver2.json"
    res = runner.invoke(
        cli, ["dump-resolver", str(edges_pq), "-o", str(dump2)]
    )
    assert res.exit_code == 0, res.output

    out = tmp_path / "canon"
    res = runner.invoke(
        cli, ["apply", DONATIONS, "-o", str(out), "-r", str(dump)]
    )
    assert res.exit_code == 0, res.output
    lines = spark.read.text(str(out))
    assert lines.count() > 0


def test_cli_bench(runner):
    res = runner.invoke(cli, ["bench", "-n", "200"])
    assert res.exit_code == 0, res.output
    assert "logic_v2" in res.output and "ofac" in res.output
