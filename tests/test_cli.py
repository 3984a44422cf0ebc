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


@pytest.mark.skipif(
    not os.path.exists(DONATIONS), reason="reference fixture not available"
)
def test_cli_sorted_aggregate(runner, tmp_path, spark):
    out = tmp_path / "agg"
    res = runner.invoke(
        cli, ["sorted-aggregate", "-i", DONATIONS, "-o", str(out)]
    )
    assert res.exit_code == 0, res.output
    lines = spark.read.text(str(out))
    # one JSON line per entity (the donations corpus has 474)
    assert lines.count() == 474


def test_cli_train(runner, tmp_path, spark):
    import random

    random.seed(3)
    rows = []
    for i in range(300):
        label = i % 2
        f1 = random.random() * 0.4 + (0.6 if label else 0.0)
        f2 = random.random() * 0.5 + (0.4 if label else 0.0)
        rows.append((float(label), f1, f2))
    pairs = tmp_path / "pairs"
    spark.createDataFrame(
        rows, "label double, f_a double, f_b double"
    ).write.parquet(str(pairs))
    out = tmp_path / "model.json"
    res = runner.invoke(
        cli, ["train-v1-matcher", str(pairs), "-o", str(out)]
    )
    assert res.exit_code == 0, res.output
    model = json.loads(out.read_text())
    assert set(model["coefs"]) == {"f_a", "f_b"}
    assert model["coefs"]["f_a"] > 0  # separable → positive weight


@pytest.mark.skipif(
    not os.path.exists(DONATIONS), reason="reference fixture not available"
)
def test_cli_make_sortable(runner, tmp_path):
    out = tmp_path / "sortable"
    res = runner.invoke(cli, ["make-sortable", DONATIONS, "-o", str(out)])
    assert res.exit_code == 0, res.output
    lines = []
    for f in out.iterdir():
        if f.name.startswith("part-"):
            lines += [l for l in f.read_text().splitlines() if l]
    ids = [json.loads(l)["id"] for l in lines]
    assert len(ids) == 474
    assert ids == sorted(ids)


def test_cli_prune(runner, tmp_path, spark):
    dump = tmp_path / "resolver.json"
    rows = [
        ["NK-a", "e1", "positive", 1.0, "u", "2024-01-01T00:00:00"],
        ["NK-a", "e2", "no_judgement", 0.8, "u", "2024-01-01T00:00:00"],
    ]
    dump.write_text("".join(json.dumps(r) + "\n" for r in rows))
    out = tmp_path / "pruned.json"
    res = runner.invoke(cli, ["prune", str(dump), "-o", str(out)])
    assert res.exit_code == 0, res.output
    from nomenklatura_spark.sources.statement_io import read_resolver_dump

    # the dump keeps live edges only — the pruned suggestion is gone
    live = read_resolver_dump(spark, str(out)).collect()
    assert [r["judgement"] for r in live] == ["positive"]


def test_cli_split(runner, tmp_path, spark):
    src = tmp_path / "docs"
    spark.createDataFrame(
        [(i, "en" if i < 40 else "de", f"text {i}") for i in range(60)],
        "doc_id long, lang string, text string",
    ).write.parquet(str(src))
    out = tmp_path / "splits"
    res = runner.invoke(cli, ["split", str(src), "-o", str(out)])
    assert res.exit_code == 0, res.output
    counts = json.loads(res.output.strip().splitlines()[-1])["splits"]
    assert sum(counts.values()) == 60 and counts["train"] == 36 + 18
    back = spark.read.parquet(str(out))
    # split-partitioned layout prunes: one split reads one directory
    assert back.where("split = 'val'").count() == counts.get("val", 0)


def test_cli_drift(runner, tmp_path, spark):
    old = tmp_path / "old"
    new = tmp_path / "new"
    spark.createDataFrame(
        [(1, "apple banana apple"), (2, "cherry banana")],
        "doc_id long, text string",
    ).write.parquet(str(old))
    spark.createDataFrame(
        [(3, "durian durian apple"), (4, "cherry durian")],
        "doc_id long, text string",
    ).write.parquet(str(new))
    out = tmp_path / "drift"
    res = runner.invoke(
        cli, ["drift", str(old), str(new), "-o", str(out), "--top", "3"]
    )
    assert res.exit_code == 0, res.output
    rep = json.loads(res.output.strip().splitlines()[-1])
    assert rep["kl_new_vs_old"] > 0  # vocabulary genuinely shifted
    words = {m["word"] for m in rep["top_movers"]}
    assert "durian" in words and len(rep["top_movers"]) == 3
    assert spark.read.parquet(str(out)).count() >= 4


def test_cli_decontaminate_bloom(runner, tmp_path, spark):
    docs = tmp_path / "docs"
    bench = tmp_path / "bench"
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different words about gardens and tulips here"),
        ],
        "doc_id long, text string",
    ).write.parquet(str(docs))
    spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    ).write.parquet(str(bench))
    out = tmp_path / "verdicts"
    res = runner.invoke(
        cli, ["decontaminate", str(docs), str(bench), "-o", str(out)]
    )
    assert res.exit_code == 0, res.output
    rep = json.loads(res.output.strip().splitlines()[-1])
    assert rep == {"method": "bloom", "flagged_docs": 1}
    v = {r["doc_id"]: r["contaminated"]
         for r in spark.read.parquet(str(out)).collect()}
    assert v[1] and not v[2]


def test_cli_sketch_distinct_incremental(runner, tmp_path, spark):
    d1 = tmp_path / "d1"
    d2 = tmp_path / "d2"
    spark.createDataFrame(
        [("a", f"u{i}") for i in range(300)], "k string, v string"
    ).write.parquet(str(d1))
    spark.createDataFrame(
        [("a", f"w{i}") for i in range(200)], "k string, v string"
    ).write.parquet(str(d2))
    regs = tmp_path / "regs"
    r1 = runner.invoke(
        cli, ["sketch-distinct", str(d1), "--key", "k", "--value", "v",
              "-o", str(regs)]
    )
    assert r1.exit_code == 0, r1.output
    est1 = json.loads(r1.output.strip().splitlines()[-1])["distinct"]["a"]
    assert abs(est1 - 300) / 300 < 0.25
    # incremental: merge batch 2 into the stored registers
    regs2 = tmp_path / "regs2"
    r2 = runner.invoke(
        cli, ["sketch-distinct", str(d2), "--key", "k", "--value", "v",
              "--merge-with", str(regs), "-o", str(regs2)]
    )
    assert r2.exit_code == 0, r2.output
    est2 = json.loads(r2.output.strip().splitlines()[-1])["distinct"]["a"]
    assert abs(est2 - 500) / 500 < 0.25


def test_cli_triangles(runner, tmp_path, spark):
    edges = tmp_path / "edges"
    spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    ).write.parquet(str(edges))
    out = tmp_path / "tri"
    res = runner.invoke(cli, ["triangles", str(edges), "-o", str(out)])
    assert res.exit_code == 0, res.output
    summary = json.loads(res.output.strip().splitlines()[-1])
    assert summary["nodes"] == 4 and summary["triangles"] == 1


def test_cli_trim_passages(runner, tmp_path, spark):
    docs = tmp_path / "docs"
    passage = "one two three four five six seven eight"
    spark.createDataFrame(
        [(1, f"intro {passage} outro"), (2, f"other {passage} coda")],
        "doc_id long, text string",
    ).write.parquet(str(docs))
    out = tmp_path / "trimmed"
    res = runner.invoke(cli, ["trim-passages", str(docs), "-o", str(out)])
    assert res.exit_code == 0, res.output
    stats = json.loads(res.output.strip().splitlines()[-1])
    assert stats["docs"] == 2 and stats["words_removed"] == 16
    rows = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert rows[1]["trimmed_text"] == "intro outro"


def test_cli_search_bm25_and_hybrid(runner, tmp_path, spark):
    docs = tmp_path / "docs"
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown foxes are quick and brown"),
            (3, "entirely unrelated legal filing about tax codes"),
            (4, "dog dog dog kennel"),
        ],
        "doc_id long, text string",
    ).write.parquet(str(docs))
    res = runner.invoke(cli, ["search", str(docs), "quick brown fox", "--k", "2"])
    assert res.exit_code == 0, res.output
    hits = [json.loads(l) for l in res.output.strip().splitlines()]
    assert len(hits) == 2
    assert hits[0]["doc_id"] in (1, 2) and hits[0]["rank"] == 1
    hy = runner.invoke(
        cli, ["search", str(docs), "quick brown fox", "--k", "3", "--hybrid"]
    )
    assert hy.exit_code == 0, hy.output
    hhits = [json.loads(l) for l in hy.output.strip().splitlines()]
    assert len(hhits) == 3
    assert {"lex_rank", "sem_rank", "rrf"} <= set(hhits[0])
    assert hhits[0]["doc_id"] in (1, 2)


def test_cli_search_hybrid_string_doc_ids(runner, tmp_path, spark):
    """A corpus with STRING doc ids must work in hybrid mode too (the
    probe sentinel is cast to the corpus id type)."""
    docs = tmp_path / "sdocs"
    spark.createDataFrame(
        [("doc-a", "quick brown fox"), ("doc-b", "lazy dog sleeps"),
         ("doc-c", "quick quick fox")],
        "doc_id string, text string",
    ).write.parquet(str(docs))
    res = runner.invoke(
        cli, ["search", str(docs), "quick fox", "--k", "2", "--hybrid"]
    )
    assert res.exit_code == 0, res.output
    hits = [json.loads(l) for l in res.output.strip().splitlines()]
    assert len(hits) == 2 and hits[0]["doc_id"] in ("doc-a", "doc-c")
