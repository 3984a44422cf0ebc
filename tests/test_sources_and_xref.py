"""S1/S7 source tests + the golden end-to-end xref parity test.

The donations fixture is the reference's own golden corpus
(``tests/fixtures/donations.ijson``, 474 German campaign-finance
entities); its integration tests assert that xref surfaces known
duplicates — e.g. the best candidate for "Johanna Quandt" is
"Frau Johanna Quandt" (reference tests/test_xref.py:11-35). The fixture
is read from the reference checkout as *data* (not code).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

DONATIONS = "/root/reference/tests/fixtures/donations.ijson"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DONATIONS), reason="reference fixture not available"
)

MATCHABLE = ["Person", "Organization", "Company", "LegalEntity", "Address"]
# matchable pair table: LegalEntity-likes can match each other; Address only itself
PAIRS = [
    (a, b)
    for a in ["Person", "Organization", "Company", "LegalEntity"]
    for b in ["Person", "Organization", "Company", "LegalEntity"]
    if (a == b)
    or ("LegalEntity" in (a, b))
    or {a, b} == {"Organization", "Company"}
] + [("Address", "Address")]


@pytest.fixture(scope="module")
def donations(spark):
    from nomenklatura_spark.sources.entity_json import read_entity_file

    return read_entity_file(spark, DONATIONS, dataset="donations").persist()


def test_read_entity_file(spark, donations):
    assert donations.select("entity_id").distinct().count() == 474
    schemas = {r["schema"] for r in donations.select("schema").distinct().collect()}
    assert {"Person", "Organization", "Company", "Address", "Payment"} <= schemas
    # entity-typed props resolved from the registry
    ent = donations.where(F.col("prop") == "addressEntity").limit(1).collect()
    assert ent and ent[0]["prop_type"] == "entity"


def test_entities_json_roundtrip(spark, donations, tmp_path):
    from nomenklatura_spark.sources.entity_json import (
        entities_to_json,
        read_entity_file,
    )

    out = str(tmp_path / "roundtrip")
    entities_to_json(donations).coalesce(1).write.mode("overwrite").text(out)
    back = read_entity_file(spark, out, dataset="donations")
    assert back.select("entity_id").distinct().count() == 474
    # statement-level equality on the triple core
    a = {tuple(r) for r in donations.select("entity_id", "prop", "value").collect()}
    b = {tuple(r) for r in back.select("entity_id", "prop", "value").collect()}
    assert a == b


def test_adjacency_payments(spark, donations):
    """The SURVEY §7 minimum slice: 'all Payments whose beneficiary is X'."""
    from nomenklatura_spark.operators.assembly import adjacency

    adj = adjacency(donations)
    payments_to_mlpd = (
        adj.where(
            (F.col("edge_prop") == "beneficiary")
            & (F.col("dst_prop") == "name")
            & (F.col("dst_value") == "MLPD")
        )
        .select("src_id")
        .distinct()
    )
    assert payments_to_mlpd.count() >= 2


def test_xref_golden_johanna_quandt(spark, donations):
    """Golden parity case (reference tests/test_xref.py:29-35): xref's best
    candidate for 'Johanna Quandt' must be 'Frau Johanna Quandt'."""
    from nomenklatura_spark.plans.xref import XrefOptions, xref_pairs

    schemata = spark.createDataFrame(PAIRS, "left string, right string")
    scored = xref_pairs(
        spark,
        donations.where(F.col("schema").isin(MATCHABLE)),
        schemata,
        options=XrefOptions(max_pairs=10_000),
    ).persist()

    names = donations.where(F.col("prop") == "name").select(
        F.col("canonical_id").alias("eid"), F.col("value").alias("name")
    )
    top = (
        scored.join(names.withColumnRenamed("eid", "lid").withColumnRenamed("name", "l_name"), "lid")
        .join(names.withColumnRenamed("eid", "rid").withColumnRenamed("name", "r_name"), "rid")
        .where(
            (F.col("l_name").isin("Johanna Quandt", "Frau Johanna Quandt"))
            | (F.col("r_name").isin("Johanna Quandt", "Frau Johanna Quandt"))
        )
        .orderBy(F.desc("score"))
        .select("l_name", "r_name", "score", "block_score")
        .collect()
    )
    assert top, "no candidate pairs for Johanna Quandt at all"
    best = top[0]
    pair = {best["l_name"], best["r_name"]}
    assert pair == {"Johanna Quandt", "Frau Johanna Quandt"}, f"got {top[:5]}"
    assert best["score"] > 0.5


def test_resolver_dump_roundtrip(spark, tmp_path):
    from nomenklatura_spark.sources.statement_io import (
        read_resolver_dump,
        write_resolver_dump,
    )

    edges = spark.createDataFrame(
        [
            ("NK-abc", "e1", "positive", None, "test", "2024-01-01T00:00:00"),
            ("e3", "e2", "negative", None, "test", "2024-01-02T00:00:00"),
            ("e5", "e4", "no_judgement", 0.8, "xref", "2024-01-03T00:00:00"),
        ],
        "target string, source string, judgement string, score double, user string, created_at string",
    )
    path = str(tmp_path / "resolver-dump")
    write_resolver_dump(edges, path)
    back = read_resolver_dump(spark, path)
    assert back.count() == 3
    row = back.where(F.col("judgement") == "no_judgement").collect()[0]
    assert row["score"] == 0.8 and row["target"] == "e5"
