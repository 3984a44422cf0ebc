"""FtM ontology-as-data (model/ftm.py): matchability parity with the
public followthemoney model, and the blocker stack running on its
bundled dimension tables without caller-supplied schema pairs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nomenklatura_spark.model.ftm import (
    ancestors,
    can_match,
    can_match_pairs,
    matchable_schemata,
)

DONATIONS = "/root/reference/tests/fixtures/donations.ijson"


def test_can_match_parity():
    # same-schema
    assert can_match("Person", "Person")
    assert can_match("Company", "Company")
    # ancestor/descendant chains match
    assert can_match("Person", "LegalEntity")
    assert can_match("LegalEntity", "Person")
    assert can_match("Company", "Organization")
    assert can_match("Organization", "Company")
    assert can_match("Company", "LegalEntity")
    assert can_match("Vessel", "Vehicle")
    # siblings do NOT match (the FtM rule: other must be among self's
    # matchable ancestors-or-descendants)
    assert not can_match("Person", "Company")
    assert not can_match("Person", "Organization")
    assert not can_match("Company", "PublicBody")
    assert not can_match("Vessel", "Airplane")
    # unmatchable schemata never match
    assert not can_match("Thing", "Thing")
    assert not can_match("Sanction", "Sanction")
    assert not can_match("Person", "Address")
    # Address matches only itself
    assert can_match("Address", "Address")


def test_can_match_symmetry():
    pairs = set(can_match_pairs())
    for left, right in pairs:
        assert (right, left) in pairs, (left, right)


def test_ancestry():
    anc = ancestors()
    assert {"Company", "Organization", "LegalEntity", "Thing", "Asset"} <= anc[
        "Company"
    ]
    assert "Person" not in anc["Company"]
    assert anc["Vessel"] == frozenset({"Vessel", "Vehicle", "Asset", "Thing"})


def test_matchable_sets():
    ms = matchable_schemata()
    assert ms["Person"] == frozenset({"Person", "LegalEntity"})
    assert ms["LegalEntity"] == frozenset(
        {"LegalEntity", "Person", "Organization", "Company", "PublicBody"}
    )
    assert ms["Thing"] == frozenset()


@pytest.mark.skipif(
    not os.path.exists(DONATIONS), reason="reference fixture not available"
)
def test_blocker_defaults_to_bundled_ontology(spark):
    """xref_pairs with schemata=None uses the bundled FtM dimension and
    still surfaces the golden duplicate pair on the reference corpus."""
    from nomenklatura_spark.plans.xref import XrefOptions, xref_pairs
    from nomenklatura_spark.sources.entity_json import read_entity_file

    donations = read_entity_file(spark, DONATIONS, dataset="donations")
    scored = xref_pairs(
        spark, donations, options=XrefOptions(max_pairs=10_000)
    )
    names = donations.where(F.col("prop") == "name").select(
        F.col("canonical_id").alias("eid"), F.col("value").alias("name")
    )
    top = (
        scored.join(
            names.withColumnRenamed("eid", "lid").withColumnRenamed(
                "name", "l_name"
            ),
            "lid",
        )
        .join(
            names.withColumnRenamed("eid", "rid").withColumnRenamed(
                "name", "r_name"
            ),
            "rid",
        )
        .where(
            F.col("l_name").isin("Johanna Quandt", "Frau Johanna Quandt")
            | F.col("r_name").isin("Johanna Quandt", "Frau Johanna Quandt")
        )
        .orderBy(F.desc("score"))
        .select("l_name", "r_name", "score")
        .collect()
    )
    assert top, "no candidates for Johanna Quandt with the bundled ontology"
    assert {top[0]["l_name"], top[0]["r_name"]} == {
        "Johanna Quandt",
        "Frau Johanna Quandt",
    }
