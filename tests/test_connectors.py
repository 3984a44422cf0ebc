"""S9 — the 8 named connectors: schema gating, request construction,
response mapping, and Spark plumbing via enrich_match with injected
deterministic fake transports (no network in this container)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from nomenklatura_spark.sources.connectors import (
    ALL_CONNECTORS,
    AlephEnricher,
    BrightQueryEnricher,
    NominatimEnricher,
    OpenCorporatesEnricher,
    OpenFIGIEnricher,
    PermIDEnricher,
    WikidataEnricher,
    YenteEnricher,
)
from nomenklatura_spark.sources.enrich import enrich_match


def test_registry_has_all_eight():
    assert set(ALL_CONNECTORS) == {
        "aleph", "brightquery", "nominatim", "opencorporates",
        "openfigi", "permid", "wikidata", "yente",
    }


def test_default_transport_raises():
    e = YenteEnricher()
    q = pd.DataFrame([{"query_id": "q1", "query_name": "Acme", "schema": "Company"}])
    with pytest.raises(NotImplementedError):
        e.match_batch(q)


def test_yente_match_and_request_shape():
    seen = []

    def fetch(url, payload):
        seen.append((url, json.loads(payload)))
        return json.dumps({"responses": {"entity": {"results": [
            {"id": "NK-abc", "schema": "Person", "score": 0.93,
             "properties": {"name": ["Johanna Quandt"]}},
        ]}}})

    e = YenteEnricher(api="https://y.example.org", dataset="sanctions", fetch=fetch)
    q = pd.DataFrame([
        {"query_id": "q1", "query_name": "Johanna Quandt", "schema": "Person",
         "country": "de"},
        {"query_id": "q2", "query_name": "ignored", "schema": "Payment"},
    ])
    got = e.match_batch(q)
    # Payment is not matchable → gated before the wire
    assert len(seen) == 1
    assert seen[0][0] == "https://y.example.org/match/sanctions"
    assert seen[0][1]["queries"]["entity"]["properties"]["country"] == ["de"]
    assert list(got["candidate_id"]) == ["NK-abc"]
    assert json.loads(got["raw"][0])["score"] == 0.93


def test_aleph_maps_links_and_publisher():
    def fetch(url, payload):
        return json.dumps({"results": [{
            "id": "al1", "schema": "Company", "caption": "Acme",
            "properties": {"name": ["Acme GmbH"]},
            "links": {"self": "https://a/entities/al1"},
            "collection": {"label": "Leaks"},
        }]})

    got = AlephEnricher(fetch=fetch).match_batch(pd.DataFrame([
        {"query_id": "q1", "query_name": "Acme", "schema": "Company"}]))
    raw = json.loads(got["raw"][0])
    assert raw["alephUrl"] == "https://a/entities/al1"
    assert raw["publisher"] == "Leaks"
    assert got["candidate_name"][0] == "Acme GmbH"


def test_nominatim_best_result_only_and_tiny_address_skipped():
    def fetch(url, payload):
        return json.dumps([
            {"osm_type": "way", "osm_id": 42, "display_name": "1 Main St, Springfield",
             "address": {"country_code": "us", "city": "Springfield"}},
            {"osm_type": "way", "osm_id": 43, "display_name": "other"},
        ])

    e = NominatimEnricher(fetch=fetch)
    q = pd.DataFrame([
        {"query_id": "q1", "query_name": "1  Main   St, Springfield",
         "schema": "Address", "country": "us"},
        {"query_id": "q2", "query_name": "abc", "schema": "Address"},  # len < 5
        {"query_id": "q3", "query_name": "1 Main St", "schema": "Person"},  # gated
    ])
    got = e.match_batch(q)
    assert list(got["candidate_id"]) == ["osm-way-42"]  # best only
    assert json.loads(got["raw"][0])["city"] == "Springfield"


def test_opencorporates_skips_linked_and_jurisdictions():
    calls = []

    def fetch(url, payload):
        calls.append(json.loads(payload))
        return json.dumps({"results": {"companies": [
            {"company": {"jurisdiction_code": "de", "company_number": "HRB1",
                         "name": "Acme GmbH",
                         "opencorporates_url": "https://oc/de/HRB1"}}]}})

    e = OpenCorporatesEnricher(fetch=fetch)
    q = pd.DataFrame([
        {"query_id": "q1", "query_name": "Acme", "schema": "Company", "country": "de"},
        {"query_id": "q2", "query_name": "Old Co", "schema": "Company", "country": "su"},
        {"query_id": "q3", "query_name": "Linked", "schema": "Company",
         "opencorporates_url": "https://oc/x"},
    ])
    got = e.match_batch(q)
    assert len(calls) == 1 and calls[0]["jurisdiction_code"] == "de"
    assert list(got["candidate_id"]) == ["oc-de-HRB1"]


def test_openfigi_security_composite_filter_and_org_search():
    def fetch(url, payload):
        body = json.loads(payload)
        if isinstance(body, list):  # ISIN mapping
            return json.dumps([{"data": [
                {"figi": "BBG000B1", "compositeFIGI": "BBG000B1",
                 "ticker": "ACM", "securityType": "Common Stock"},
                {"figi": "BBG000B2", "compositeFIGI": "BBG000B1"},  # non-composite
            ]}])
        return json.dumps({"data": [{"name": "Acme Corp", "figi": "BBG0X"}]})

    e = OpenFIGIEnricher(fetch=fetch)
    got = e.match_batch(pd.DataFrame([
        {"query_id": "s1", "schema": "Security", "isin": "US000000", "query_name": ""},
        {"query_id": "o1", "schema": "Organization", "query_name": "Acme Corp"},
    ]))
    sec = got[got["query_id"] == "s1"]
    assert list(sec["candidate_id"]) == ["figi-BBG000B1"]  # composite row only
    org = got[got["query_id"] == "o1"]
    assert list(org["candidate_schema"]) == ["Company"]
    assert org["candidate_id"].iloc[0].startswith("figi-company-")


def test_permid_csv_body_and_match_level():
    bodies = []

    def fetch(url, payload):
        bodies.append(json.loads(payload)["csv"])
        return json.dumps({"outputContentResponse": [
            {"Match OpenPermID": "https://permid.org/1-4295869482",
             "Match OrgName": "Acme Corp", "Match Score": "92%",
             "Match Level": "Excellent"},
            {"Match Level": "No Match"},
        ]})

    e = PermIDEnricher(fetch=fetch)
    got = e.match_batch(pd.DataFrame([
        {"query_id": "q1", "query_name": "Acme Corp", "schema": "Company",
         "country": "us", "lei_code": "LEI123"}]))
    csv = bodies[0].splitlines()
    assert csv[0] == "LocalID,Standard Identifier,Name,Country"
    assert csv[1] == "q1,LEI:LEI123,Acme Corp,US"
    assert csv[2] == "q1,LEI:LEI123,Acme Corp,"  # country-free fallback row
    assert list(got["candidate_id"]) == ["permid-4295869482"]


def test_wikidata_qid_shortcircuit_and_search():
    calls = []

    def fetch(url, payload):
        body = json.loads(payload)
        calls.append(body["action"])
        if body["action"] == "wbgetentities":
            return json.dumps({"entities": {"Q463179": {
                "labels": {"en": {"value": "Johanna Quandt"}}}}})
        return json.dumps({"search": [
            {"id": "Q1", "label": "Herbert Quandt", "description": "industrialist"}]})

    e = WikidataEnricher(fetch=fetch)
    got = e.match_batch(pd.DataFrame([
        {"query_id": "q1", "query_name": "x", "schema": "Person",
         "wikidata_id": "Q463179"},
        {"query_id": "q2", "query_name": "Herbert Quandt", "schema": "Person"},
        {"query_id": "q3", "query_name": "Acme", "schema": "Company"},  # gated
    ]))
    assert calls == ["wbgetentities", "wbsearchentities"]
    assert set(got["candidate_id"]) == {"Q463179", "Q1"}


def test_brightquery_name_fallback():
    def fetch(url, payload):
        return json.dumps({"results": [
            {"bq_legal_entity_id": "L1", "bq_organization_id": "O1",
             "bq_organization_name": "Acme Holdings"},  # no legal-entity name
            {"bq_legal_entity_id": "L2", "bq_organization_id": "O1",
             "bq_legal_entity_name": "Acme LLC",
             "bq_organization_name": "Acme Holdings"},
            {"bq_legal_entity_id": "L3"},  # nameless → dropped
        ]})

    got = BrightQueryEnricher(fetch=fetch).match_batch(pd.DataFrame([
        {"query_id": "q1", "query_name": "Acme", "schema": "Organization"}]))
    assert list(got["candidate_name"]) == ["Acme Holdings", "Acme LLC"]


def test_connector_through_spark_with_cache(spark, tmp_path):
    """End-to-end: connector inside enrich_match's mapInPandas, second run
    served from the parquet cache without touching the transport."""
    from nomenklatura_spark.sources.enrich import EnrichmentCache

    calls = {"n": 0}

    class CountingYente(YenteEnricher):
        def match_batch(self, queries: pd.DataFrame) -> pd.DataFrame:
            calls["n"] += len(queries)
            return super().match_batch(queries)

    def fetch(url, payload):
        name = json.loads(payload)["queries"]["entity"]["properties"]["name"][0]
        return json.dumps({"responses": {"entity": {"results": [
            {"id": f"NK-{name.lower().replace(' ', '-')}", "schema": "Person",
             "properties": {"name": [name]}, "score": 0.9}]}}})

    queries = spark.createDataFrame(
        [("q1", "Johanna Quandt", "Person"), ("q2", "Herbert Quandt", "Person")],
        "query_id string, query_name string, schema string",
    )
    cache = EnrichmentCache(str(tmp_path / "cache"))
    first = enrich_match(queries, CountingYente(fetch=fetch), cache=cache).collect()
    assert {r["candidate_id"] for r in first} == {
        "NK-johanna-quandt", "NK-herbert-quandt"}

    exploded = CountingYente(fetch=lambda u, p: (_ for _ in ()).throw(
        AssertionError("no transport on cache hit")))
    second = enrich_match(queries, exploded, cache=cache).collect()
    assert {r["candidate_id"] for r in second} == {r["candidate_id"] for r in first}


WIKIDATA_FIXTURES = "/root/reference/tests/fixtures/wikidata"


@pytest.mark.skipif(
    not os.path.isdir(WIKIDATA_FIXTURES),
    reason="reference wikidata fixtures not available",
)
def test_wikidata_fixture_replay():
    """Protocol parity against the reference's own recorded Wikidata API
    responses (tests/fixtures/wikidata, exercised by its
    tests/enrich/test_wikidata.py): a direct-QID lookup for Q7747 must
    surface exactly the Vladimir Putin entity."""
    import json as _json

    fixture = os.path.join(
        WIKIDATA_FIXTURES,
        "api_php_action_wbgetentities_format_json_ids_q7747_props_info"
        "_7csitelinks_2furls_7caliases_7clabels_7cdescriptions_7cclaims"
        "_7cdatatype.json",
    )

    def fetch(url, payload):
        req = _json.loads(payload)
        assert req["action"] == "wbgetentities"
        assert req["ids"] == "Q7747"
        return open(fixture).read()

    e = WikidataEnricher(fetch=fetch)
    got = e.match_batch(
        pd.DataFrame(
            [
                {
                    "query_id": "q1",
                    "query_name": "Vladimir Putin",
                    "schema": "Person",
                    "wikidata_id": "Q7747",
                }
            ]
        )
    )
    assert len(got) == 1
    row = got.iloc[0]
    assert row["candidate_id"] == "Q7747"
    assert row["candidate_schema"] == "Person"
    assert row["candidate_name"] == "Vladimir Putin"


def test_load_reference_enricher_yaml(monkeypatch):
    """The reference's own enricher YAML configs (enrichers/*.yml) load
    unchanged: type dotted-path tail resolves to the re-expressed class,
    scalar keys pass through, ${VAR} expands from the environment."""
    import os

    import pytest

    from nomenklatura_spark.sources.connectors import (
        NominatimEnricher,
        WikidataEnricher,
        YenteEnricher,
        load_enricher_yaml,
        make_enricher,
    )

    base = "/root/reference/enrichers"
    if not os.path.isdir(base):
        pytest.skip("reference enricher configs unavailable")
    monkeypatch.setenv("GRAPH_API_KEY", "test-key-123")
    assert isinstance(load_enricher_yaml(f"{base}/nominatim.yml"), NominatimEnricher)
    assert isinstance(load_enricher_yaml(f"{base}/wikidata.yml"), WikidataEnricher)
    osl = load_enricher_yaml(f"{base}/offshoreleaks.yml")
    assert isinstance(osl, YenteEnricher)
    assert osl.url == "https://api.graph.opensanctions.org/match/icij_offshoreleaks"
    with pytest.raises(TypeError):
        make_enricher({"type": "acme.enrich:UnknownEnricher"})
