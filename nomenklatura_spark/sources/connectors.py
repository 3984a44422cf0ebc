"""S9 — the named enrichment connectors.

Each class re-expresses one reference connector's *protocol semantics* —
which schemata it matches, how a query entity becomes a request, and how
a response becomes candidate rows — on top of the batch ``Enricher``
interface in ``sources/enrich.py``.  Reference files (semantics only):

- aleph          ``nomenklatura/enrich/aleph.py:119-136``  (POST /api/2/match)
- brightquery    ``nomenklatura/enrich/brightquery.py:17-118``
- nominatim      ``nomenklatura/enrich/nominatim.py:28-69``
- opencorporates ``nomenklatura/enrich/opencorporates.py:88-180``
- openfigi       ``nomenklatura/enrich/openfigi.py:49-105``
- permid         ``nomenklatura/enrich/permid.py:50-204``
- wikidata       ``nomenklatura/enrich/wikidata.py:54-90``
- yente          ``nomenklatura/enrich/yente.py:55-120``

Transport is a pluggable ``fetch(url, payload_json) -> response_json``
callable.  This container has no network, so the default transport raises
``NotImplementedError`` at call time — tests inject deterministic fakes.
The Spark-side plumbing (schema gating as Column predicates, batch
request construction, response parsing, cache fingerprints) is real and
tested; a production deployment only swaps the fetch function for an
HTTP client.

Scale note: enrichment at 100 TB is cache-dominated — the anti-join in
``enrich_match`` sends only fingerprint *misses* to the transport, and
each connector batches many entities per request where its API allows it
(PermID's 999-row CSV body, OpenFIGI's mapping array).  Connectors are
executed inside ``mapInPandas`` partitions, so wire concurrency ==
partition count, throttled by repartitioning the miss set.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from collections.abc import Callable
from typing import Any

import pandas as pd

from pyspark.sql import Column, functions as F

from nomenklatura_spark.sources.enrich import Enricher

Fetch = Callable[[str, str], str]

CANDIDATE_COLS = [
    "query_id", "candidate_id", "candidate_schema", "candidate_name", "raw",
]

def schema_is_a(schema: str | None, ancestor: str) -> bool:
    """is_a gating over the bundled FtM ontology (model/ftm.py); unknown
    schemata are only ancestors of themselves."""
    from nomenklatura_spark.model.ftm import ancestors

    if schema is None:
        return False
    ups = ancestors().get(schema)
    if ups is None:
        return ancestor == schema
    return ancestor in ups


def _sval(row: pd.Series, key: str) -> str:
    """String field of a pandas row, '' for missing/NaN (pandas encodes
    absent strings as float NaN, which is truthy)."""
    v = row.get(key)
    return v if isinstance(v, str) else ""


def _no_network(url: str, payload: str) -> str:
    raise NotImplementedError(
        f"no network transport in this environment (url={url}); "
        "inject fetch=<callable> to use this connector"
    )


class ConnectorEnricher(Enricher):
    """Shared shape: gate rows by schema, build one request per row (or
    per batch), fetch, parse candidates.  Subclasses override
    ``accepts_schema`` / ``requests_for`` / ``parse``."""

    name = "connector"
    url = ""

    def __init__(self, fetch: Fetch | None = None, **config: Any) -> None:
        self.fetch = fetch or _no_network
        self.config = config

    # -- gating ---------------------------------------------------------
    def accepts_schema(self, schema: str | None) -> bool:
        return True

    def schema_predicate(self) -> Column:
        """Same gate as a Column predicate, for filtering *before* the
        mapInPandas fan-out (so gated rows never reach an executor
        round-trip)."""
        from nomenklatura_spark.model.ftm import SCHEMATA

        accepted = [s for s in SCHEMATA if self.accepts_schema(s)]
        return F.col("schema").isin(accepted)

    # -- request/response ----------------------------------------------
    def request_for(self, row: pd.Series) -> str | None:
        """JSON request payload for one query row, or None to skip."""
        raise NotImplementedError

    def parse(self, row: pd.Series, response: str) -> list[tuple[str, str, str, str]]:
        """(candidate_id, candidate_schema, candidate_name, raw) rows."""
        raise NotImplementedError

    def match_batch(self, queries: pd.DataFrame) -> pd.DataFrame:
        out: list[tuple[str, str, str, str, str]] = []
        for _, row in queries.iterrows():
            if not self.accepts_schema(row.get("schema")):
                continue
            payload = self.request_for(row)
            if payload is None:
                continue
            response = self.fetch(self.url, payload)
            for cid, cschema, cname, raw in self.parse(row, response):
                out.append((row["query_id"], cid, cschema, cname, raw))
        return pd.DataFrame(out, columns=CANDIDATE_COLS)


class YenteEnricher(ConnectorEnricher):
    """OpenSanctions API server.  Any matchable schema; POST the entity's
    matchable properties to ``/match/{dataset}``; candidates come back as
    scored FtM entities (yente.py:55-91)."""

    name = "yente"

    def __init__(self, api: str = "https://api.example.org/", dataset: str = "default",
                 fuzzy: bool = False, cutoff: float | None = None, **kw: Any) -> None:
        super().__init__(**kw)
        self.url = f"{api.rstrip('/')}/match/{dataset}"
        self.fuzzy = fuzzy
        self.cutoff = cutoff

    def accepts_schema(self, schema: str | None) -> bool:
        # matchable schemata only (Thing/interval schemata are not)
        return schema in {"Person", "Company", "Organization", "LegalEntity",
                          "PublicBody", "Address", "Security", "Vessel"}

    def request_for(self, row: pd.Series) -> str:
        props: dict[str, list[str]] = {"name": [str(row.get("query_name", ""))]}
        for extra in ("country", "birthDate", "registrationNumber"):
            v = _sval(row, extra)
            if v:
                props[extra] = [v]
        body = {
            "queries": {"entity": {"schema": row.get("schema"), "properties": props}},
            "fuzzy": self.fuzzy,
        }
        if self.cutoff is not None:
            body["cutoff"] = self.cutoff
        return json.dumps(body, sort_keys=True)

    def parse(self, row: pd.Series, response: str) -> list[tuple[str, str, str, str]]:
        data = json.loads(response)
        results = data.get("responses", {}).get("entity", {}).get("results", [])
        out = []
        for r in results:
            names = r.get("properties", {}).get("name", []) or [r.get("caption", "")]
            out.append((r["id"], r.get("schema", "LegalEntity"), names[0],
                        json.dumps({"score": r.get("score")})))
        return out


class AlephEnricher(ConnectorEnricher):
    """OCCRP Aleph: POST schema+properties to ``/api/2/match``; candidate
    rows keep the server's ``links.self`` as alephUrl and collection label
    as publisher (aleph.py:58-136)."""

    name = "aleph"

    def __init__(self, host: str = "https://aleph.example.org/",
                 collection_id: str | None = None, **kw: Any) -> None:
        super().__init__(**kw)
        self.url = f"{host.rstrip('/')}/api/2/match"
        self.collection_id = collection_id

    def accepts_schema(self, schema: str | None) -> bool:
        return schema in {"Person", "Company", "Organization", "LegalEntity",
                          "PublicBody", "Address", "Security", "Vessel"}

    def request_for(self, row: pd.Series) -> str:
        body: dict[str, Any] = {
            "schema": row.get("schema"),
            "properties": {"name": [str(row.get("query_name", ""))]},
        }
        if self.collection_id is not None:
            body["collection_ids"] = [self.collection_id]
        return json.dumps(body, sort_keys=True)

    def parse(self, row: pd.Series, response: str) -> list[tuple[str, str, str, str]]:
        out = []
        for r in json.loads(response).get("results", []):
            props = r.get("properties", {})
            name = (props.get("name") or [r.get("caption", "")])[0]
            raw = json.dumps({
                "alephUrl": r.get("links", {}).get("self"),
                "publisher": r.get("collection", {}).get("label"),
            })
            out.append((r["id"], r.get("schema", "LegalEntity"), name, raw))
        return out


class NominatimEnricher(ConnectorEnricher):
    """OpenStreetMap geocoder: Address entities only; query the squashed
    ``full`` address (len >= 5) with countrycodes; keep only the best
    result; candidate id is ``osm-{type}-{id}`` (nominatim.py:28-69)."""

    name = "nominatim"
    url = "https://nominatim.example.org/search.php"

    def accepts_schema(self, schema: str | None) -> bool:
        return schema == "Address"

    def request_for(self, row: pd.Series) -> str | None:
        full = " ".join(str(row.get("query_name", "")).split())
        if len(full) < 5:
            return None
        return json.dumps({
            "q": full,
            "countrycodes": _sval(row, "country"),
            "format": "jsonv2",
            "addressdetails": 1,
        }, sort_keys=True)

    def parse(self, row: pd.Series, response: str) -> list[tuple[str, str, str, str]]:
        for r in json.loads(response):
            osm_type, osm_id = r.get("osm_type"), r.get("osm_id")
            if osm_type is None or osm_id is None:
                continue
            addr = r.get("address", {})
            raw = json.dumps({
                "country": addr.get("country_code"), "city": addr.get("city"),
                "state": addr.get("state"), "postalCode": addr.get("postcode"),
            })
            # best result only, like the reference
            return [(f"osm-{osm_type}-{osm_id}", "Address",
                     r.get("display_name", ""), raw)]
        return []


class OpenCorporatesEnricher(ConnectorEnricher):
    """Global company-registry aggregator: company search by name (+
    jurisdiction); entities already carrying an ``opencorporatesUrl`` are
    skipped; configured jurisdictions (plus xk/su) are never queried
    (opencorporates.py:53-57,88-127)."""

    name = "opencorporates"
    url = "https://api.example.org/v0.4/companies/search"

    def __init__(self, skip_jurisdictions: set[str] | None = None, **kw: Any) -> None:
        super().__init__(**kw)
        self.skip_jurisdictions = {"xk", "su"} | (skip_jurisdictions or set())

    def accepts_schema(self, schema: str | None) -> bool:
        return schema in {"Company", "Organization", "LegalEntity"}

    def request_for(self, row: pd.Series) -> str | None:
        oc_url = row.get("opencorporates_url")
        if isinstance(oc_url, str) and oc_url:
            return None  # already linked
        juris = _sval(row, "country").lower()
        if juris in self.skip_jurisdictions:
            return None
        body = {"q": str(row.get("query_name", ""))}
        if juris:
            body["jurisdiction_code"] = juris
        return json.dumps(body, sort_keys=True)

    def parse(self, row: pd.Series, response: str) -> list[tuple[str, str, str, str]]:
        out = []
        companies = json.loads(response).get("results", {}).get("companies", [])
        for wrap in companies:
            c = wrap.get("company", wrap)
            cid = f"oc-{c.get('jurisdiction_code')}-{c.get('company_number')}"
            raw = json.dumps({
                "opencorporatesUrl": c.get("opencorporates_url"),
                "incorporationDate": c.get("incorporation_date"),
                "status": c.get("current_status"),
            })
            out.append((cid, "Company", c.get("name", ""), raw))
        return out


class OpenFIGIEnricher(ConnectorEnricher):
    """Bloomberg OpenFIGI: Organizations search by name → issuing
    companies; Securities map by ISIN → keep only rows whose figi equals
    the compositeFIGI (openfigi.py:49-96)."""

    name = "openfigi"
    url = "https://api.example.org/v3/search"
    mapping_url = "https://api.example.org/v3/mapping"

    def accepts_schema(self, schema: str | None) -> bool:
        return schema_is_a(schema, "Organization") or schema == "Security"

    def request_for(self, row: pd.Series) -> str | None:
        if row.get("schema") == "Security":
            isin = _sval(row, "isin")
            if not isin:
                return None
            return json.dumps([{"idType": "ID_ISIN", "idValue": isin}])
        return json.dumps({"query": str(row.get("query_name", ""))}, sort_keys=True)

    def parse(self, row: pd.Series, response: str) -> list[tuple[str, str, str, str]]:
        data = json.loads(response)
        out = []
        if row.get("schema") == "Security":
            for section in data if isinstance(data, list) else [data]:
                for item in section.get("data", []):
                    figi = item.get("figi")
                    if figi != item.get("compositeFIGI", figi):
                        continue  # composite listings only
                    raw = json.dumps({"figiCode": figi,
                                      "ticker": item.get("ticker"),
                                      "type": item.get("securityType")})
                    out.append((f"figi-{figi}", "Security",
                                item.get("name", row.get("query_name", "")), raw))
            return out
        for item in data.get("data", []):
            name = item.get("name")
            if name is None:
                continue
            cid = "figi-company-" + hashlib.sha1(name.encode()).hexdigest()[:16]
            out.append((cid, "Company", name, json.dumps({"topics": ["corp.public"]})))
        return out


class PermIDEnricher(ConnectorEnricher):
    """LSEG PermID record-matching: one CSV body per entity with up to 999
    (name x country) rows plus an optional LEI standard identifier; the
    response maps each LocalID to its best match (permid.py:50-84)."""

    name = "permid"
    url = "https://api.example.org/permid/match"

    def accepts_schema(self, schema: str | None) -> bool:
        return schema_is_a(schema, "Organization")

    def request_for(self, row: pd.Series) -> str:
        names = [str(row.get("query_name", ""))]
        countries = [_sval(row, "country").upper()[:2], ""]
        lei = _sval(row, "lei_code")
        lei_field = f"LEI:{lei}" if lei else ""
        lines = ["LocalID,Standard Identifier,Name,Country"]
        for name in names:
            for c in dict.fromkeys(countries):  # ordered-unique
                if len(lines) > 999:
                    break
                lines.append(f"{row['query_id']},{lei_field},{name},{c}")
        return json.dumps({"csv": "\n".join(lines)})

    def parse(self, row: pd.Series, response: str) -> list[tuple[str, str, str, str]]:
        out = []
        for r in json.loads(response).get("outputContentResponse", []):
            match_id = r.get("Match OpenPermID")
            if not match_id or r.get("Match Level") == "No Match":
                continue
            raw = json.dumps({"matchScore": r.get("Match Score"),
                              "permId": match_id.rsplit("-", 1)[-1]})
            out.append((f"permid-{match_id.rsplit('-', 1)[-1]}", "Company",
                        r.get("Match OrgName", ""), raw))
        return out


class WikidataEnricher(ConnectorEnricher):
    """Wikidata: Person entities only.  If the query already carries a QID
    it is fetched directly (short-circuit); otherwise a label search with
    ``search_limit`` results (wikidata.py:54-76)."""

    name = "wikidata"
    url = "https://wikidata.example.org/w/api.php"

    def __init__(self, search_limit: int = 7, **kw: Any) -> None:
        super().__init__(**kw)
        self.search_limit = search_limit

    def accepts_schema(self, schema: str | None) -> bool:
        return schema == "Person"

    def request_for(self, row: pd.Series) -> str:
        qid = _sval(row, "wikidata_id")
        if qid.startswith("Q"):
            return json.dumps({"action": "wbgetentities", "ids": qid})
        return json.dumps({
            "action": "wbsearchentities",
            "search": str(row.get("query_name", "")),
            "limit": self.search_limit,
        }, sort_keys=True)

    def parse(self, row: pd.Series, response: str) -> list[tuple[str, str, str, str]]:
        data = json.loads(response)
        out = []
        if "entities" in data:  # direct QID fetch
            for qid, item in data["entities"].items():
                label = item.get("labels", {}).get("en", {}).get("value", "")
                out.append((qid, "Person", label, json.dumps({"direct": True})))
            return out
        for hit in data.get("search", [])[: self.search_limit]:
            out.append((hit["id"], "Person", hit.get("label", ""),
                        json.dumps({"description": hit.get("description")})))
        return out


class BrightQueryEnricher(ConnectorEnricher):
    """BrightQuery Business Identity: US legal entities; search by
    organization name; candidates carry bq organization/legal-entity ids;
    falls back to the organization name when a record has no legal-entity
    name (brightquery.py:17-80)."""

    name = "brightquery"
    url = "https://api.example.org/search/identity/org"

    def __init__(self, skip_jurisdictions: set[str] | None = None, **kw: Any) -> None:
        super().__init__(**kw)
        self.skip_jurisdictions = skip_jurisdictions or set()

    def accepts_schema(self, schema: str | None) -> bool:
        return schema_is_a(schema, "Organization")

    def request_for(self, row: pd.Series) -> str | None:
        juris = _sval(row, "country").lower()
        if juris in self.skip_jurisdictions:
            return None
        return json.dumps({"name": str(row.get("query_name", ""))}, sort_keys=True)

    def parse(self, row: pd.Series, response: str) -> list[tuple[str, str, str, str]]:
        out = []
        for child in json.loads(response).get("results", []):
            name = child.get("bq_legal_entity_name") or child.get("bq_organization_name")
            if not name:
                continue
            raw = json.dumps({
                "bqOrganizationId": child.get("bq_organization_id"),
                "bqLegalEntityId": child.get("bq_legal_entity_id"),
                "jurisdiction": child.get("bq_state_of_incorporation"),
            })
            out.append((f"bq-{child.get('bq_legal_entity_id')}", "Company", name, raw))
        return out


ALL_CONNECTORS: dict[str, type[ConnectorEnricher]] = {
    c.name: c
    for c in (
        AlephEnricher, BrightQueryEnricher, NominatimEnricher,
        OpenCorporatesEnricher, OpenFIGIEnricher, PermIDEnricher,
        WikidataEnricher, YenteEnricher,
    )
}


# The reference addresses enricher classes by dotted path in its YAML
# configs ("nomenklatura.enrich.yente:YenteEnricher" — cli.py:35-45,
# enrich/__init__.py make_enricher); map the class-name tail onto this
# module's re-expressions so those configs load unchanged.
_TYPE_TAILS: dict[str, type[ConnectorEnricher]] = {
    "YenteEnricher": YenteEnricher,
    "AlephEnricher": AlephEnricher,
    "NominatimEnricher": NominatimEnricher,
    "OpenCorporatesEnricher": OpenCorporatesEnricher,
    "OpenFIGIEnricher": OpenFIGIEnricher,
    "PermIDEnricher": PermIDEnricher,
    "WikidataEnricher": WikidataEnricher,
    "BrightQueryEnricher": BrightQueryEnricher,
}

_ENV_RE = re.compile(r"\$\{([A-Z0-9_]+)\}")


def _expand_env(value: Any) -> Any:
    """``${VAR}`` placeholders in config strings resolve from the
    environment (the reference's api_key convention, e.g.
    enrichers/offshoreleaks.yml)."""
    if isinstance(value, str):
        return _ENV_RE.sub(lambda m: os.environ.get(m.group(1), ""), value)
    return value


def make_enricher(
    config: dict[str, Any], fetch: Fetch | None = None
) -> ConnectorEnricher:
    """Instantiate a connector from a reference-format enricher config
    dict (the parsed YAML): ``type`` selects the class (dotted-path tail
    or bare connector name), every other scalar key passes through as a
    constructor kwarg with ``${VAR}`` environment expansion."""
    spec = str(config.get("type", ""))
    tail = spec.rsplit(":", 1)[-1]
    cls = _TYPE_TAILS.get(tail) or ALL_CONNECTORS.get(tail.lower())
    if cls is None:
        raise TypeError(f"unknown enricher type: {spec!r}")
    import inspect

    allowed = set()
    for klass in cls.__mro__:
        sig = getattr(klass, "__init__", None)
        if sig is None or klass is object:
            continue
        allowed.update(inspect.signature(sig).parameters)
    kwargs = {
        k: _expand_env(v)
        for k, v in config.items()
        if k not in ("type", "name", "title") and k in allowed
    }
    return cls(fetch=fetch, **kwargs)


def load_enricher_yaml(path: str, fetch: Fetch | None = None) -> ConnectorEnricher:
    """Read a reference-format enricher YAML file and build the connector."""
    import yaml

    with open(path) as fh:
        return make_enricher(yaml.safe_load(fh), fetch=fetch)
