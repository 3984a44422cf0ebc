"""FollowTheMoney schema ontology as data (F4/J4/F6 dimension tables).

The reference derives matchability from the followthemoney model at
runtime (``nomenklatura/xref.py:105`` ``left.schema.can_match(right.
schema)``; ``blocker/index.py:220-225`` matchable filtering).  This
module encodes the public FtM schema graph (followthemoney on PyPI,
``model/schemata/*.yaml``) as plain dictionaries and derives the same
relations the reference consults:

- ``is_a``: (schema, ancestor) transitive closure including self;
- ``matchable``: schemata eligible for entity matching;
- ``can_match``: FtM's rule (``followthemoney/schema.py``): two schemata
  can match iff the other is among the matchable ancestors-or-descendants
  of self — so Person~LegalEntity matches (ancestor) but Person~Company
  does not (siblings under LegalEntity).

Shipped as broadcast-sized DataFrames so the blocker/xref stack works on
real FtM data without caller-supplied schema pairs.  The hierarchy below
covers the full matchable surface plus the common document/interval
schemata; unknown schemata simply don't join (same effect as FtM's
"not matchable").
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

# schema -> (parents, matchable) — from the public followthemoney model.
SCHEMATA: dict[str, tuple[tuple[str, ...], bool]] = {
    "Thing": ((), False),
    "Asset": (("Thing",), False),
    "LegalEntity": (("Thing",), True),
    "Person": (("LegalEntity",), True),
    "Organization": (("LegalEntity",), True),
    "Company": (("Organization", "Asset"), True),
    "PublicBody": (("Organization",), True),
    "Address": (("Thing",), True),
    "Position": (("Thing",), True),
    "Vehicle": (("Asset",), True),
    "Vessel": (("Vehicle",), True),
    "Airplane": (("Vehicle",), True),
    "Security": (("Asset",), True),
    "CryptoWallet": (("Asset",), True),
    "BankAccount": (("Asset",), True),
    "RealEstate": (("Asset",), False),
    "Contract": (("Asset",), False),
    "Interval": ((), False),
    "Interest": (("Interval",), False),
    "Ownership": (("Interest",), False),
    "Directorship": (("Interest",), False),
    "Membership": (("Interest",), False),
    "Employment": (("Interest",), False),
    "Representation": (("Interest",), False),
    "UnknownLink": (("Interest",), False),
    "Associate": (("Interval",), False),
    "Family": (("Interval",), False),
    "Succession": (("Interval",), False),
    "Identification": (("Interval",), False),
    "Passport": (("Identification",), False),
    "Sanction": (("Interval",), False),
    "Occupancy": (("Interval",), False),
    "Documentation": (("Interval",), False),
    "Document": (("Thing",), False),
    "Page": (("Document",), False),
    "Email": (("Document",), False),
    "Event": (("Thing", "Interval"), False),
    "CourtCase": (("Thing",), False),
    "Note": ((), False),
    "Payment": (("Interval",), False),
    "ContractAward": (("Interest",), False),
}


@lru_cache(maxsize=1)
def ancestors() -> dict[str, frozenset[str]]:
    """schema -> transitive ancestors including self."""
    out: dict[str, frozenset[str]] = {}

    def walk(name: str) -> frozenset[str]:
        if name in out:
            return out[name]
        parents, _ = SCHEMATA[name]
        acc = {name}
        for p in parents:
            acc |= walk(p)
        out[name] = frozenset(acc)
        return out[name]

    for name in SCHEMATA:
        walk(name)
    return out


@lru_cache(maxsize=1)
def descendants() -> dict[str, frozenset[str]]:
    anc = ancestors()
    out: dict[str, set[str]] = {name: set() for name in SCHEMATA}
    for name, ups in anc.items():
        for up in ups:
            out[up].add(name)
    return {k: frozenset(v) for k, v in out.items()}


@lru_cache(maxsize=1)
def matchable_schemata() -> dict[str, frozenset[str]]:
    """FtM ``Schema.matchable_schemata``: the matchable schemata among
    self's ancestors and descendants (empty when self is unmatchable)."""
    anc, desc = ancestors(), descendants()
    out = {}
    for name, (_, matchable) in SCHEMATA.items():
        if not matchable:
            out[name] = frozenset()
            continue
        pool = anc[name] | desc[name]
        out[name] = frozenset(s for s in pool if SCHEMATA[s][1])
    return out


def can_match(left: str, right: str) -> bool:
    """``left.schema.can_match(right.schema)`` (followthemoney/schema.py)."""
    return right in matchable_schemata().get(left, frozenset())


def can_match_pairs() -> list[tuple[str, str]]:
    return sorted(
        (left, right)
        for left, targets in matchable_schemata().items()
        for right in targets
    )


# --- broadcast dimension DataFrames ----------------------------------------


def schemata_pairs_df(spark: SparkSession) -> DataFrame:
    """The (left, right) can_match dimension the blocker joins expect."""
    return spark.createDataFrame(can_match_pairs(), "left string, right string")


def matchable_df(spark: SparkSession) -> DataFrame:
    """Single-column matchable-schema dimension (F4 semi-join)."""
    rows = [(s,) for s, (_, m) in sorted(SCHEMATA.items()) if m]
    return spark.createDataFrame(rows, "schema string")


def is_a_df(spark: SparkSession) -> DataFrame:
    """(schema, ancestor) transitive-closure dimension including self."""
    rows = sorted(
        (s, a) for s, ups in ancestors().items() for a in ups
    )
    return spark.createDataFrame(rows, "schema string, ancestor string")
