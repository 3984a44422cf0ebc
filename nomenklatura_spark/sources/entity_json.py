"""S1/S10 — newline-delimited FtM entity JSON ⇄ statements.

Format (reference ``nomenklatura/store/__init__.py:26-45`` and
``tests/fixtures/donations.ijson``)::

    {"id": "...", "schema": "Person",
     "properties": {"name": ["..."], "country": ["de"], ...},
     "datasets": ["..."]}            # optional

Spark shape: ``spark.read.json`` with an explicit schema (no inference
pass over 100 TB), two explodes (map → prop rows → value rows), and a
broadcast join against the property-type registry. All JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from nomenklatura_spark.model.statement import _stmt_id

ENTITY_JSON_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("schema", T.StringType(), False),
        T.StructField(
            "properties",
            T.MapType(T.StringType(), T.ArrayType(T.StringType())),
            True,
        ),
        T.StructField("datasets", T.ArrayType(T.StringType()), True),
    ]
)

# Minimal FtM-style property registry: prop name → value type. Derived from
# the public FollowTheMoney schema definitions (the subset exercised by the
# reference's fixtures and matchers; unknown props default to 'string').
PROP_TYPES: dict[str, str] = {
    # names
    "name": "name", "alias": "name", "weakAlias": "name",
    "previousName": "name", "abbreviation": "name",
    # dates
    "birthDate": "date", "deathDate": "date", "date": "date",
    "startDate": "date", "endDate": "date", "incorporationDate": "date",
    "dissolutionDate": "date", "modifiedAt": "date", "createdAt": "date",
    # countries
    "country": "country", "jurisdiction": "country", "nationality": "country",
    "citizenship": "country", "mainCountry": "country",
    # entity references (graph edges)
    "addressEntity": "entity", "payer": "entity", "beneficiary": "entity",
    "parent": "entity", "subsidiary": "entity", "asset": "entity",
    "owner": "entity", "director": "entity", "agent": "entity",
    "organization": "entity", "member": "entity", "subject": "entity",
    "familyPerson": "entity", "relative": "entity", "successor": "entity",
    "predecessor": "entity", "holder": "entity", "security": "entity",
    "issuer": "entity", "vessel": "entity",
    # identifiers
    "registrationNumber": "identifier", "idNumber": "identifier",
    "passportNumber": "identifier", "taxNumber": "identifier",
    "vatCode": "identifier", "innCode": "identifier", "ogrnCode": "identifier",
    "leiCode": "identifier", "swiftBic": "identifier", "imoNumber": "identifier",
    "mmsi": "identifier", "isin": "identifier", "uniqueEntityId": "identifier",
    "npiCode": "identifier", "dunsCode": "identifier", "icijId": "identifier",
    "okpoCode": "identifier", "kppCode": "identifier",
    "wikidataId": "identifier",
    # contact / location
    "phone": "phone", "email": "email", "website": "url",
    "address": "address", "full": "address",
    # misc typed
    "gender": "gender", "topics": "topic",
    "amount": "number", "amountEur": "number", "amountUsd": "number",
    "notes": "text", "summary": "text", "description": "text",
    "status": "string", "legalForm": "string", "position": "string",
    "publicKey": "string", "currency": "string",
    "city": "string", "street": "string", "postalCode": "string",
    "title": "string", "purpose": "string", "program": "string",
    "sourceUrl": "url",
}


def prop_registry(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(PROP_TYPES.items()), "prop string, prop_type string"
    )


def read_entity_file(
    spark: SparkSession, path: str, dataset: str = "default"
) -> DataFrame:
    """Entity JSON lines → statement DataFrame (S1).

    Reference: store/__init__.py:26-45. Dataset attribution: the entity's
    first ``datasets`` element when present, else the supplied name
    (the reference derives it from the file stem).
    """
    raw = spark.read.schema(ENTITY_JSON_SCHEMA).json(path)
    props = raw.select(
        F.col("id").alias("entity_id"),
        F.col("schema"),
        F.coalesce(
            F.element_at("datasets", 1), F.lit(dataset)
        ).alias("dataset"),
        F.explode("properties").alias("prop", "values"),
    ).select(
        "entity_id",
        "schema",
        "dataset",
        "prop",
        F.explode("values").alias("value"),
    )
    typed = props.join(F.broadcast(prop_registry(spark)), "prop", "left")
    return typed.select(
        _stmt_id(F.col("entity_id"), F.col("prop"), F.col("value")).alias("id"),
        "entity_id",
        F.col("entity_id").alias("canonical_id"),
        "prop",
        F.coalesce("prop_type", F.lit("string")).alias("prop_type"),
        "schema",
        "value",
        F.lit(None).cast("string").alias("original_value"),
        "dataset",
        F.lit(None).cast("string").alias("origin"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(False).alias("external"),
        F.lit(None).cast("timestamp").alias("first_seen"),
        F.lit(None).cast("timestamp").alias("last_seen"),
    )


def entities_to_json(stmts: DataFrame, sort: bool = False) -> DataFrame:
    """S10 — assemble statements back to one JSON line per entity
    (reference cli.py:224-230 write_entity). Returns a single-column
    DataFrame of JSON strings ready for ``df.write.text``.

    ``sort=True`` orders the output by entity id — the make-sortable
    verb's contract (reference cli.py:239-245)."""
    per_prop = stmts.groupBy("canonical_id", "prop").agg(
        F.array_sort(F.collect_set("value")).alias("values"),
        F.max("schema").alias("schema"),
        F.array_sort(F.collect_set("dataset")).alias("datasets"),
    )
    per_entity = per_prop.groupBy("canonical_id").agg(
        F.max("schema").alias("schema"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("prop", "values")))
        ).alias("properties"),
        F.array_distinct(F.flatten(F.collect_list("datasets"))).alias("datasets"),
    )
    if sort:
        per_entity = per_entity.orderBy("canonical_id")
    return per_entity.select(
        F.to_json(
            F.struct(
                F.col("canonical_id").alias("id"),
                "schema",
                "properties",
                "datasets",
            )
        ).alias("value")
    )
