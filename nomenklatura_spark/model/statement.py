"""The statement data model — the engine's fundamental record.

A statement is a row-oriented triple-store record: ``(entity_id, prop,
value)`` plus provenance and resolution columns. Reference layout:
``nomenklatura/db.py:193-214`` (13 columns, all values stored as strings;
multi-valued properties are simply repeated rows).

Spark mapping (SURVEY.md §1.2): a DataFrame with this fixed StructType,
partitioned by ``dataset`` at rest so dataset scoping becomes partition
pruning, and shuffled/bucketed by ``canonical_id`` for assembly joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

# Column order mirrors the reference's statement table
# (nomenklatura/db.py:193-214).
STATEMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("canonical_id", T.StringType(), False),
        T.StructField("prop", T.StringType(), False),
        T.StructField("prop_type", T.StringType(), False),
        T.StructField("schema", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
        T.StructField("original_value", T.StringType(), True),
        T.StructField("dataset", T.StringType(), False),
        T.StructField("origin", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("external", T.BooleanType(), False),
        T.StructField("first_seen", T.TimestampType(), True),
        T.StructField("last_seen", T.TimestampType(), True),
    ]
)

STATEMENT_COLUMNS = [f.name for f in STATEMENT_SCHEMA.fields]


def _stmt_id(entity_id: Column, prop: Column, value: Column) -> Column:
    """Content-hash statement id (reference hashes the statement content to
    make statements a set — nomenklatura/store/sql.py:125-150 upserts on it).
    sha256 of the RS-separated key tuple.
    """
    return F.sha2(F.concat_ws("\x1e", entity_id, prop, value), 256)


def statements_from_wide_table(
    df: DataFrame,
    entity_id_col: str,
    schema: str,
    prop_cols: dict[str, str],
    dataset: str,
    prop_types: dict[str, str] | None = None,
    entity_props: dict[str, str] | None = None,
) -> DataFrame:
    """Unpivot a wide relational table into statement rows.

    ``prop_cols`` maps source column → FtM-style prop name. ``entity_props``
    maps prop name → referenced schema for entity-typed props (foreign
    keys), which get ``prop_type='entity'``. This is how the TPC-H-ish
    testdata becomes a property graph the ER operators can run on
    (e.g. orders.o_custkey → an entity-valued prop referencing customer).

    Uses ``stack`` (a single narrow projection, no shuffle, no UDF) so the
    unpivot is pure whole-stage-codegen work at any scale.
    """
    prop_types = prop_types or {}
    entity_props = entity_props or {}
    eid = F.concat(F.lit(f"{schema.lower()}-"), F.col(entity_id_col).cast("string"))

    pairs: list[Column] = []
    for src_col, prop in prop_cols.items():
        pairs.append(F.lit(prop))
        pairs.append(F.col(src_col).cast("string"))
    n = len(prop_cols)
    stacked = df.select(
        eid.alias("entity_id"),
        F.stack(F.lit(n), *pairs).alias("prop", "value"),
    ).where(F.col("value").isNotNull())

    prop_type = F.lit("string")
    for prop, ptype in prop_types.items():
        prop_type = F.when(F.col("prop") == prop, F.lit(ptype)).otherwise(prop_type)
    for prop, ref_schema in entity_props.items():
        prop_type = F.when(F.col("prop") == prop, F.lit("entity")).otherwise(prop_type)

    value = F.col("value")
    for prop, ref_schema in entity_props.items():
        value = F.when(
            F.col("prop") == prop,
            F.concat(F.lit(f"{ref_schema.lower()}-"), F.col("value")),
        ).otherwise(value)

    return stacked.select(
        _stmt_id(F.col("entity_id"), F.col("prop"), value).alias("id"),
        F.col("entity_id"),
        F.col("entity_id").alias("canonical_id"),
        F.col("prop"),
        prop_type.alias("prop_type"),
        F.lit(schema).alias("schema"),
        value.alias("value"),
        F.lit(None).cast("string").alias("original_value"),
        F.lit(dataset).alias("dataset"),
        F.lit(None).cast("string").alias("origin"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(False).alias("external"),
        F.lit(None).cast("timestamp").alias("first_seen"),
        F.lit(None).cast("timestamp").alias("last_seen"),
    )
