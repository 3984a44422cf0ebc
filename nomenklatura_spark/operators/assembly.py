"""Entity assembly and adjacency (SURVEY.md §2.5 A7, §2.4 J6).

The reference assembles entities by sorting statements by canonical id and
streaming a group-by (nomenklatura/store/sql.py:68-87). In Spark the
shuffle *is* the sort: ``groupBy(canonical_id).agg(collect_list(...))``.
For 100 TB the preferred shape is to stay statement-level/relational and
only assemble at the edge; both are provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assemble_entities(stmts: DataFrame) -> DataFrame:
    """A7 — group statements into entity rows.

    Output: one row per canonical_id with schema (max wins on mixed
    fragments, mirroring the reference's precedence of more-specific
    schemata on merge), datasets, and a sorted array of (prop, value)
    structs. Sorting makes the result deterministic for hashing/compare.
    """
    return (
        stmts.groupBy("canonical_id")
        .agg(
            F.max("schema").alias("schema"),
            F.array_sort(F.collect_set("dataset")).alias("datasets"),
            F.array_sort(
                F.collect_list(F.struct(F.col("prop"), F.col("value")))
            ).alias("statements"),
            F.count(F.lit(1)).alias("n_statements"),
        )
    )


def assemble_properties(stmts: DataFrame) -> DataFrame:
    """Multi-valued property map: one row per (canonical_id, prop) with the
    distinct value set (SURVEY.md §1.2 multi-valued mapping)."""
    return (
        stmts.groupBy("canonical_id", "schema", "prop")
        .agg(F.array_sort(F.collect_set("value")).alias("values"))
    )


def adjacency(stmts: DataFrame) -> DataFrame:
    """J6 — inverted adjacency join over entity-valued statements.

    An entity-typed statement ``(e, prop, v)`` is a graph edge e →(prop)→ v.
    Returns edges joined with the *target* entity's statements so callers can
    answer "all Payments whose beneficiary is X" / ``get_inverted``.
    Reference: nomenklatura/store/sql.py:219-237, store/base.py:120-131.

    Self-equi-join on canonical_id: at scale both sides shuffle on the same
    key; if statements are bucketed by canonical_id this is co-located.
    """
    edges = stmts.where(F.col("prop_type") == "entity").select(
        F.col("canonical_id").alias("src_id"),
        F.col("schema").alias("src_schema"),
        F.col("prop").alias("edge_prop"),
        F.col("value").alias("dst_id"),
    )
    targets = stmts.select(
        F.col("canonical_id").alias("dst_id"),
        F.col("schema").alias("dst_schema"),
        F.col("prop").alias("dst_prop"),
        F.col("value").alias("dst_value"),
    )
    return edges.join(targets, "dst_id", "inner")
