"""S2/S4/S7 — statement CSV pack format, dataset bulk load, resolver dump.

- Statement CSV: the reference's interchange format (cli.py:322-334 via the
  FtM CLI utils) — fixed column order, header, RFC-4180 quoting.
- Dataset replace: delete-then-insert per dataset (db.py:217-263) →
  partitioned parquet overwrite with dynamic partition pruning.
- Resolver dump: JSON-lines edges [target, source, judgement, score, user,
  created_at] (resolver/edge.py:56-65, resolver.py:622-651).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from nomenklatura_spark.model.statement import STATEMENT_COLUMNS, STATEMENT_SCHEMA


def read_statement_csv(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(STATEMENT_SCHEMA)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def write_statement_csv(stmts: DataFrame, path: str) -> None:
    (
        stmts.select(*STATEMENT_COLUMNS)
        .write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def write_statements_partitioned(stmts: DataFrame, path: str) -> None:
    """S4 — bulk load with per-dataset replacement semantics: partition the
    store by ``dataset`` and overwrite only the partitions present in the
    incoming frame (Spark dynamic partition overwrite ≈ the reference's
    delete-then-insert per dataset, db.py:217-263). Dataset scoping reads
    then become partition pruning."""
    (
        stmts.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("dataset")
        .parquet(path)
    )


def write_statements_bucketed(
    stmts: DataFrame, table: str, n_buckets: int = 64
) -> None:
    """Clustered store layout (SURVEY §1.2: "bucketed/sorted by
    canonical_id"): hash-bucket + sort the statement table on
    ``canonical_id`` so every canonical-keyed stage — entity assembly
    (A7), the adjacency self-join (J6), linker application (J7), pair
    feature assembly (J8) — reads co-partitioned, pre-sorted data and
    the shuffle disappears from those plans entirely (verified by the
    no-Exchange plan test).

    This is the Spark analogue of the reference's ordered-key layouts
    (LevelDB key design / ``ORDER BY canonical_id`` streaming group-by,
    store/sql.py:68-87) — bucketing requires a catalog table rather than
    a bare path, hence ``saveAsTable``.
    """
    (
        stmts.write.mode("overwrite")
        .bucketBy(n_buckets, "canonical_id")
        .sortBy("canonical_id")
        .format("parquet")
        .saveAsTable(table)
    )


def salt_hot_keys(
    df: DataFrame, key: str, hot_keys: list[str], n_salts: int = 16
) -> DataFrame:
    """Skew salting for a join key: explode each hot key's rows across
    ``n_salts`` salted keys (``k#0..k#15``); the other side replicates its
    hot rows across all salts (``explode_salts``).  AQE's skew-join
    handles moderate skew automatically; this is the manual tool for the
    pathological single-key case (SCALE.md).
    """
    is_hot = F.col(key).isin(hot_keys)
    return df.withColumn(
        key,
        F.when(
            is_hot,
            F.concat(
                F.col(key),
                F.lit("#"),
                (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts).cast(
                    "string"
                ),
            ),
        ).otherwise(F.col(key)),
    )


def explode_salts(
    df: DataFrame, key: str, hot_keys: list[str], n_salts: int = 16
) -> DataFrame:
    """Build-side twin of ``salt_hot_keys``: replicate hot-key rows once
    per salt so the salted equi-join finds every partner."""
    is_hot = F.col(key).isin(hot_keys)
    salts = F.array(*[F.lit(f"#{i}") for i in range(n_salts)])
    return df.withColumn(
        "_salt", F.explode(F.when(is_hot, salts).otherwise(F.array(F.lit(""))))
    ).withColumn(key, F.concat(F.col(key), F.col("_salt"))).drop("_salt")


RESOLVER_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("target", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("judgement", T.StringType(), False),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("created_at", T.StringType(), True),
    ]
)


def read_resolver_dump(spark: SparkSession, path: str) -> DataFrame:
    """S7 — JSON-lines of 6-element arrays → edge DataFrame."""
    arr = T.ArrayType(T.StringType())
    raw = spark.read.text(path)
    parsed = raw.select(F.from_json("value", arr).alias("e"))
    return parsed.select(
        F.col("e")[0].alias("target"),
        F.col("e")[1].alias("source"),
        F.col("e")[2].alias("judgement"),
        F.col("e")[3].cast("double").alias("score"),
        F.col("e")[4].alias("user"),
        F.col("e")[5].alias("created_at"),
    )


def write_resolver_dump(edges: DataFrame, path: str) -> None:
    """Live edges only, ordered ascending by created_at (resolver.py:622-651)."""
    live = edges
    if "deleted_at" in edges.columns:
        live = edges.where(F.col("deleted_at").isNull())
    (
        live.select(
            F.to_json(
                F.array(
                    "target",
                    "source",
                    "judgement",
                    F.col("score").cast("string"),
                    "user",
                    "created_at",
                )
            ).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
