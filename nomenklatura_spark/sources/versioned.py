"""S6 — versioned statement store: dataset-level snapshots with
latest-pointer semantics and first_seen carry-over.

Reference: ``nomenklatura/store/versioned.py`` — statements keyed by
(dataset, version), a 'latest' pointer per dataset, and first_seen
carried over from the previous version on release (versioned.py:190-198).

Spark shape: one parquet/Delta table partitioned by (dataset, version);
'latest' is a tiny manifest table. On Delta this maps to time travel; the
plain-parquet form here keeps identical query semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def carry_first_seen(incoming: DataFrame, prev: DataFrame | None) -> DataFrame:
    """S6 first_seen carry-over as a pure transformation (reference
    versioned.py:190-198): statements whose content id existed in the
    previous snapshot keep their old first_seen. One left join on the
    content hash; the previous side projects two columns only."""
    if prev is None:
        return incoming
    carry = prev.select("id", F.col("first_seen").alias("_prev_first"))
    return (
        incoming.join(carry, "id", "left")
        .withColumn("first_seen", F.coalesce("_prev_first", "first_seen"))
        .drop("_prev_first")
    )


class VersionedStatementStore:
    def __init__(self, spark: SparkSession, base_dir: str) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.data_dir = os.path.join(base_dir, "statements")
        self.manifest_path = os.path.join(base_dir, "manifest")

    # -- manifest ----------------------------------------------------------
    def _read_manifest(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.manifest_path)
        except Exception:
            return self.spark.createDataFrame(
                [], "dataset string, version string, released string"
            )

    def latest_versions(self) -> DataFrame:
        """One row per dataset: its most recently released version."""
        m = self._read_manifest()
        return (
            m.groupBy("dataset")
            .agg(F.max(F.struct("released", "version")).alias("top"))
            .select("dataset", F.col("top.version").alias("version"))
        )

    def versions(self, dataset: str) -> list[str]:
        m = self._read_manifest().where(F.col("dataset") == dataset)
        return [r["version"] for r in m.orderBy("released").collect()]

    # -- write path --------------------------------------------------------
    def release(
        self, stmts: DataFrame, dataset: str, version: str, released: str
    ) -> None:
        """Publish a dataset snapshot. first_seen carry-over: statements
        whose id existed in the previous latest version keep their old
        first_seen (versioned.py:190-198)."""
        prev = self.latest_statements(dataset)
        incoming = carry_first_seen(
            stmts.where(F.col("dataset") == dataset), prev
        )
        out = os.path.join(self.data_dir, f"dataset={dataset}", f"version={version}")
        incoming.drop("dataset").write.mode("overwrite").parquet(out)
        manifest = self._read_manifest().unionByName(
            self.spark.createDataFrame(
                [(dataset, version, released)],
                "dataset string, version string, released string",
            )
        )
        manifest.write.mode("overwrite").parquet(self.manifest_path + ".tmp")
        self.spark.read.parquet(self.manifest_path + ".tmp").write.mode(
            "overwrite"
        ).parquet(self.manifest_path)

    def drop_version(self, dataset: str, version: str) -> None:
        m = self._read_manifest().where(
            ~((F.col("dataset") == dataset) & (F.col("version") == version))
        )
        m.write.mode("overwrite").parquet(self.manifest_path + ".tmp")
        self.spark.read.parquet(self.manifest_path + ".tmp").write.mode(
            "overwrite"
        ).parquet(self.manifest_path)

    # -- read path ---------------------------------------------------------
    def statements_at(self, dataset: str, version: str) -> DataFrame | None:
        path = os.path.join(self.data_dir, f"dataset={dataset}", f"version={version}")
        try:
            df = self.spark.read.parquet(path)
        except Exception:
            return None
        return df.withColumn("dataset", F.lit(dataset))

    def latest_statements(self, dataset: str) -> DataFrame | None:
        latest = self.latest_versions().where(F.col("dataset") == dataset).collect()
        if not latest:
            return None
        return self.statements_at(dataset, latest[0]["version"])

    def view(self, datasets: list[str]) -> DataFrame | None:
        """SO1 — multi-dataset union view over each dataset's latest
        version (versioned.py:341-350)."""
        frames = [
            df for ds in datasets if (df := self.latest_statements(ds)) is not None
        ]
        if not frames:
            return None
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out
