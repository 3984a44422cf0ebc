"""Statement-level filters (SURVEY.md §2.2 F1-F5).

All are plain Catalyst predicates — they push down to the parquet scan and,
with ``dataset`` as a partition column at rest, F1 becomes partition
pruning (zero-IO scoping at 100 TB).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def scope_datasets(stmts: DataFrame, leaf_names: Sequence[str]) -> DataFrame:
    """F1 — dataset-scope filter: ``dataset IN leaf_names``.

    Reference: nomenklatura/store/sql.py:201,244; store/base.py:108.
    """
    return stmts.where(F.col("dataset").isin(list(leaf_names)))


def filter_external(stmts: DataFrame, include_external: bool = False) -> DataFrame:
    """F2 — drop enrichment-candidate statements unless requested.

    Reference: nomenklatura/store/memory.py:83-86.
    """
    if include_external:
        return stmts
    return stmts.where(~F.col("external"))


def filter_schemata(stmts: DataFrame, include_schemata: Sequence[str]) -> DataFrame:
    """F3 — exact schema membership (no is_a expansion, matching the
    reference: nomenklatura/store/base.py:133-141)."""
    return stmts.where(F.col("schema").isin(list(include_schemata)))


def filter_matchable(
    stmts: DataFrame, matchable_schemata: DataFrame | None = None
) -> DataFrame:
    """F4 — keep only statements of matchable schemata, via a broadcast
    semi-join against the (tiny) schema-registry dimension.  Defaults to
    the bundled FtM ontology (model/ftm.py).

    Reference: nomenklatura/blocker/index.py:160-161,227.
    """
    if matchable_schemata is None:
        from nomenklatura_spark.model.ftm import matchable_df

        matchable_schemata = matchable_df(stmts.sparkSession)
    return stmts.join(
        F.broadcast(matchable_schemata.select("schema")), "schema", "left_semi"
    )
