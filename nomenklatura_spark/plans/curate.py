"""End-to-end corpus curation verdict — the composition a training-data
pipeline actually runs, as ONE Spark plan.

Each document gets an independent boolean verdict per curation
dimension, plus their conjunction:

- ``keep_quality``   — Gopher/C4-style length/word/punctuation gate
  (``textops.analysis.quality_features``).
- ``keep_exact``     — exact near-dup: min doc_id per bag-of-words
  fingerprint survives (``textops.analysis.doc_fingerprint``).
- ``keep_near_dup``  — n-gram Jaccard pair graph → connected components
  → min-id survivor (``dedup.survivors.select_survivors``).
- ``keep_decontam``  — not containing ≥ threshold of any benchmark
  item's word n-grams (``dedup.ngram.ngram_containment_pairs``).
- ``keep_boiler``    — boilerplate ratio below the cut
  (``textops.analysis.boilerplate_stats``).
- ``keep``           — AND of the five.

Returning verdict COLUMNS instead of a filtered corpus is deliberate:
the audit (how many docs each stage would drop, which stages agree) is
one aggregation over the flags, and the final filter is one where().

Plan shape (100 TB): every dimension prunes the scan to (doc_id, text)
— plan-audited, nothing else reaches parquet — and re-scans that
two-column projection rather than caching the corpus (at 100 TB a
columnar re-scan of two columns beats materializing them; Catalyst
can't share one scan across the five verdict subtrees anyway).  The
quality gate is map-side; the exact fingerprint is one window shuffle;
the near-dup / decontamination / boilerplate verdicts are each bounded
joins against SMALL relations (a pairs-only component map, the
containment-hit list, the per-doc gram rollup) keyed by doc_id, which
AQE broadcasts or co-partitions.  The conjunction is a final
projection, not a pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nomenklatura_spark.dedup.ngram import ngram_containment_pairs
from nomenklatura_spark.dedup.survivors import select_survivors
from nomenklatura_spark.textops.analysis import (
    boilerplate_stats,
    doc_fingerprint,
    quality_features,
)


def curate_verdicts(
    docs: DataFrame,
    near_dup_pairs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boiler_max: float = 0.85,
    contain_threshold: float = 0.5,
    k_contain: int = 5,
    boiler_k: int = 2,
    boiler_min_df: tuple[int, int] = (1, 20),
    extra_dup_graphs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Per-document curation verdict columns over the whole corpus.

    ``extra_dup_graphs`` adds survivor-selection dimensions beyond the
    n-gram graph — e.g. ``{"semantic": embedding_pairs}`` yields a
    ``keep_semantic`` column (min-id survivor per component of that
    graph) that joins the conjunction; any (lid, rid) pair relation on
    the document id grain works (MinHash, SimHash, embedding LSH,
    SemDeDup cells)."""
    base = docs.select(id_col, text_col)

    quality = quality_features(base, text_col).select(
        id_col, F.col("q_keep").alias("keep_quality")
    )

    fp = base.select(id_col, doc_fingerprint(F.col(text_col)).alias("_f"))
    exact = fp.select(
        id_col,
        (
            F.col(id_col) == F.min(id_col).over(Window.partitionBy("_f"))
        ).alias("keep_exact"),
    )

    survivors = select_survivors(base, near_dup_pairs, id_col=id_col).select(
        id_col, F.col("keep").alias("keep_near_dup")
    )

    hits = (
        ngram_containment_pairs(
            base,
            bench,
            id_col,
            text_col,
            k=k_contain,
            threshold=contain_threshold,
            mode="word",
        )
        .select(F.col("doc_id").alias(id_col))  # fixed output grain
        .distinct()
        .withColumn("_contaminated", F.lit(True))
    )
    decontam = base.select(id_col).join(hits, id_col, "left").select(
        id_col,
        (~F.coalesce("_contaminated", F.lit(False))).alias("keep_decontam"),
    )

    boiler = boilerplate_stats(
        base, id_col, text_col, k=boiler_k, min_df=boiler_min_df
    ).select(
        id_col, (F.col("boilerplate_ratio") < boiler_max).alias("keep_boiler")
    )

    out = (
        quality.join(exact, id_col)
        .join(survivors, id_col)
        .join(decontam, id_col)
        .join(boiler, id_col)
    )
    flag_cols = [
        "keep_quality",
        "keep_exact",
        "keep_near_dup",
        "keep_decontam",
        "keep_boiler",
    ]
    for name, graph in sorted((extra_dup_graphs or {}).items()):
        extra = select_survivors(base, graph, id_col=id_col).select(
            id_col, F.col("keep").alias(f"keep_{name}")
        )
        out = out.join(extra, id_col)
        flag_cols.append(f"keep_{name}")
    keep = F.col(flag_cols[0])
    for c in flag_cols[1:]:
        keep = keep & F.col(c)
    return out.select(id_col, *flag_cols, keep.alias("keep"))


def curation_audit(verdicts: DataFrame) -> DataFrame:
    """One-row audit over the verdict flags: corpus size, per-stage keep
    counts, and the final kept count — a single aggregation, no extra
    corpus pass."""
    flags = [c for c in verdicts.columns if c.startswith("keep")]
    return verdicts.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.count(F.when(F.col(c), 1)).alias(f"n_{c}") for c in flags],
    )
