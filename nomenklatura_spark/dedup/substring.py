"""Duplicated-passage detection (exact-substring dedup, bounded form).

The reference point is suffix-array exact-substring deduplication (Lee
et al., "Deduplicating Training Data Makes Language Models Better", ACL
2022).  A distributed suffix array is impractical as a Spark operator;
the standard scalable approximation is fixed-length window
fingerprinting: every ``k``-word window is hashed, a window whose hash
occurs more than once in the corpus (in another document or repeated in
the same one) is a duplicated passage, and each document reports the
fraction of its windows that are duplicated.  Downstream policy drops or
trims documents above a duplicated-fraction threshold.

Spark-first / 100 TB shape:

- Window generation is map-side: one materialized word-split per row
  (bound to a column BEFORE the lambda so Catalyst evaluates it once,
  not per array element — see dedup/ngram.py module notes), one
  ``transform`` over a position ``sequence``, one ``explode_outer``
  (keeps windowless short docs without a join back to the corpus, and
  avoids the InferFiltersFromGenerate scan-duplication of plain
  ``explode``).
- Corpus-wide occurrence counts are a window count partitioned by the
  16-byte window hash — ONE shuffle keyed on the hash — followed by the
  per-document rollup, which is the second and last shuffle.  No join
  against a counts relation.
- The shuffle key is ``md5`` of the window text, not the text itself:
  at 100 TB the exploded relation dominates the job, and hashing caps
  the shuffled key at 32 bytes regardless of window width.
- Hot hashes (boilerplate passages repeated millions of times) are
  exactly the rows the count flags; AQE skew handling splits them, and
  they carry no per-key state beyond the count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

WORD_SPLIT = r"[^\p{L}\p{N}']+"


def _words(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), WORD_SPLIT), lambda w: w != "")


def duplicated_passages(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    decimals: int = 4,
) -> DataFrame:
    """Per-document duplicated-window statistics.

    Returns (id, n_windows, dup_windows, dup_frac): the number of
    ``k``-word windows, how many of them occur elsewhere in the corpus
    (total multiplicity >= 2, so an in-document repeat counts too), and
    the duplicated fraction.
    """
    ws = docs.select(F.col(id_col).alias("id"), _words(F.col(text_col)).alias("ws"))
    n = F.size(F.col("ws")) - F.lit(k - 1)
    windows = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("ws"), i, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = ws.select(
        "id", F.explode_outer(windows).alias("h")
    )
    cnt = F.count(F.lit(1)).over(Window.partitionBy("h"))
    flagged = exploded.select(
        "id",
        F.col("h").isNotNull().alias("is_win"),
        (F.col("h").isNotNull() & (cnt >= 2)).alias("is_dup"),
    )
    n_windows = F.sum(F.col("is_win").cast("int"))
    dup_windows = F.sum(F.col("is_dup").cast("int"))
    return (
        flagged.groupBy("id")
        .agg(
            n_windows.cast("int").alias("n_windows"),
            dup_windows.cast("int").alias("dup_windows"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_windows",
            "dup_windows",
            F.when(
                F.col("n_windows") > 0,
                F.round(F.col("dup_windows") / F.col("n_windows"), decimals),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


def trim_duplicated_passages(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Remove duplicated passages instead of just measuring them — the
    second half of exact-substring dedup (Lee et al. ACL 2022 drop the
    duplicated spans; ``duplicated_passages`` above is the audit view).

    A word is removed iff it is covered by at least one ``k``-word
    window whose corpus multiplicity is >= 2; the surviving words are
    re-joined with single spaces (whitespace-normalized output, the
    shape the tokenizer sees anyway).  Returns
    ``(id, n_words, words_removed, trimmed_text)``.

    Plan shape on top of the detection operator's two shuffles: the
    duplicated window POSITIONS come back as one per-document array
    (bounded by the document's own length), the corpus rejoins on the
    document id — three shuffles total, and the trim itself is a
    map-side indexed ``filter`` over the word array (position p is
    covered iff a duplicated window starts in ``[p-k+1, p]``), so no
    per-word relation ever shuffles.
    """
    ws = docs.select(F.col(id_col).alias("id"), _words(F.col(text_col)).alias("ws"))
    n = F.size(F.col("ws")) - F.lit(k - 1)
    wins = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(
                i.alias("i"),
                F.md5(F.concat_ws(" ", F.slice(F.col("ws"), i, k))).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<i:int,h:string>>"))
    ex = ws.select("id", F.explode(wins).alias("w"))
    cnt = F.count(F.lit(1)).over(Window.partitionBy("w.h"))
    dup_pos = (
        ex.select("id", F.col("w.i").alias("i"), cnt.alias("c"))
        .where(F.col("c") >= 2)
        .groupBy("id")
        .agg(F.collect_list("i").alias("dup_i"))
    )
    joined = ws.join(dup_pos, "id", "left").select(
        "id",
        "ws",
        F.coalesce("dup_i", F.array().cast("array<int>")).alias("dup_i"),
    )
    # indexed filter: lambda index is 0-based, window starts are 1-based
    kept = F.filter(
        F.col("ws"),
        lambda w, i: ~F.exists(
            F.col("dup_i"),
            lambda j: (j <= i + 1) & (j >= i + 2 - k),
        ),
    )
    return joined.select(
        F.col("id").alias(id_col),
        F.size("ws").cast("int").alias("n_words"),
        (F.size("ws") - F.size(kept)).cast("int").alias("words_removed"),
        F.concat_ws(" ", kept).alias("trimmed_text"),
    )
