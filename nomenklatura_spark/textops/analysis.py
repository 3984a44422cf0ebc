"""Text analysis for training-data pipelines (SURVEY.md extensions):
language ID, quality scoring, token counting, document fingerprinting.

All pure column expressions — these run over every document of a 100 TB
corpus, so they must stay inside whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny high-frequency function-word lists per language for the n-gram/
# stopword-ratio language heuristic. Deliberately small: at corpus scale
# the signal comes from relative counts, not list size.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "für"],
    "fr": ["le", "la", "les", "et", "est", "pour", "dans", "que", "une", "des"],
    "es": ["el", "la", "los", "las", "es", "para", "que", "una", "con", "por"],
}


def words(col: Column) -> Column:
    """Whitespace-ish word array of lowercased text."""
    return F.filter(
        F.split(F.lower(col), r"[^\p{L}\p{N}']+"), lambda w: w != ""
    )


def token_count(col: Column) -> Column:
    """Whitespace token count (the `wc -w` definition)."""
    return F.size(F.filter(F.split(col, r"\s+"), lambda w: w != ""))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token estimate: count of word/number/punctuation chunks via a
    GPT-style pre-tokenizer regex. Upper-bounds the true BPE count; useful
    as a fast budget estimator."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"), 0)
    )


def lang_scores(col: Column, ws: Column | None = None) -> dict[str, Column]:
    if ws is None:
        ws = words(col)
    total = F.greatest(F.size(ws), F.lit(1))
    return {
        lang: F.size(F.filter(ws, lambda w: w.isin(*markers))) / total
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column, min_ratio: float = 0.02, ws: Column | None = None) -> Column:
    """Heuristic language ID: highest marker-word ratio wins; 'und'
    (undetermined) when no language clears ``min_ratio``.

    Expressed as greatest-of-structs so it compiles to one codegen
    stage.  Pass ``ws`` as a plain reference to a pre-materialized word
    array to split once instead of once per language (see
    ``quality_ratio_exprs``)."""
    scores = lang_scores(col, ws)
    pairs = [
        F.struct(score.alias("score"), F.lit(lang).alias("lang"))
        for lang, score in sorted(scores.items())
    ]
    best = F.greatest(*pairs)
    return F.when(best["score"] >= min_ratio, best["lang"]).otherwise(F.lit("und"))


def quality_ratio_exprs(c: Column, ws: Column | None = None) -> dict[str, Column]:
    """The shared raw (unrounded) quality-ratio expression family —
    single source of truth for ``quality_features`` and the trained
    classifier's feature extractor (their SQL oracles replicate these
    term for term, so a drift between two Python copies would silently
    desynchronize the feature families).

    Pass ``ws`` as a PLAIN COLUMN REFERENCE to a pre-materialized word
    array to evaluate the split once per row: the ratios reference the
    array several times, and CollapseProject keeps a non-cheap producer
    expression un-inlined only when staged behind its own projection
    (the ``dedup/ngram`` shingle discipline)."""
    if ws is None:
        ws = words(c)
    n_chars = F.length(c)
    n_words = F.size(ws)
    # Σ word lengths ≡ length of the joined words — one native op instead
    # of an interpreted per-word aggregate lambda (HOFs run outside
    # whole-stage codegen; see SCALE.md round-5 notes)
    mean_word_len = F.when(
        n_words > 0, F.length(F.array_join(ws, "")) / n_words
    ).otherwise(F.lit(0.0))
    # count matches without materializing the match array
    punct_ratio = F.when(
        n_chars > 0, F.regexp_count(c, F.lit(r"[^\w\s]")) / n_chars
    ).otherwise(F.lit(0.0))
    en_stop = F.size(F.filter(ws, lambda w: w.isin(*LANG_MARKERS["en"])))
    stop_ratio = F.when(n_words > 0, en_stop / n_words).otherwise(F.lit(0.0))
    digit_ratio = F.when(
        n_chars > 0, F.regexp_count(c, F.lit(r"[0-9]")) / n_chars
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "digit_ratio": digit_ratio,
    }


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Per-document quality features: length, word stats, punctuation and
    stopword ratios, plus a composite keep/drop heuristic (Gopher-rule
    flavored: C4/Gopher-style length and symbol filters).

    The word split is materialized in its own projection so the five
    features that reference it evaluate it once per row, not five times
    (measured 1.9x on the doc_quality wall at sf0.1)."""
    c = F.col(text_col)
    df = df.withColumn("_q_ws", words(c))
    r = quality_ratio_exprs(c, F.col("_q_ws"))
    n_chars, n_words = r["n_chars"], r["n_words"]
    mean_word_len = r["mean_word_len"]
    punct_ratio, stop_ratio = r["punct_ratio"], r["stop_ratio"]
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_words.alias("q_n_words"),
        F.round(mean_word_len, 4).alias("q_mean_word_len"),
        F.round(punct_ratio, 4).alias("q_punct_ratio"),
        F.round(stop_ratio, 4).alias("q_stop_ratio"),
        (
            (n_words >= 5)
            & (mean_word_len >= 2)
            & (mean_word_len <= 12)
            & (punct_ratio <= 0.3)
        ).alias("q_keep"),
    ).drop("_q_ws")


def _max_sorted_run(arr: Column) -> Column:
    """Longest run of equal adjacent elements in an array (for a sorted
    array this is the max element frequency).  One ``aggregate`` pass with
    a (prev, run, best) struct accumulator — stays map-side/codegen, no
    explode, no shuffle: at corpus scale a per-doc mode must not become a
    (doc, gram) aggregation of the whole corpus."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(arr, init, step, lambda acc: acc["best"])


def repetition_features(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document, all map-side:

    - ``r_n_words`` — word count
    - ``r_dup_word_frac`` — 1 - distinct/total words (bag-level repetition)
    - ``r_top_word_share`` — most frequent word's share of all words
    - ``r_top_bigram_share`` — most frequent word-bigram's share
    - ``r_max_run`` — longest run of the same word consecutively

    High values of any of these mark boilerplate / degenerate generations
    that length or punctuation filters miss (Gopher Appendix A rules).
    Mode counts are computed as longest-equal-run over the sorted
    word/bigram arrays, so the whole frame stays map-side — no explode,
    no per-gram shuffle.  The word split and the bigram zip are each
    materialized in their own projection (plain-column discipline, see
    ``quality_ratio_exprs``) so the six features evaluate them once."""
    c = F.col(text_col)
    df = df.withColumn("_r_ws", words(c))
    ws = F.col("_r_ws")
    n = F.size(ws)
    df = df.withColumn(
        "_r_bi",
        F.zip_with(
            F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    )
    bigrams = F.col("_r_bi")
    n_bi = F.size(bigrams)
    dup_frac = F.when(n > 0, 1.0 - F.size(F.array_distinct(ws)) / n).otherwise(
        F.lit(0.0)
    )
    top_word = F.when(
        n > 0, _max_sorted_run(F.array_sort(ws)) / n
    ).otherwise(F.lit(0.0))
    top_bigram = F.when(
        n_bi > 0, _max_sorted_run(F.array_sort(bigrams)) / n_bi
    ).otherwise(F.lit(0.0))
    max_run = F.when(n > 0, _max_sorted_run(ws)).otherwise(F.lit(0))
    return df.select(
        "*",
        n.alias("r_n_words"),
        F.round(dup_frac, 4).alias("r_dup_word_frac"),
        F.round(top_word, 4).alias("r_top_word_share"),
        F.round(top_bigram, 4).alias("r_top_bigram_share"),
        max_run.cast("int").alias("r_max_run"),
    ).drop("_r_ws", "_r_bi")


def doc_fingerprint(col: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    word set. Robust to whitespace/shuffling mutations; used for fuzzy
    exact-dedup (same bag of words)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(words(col))), " "))


def boilerplate_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: tuple[int, int] = (1, 5),
) -> DataFrame:
    """C4-style boilerplate detection: word ``k``-grams whose document
    frequency reaches ``min_df`` (a rational ``num/den`` of the corpus, so
    the threshold compare is integer-exact — no float-ceil drift between
    engines) are "boilerplate"; emit per-document gram counts and the
    boilerplate ratio for downstream filtering.

    Plan shape (the 100 TB path): shingling is map-side — each pass
    builds the per-doc distinct gram array in one codegen projection, so
    the (doc, gram) stream needs no within-doc dedup shuffle.  One
    shuffle computes document frequency with map-side partial
    aggregation; the boilerplate set is tiny by construction (few
    n-grams can clear a 20% document-frequency bar) and BROADCASTS back
    onto the gram stream; the per-doc rollup is the second and last
    shuffle.  The corpus size joins in as a broadcast 1-row aggregate,
    never a driver-side collect.

    The corpus IS scanned and shingled twice (once under the document-
    frequency aggregate, once under the per-doc rollup) — deliberate:
    the only single-pass alternatives are caching the exploded gram
    stream (larger than the corpus itself) or a count-over-window on
    the full stream (shuffles every gram row instead of the map-side-
    combined distinct-gram counts), both strictly worse at scale than
    a second columnar scan of one string column.
    """
    from nomenklatura_spark.dedup.ngram import shingle_arrays, widen_small_scan

    num, den = min_df
    # explode_outer keeps sub-k-word documents as a single null-gram row,
    # so no corpus-sized join-back is needed to preserve them: null keys
    # never match the boiler equi-join and count(sh) skips them
    grams = shingle_arrays(
        widen_small_scan(df), id_col, text_col, k=k, mode="word"
    ).select("id", F.explode_outer("shingles").alias("sh"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n_docs"))
    dfreq = (
        grams.where(F.col("sh").isNotNull())
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("gram_df"))
    )
    boiler = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .where(F.col("gram_df") * den >= F.col("_n_docs") * num)
        .select("sh", F.lit(1).alias("_boiler"))
    )
    per_doc = (
        grams.join(F.broadcast(boiler), "sh", "left")
        .groupBy("id")
        .agg(
            F.count(F.col("sh")).alias("n_grams"),
            F.count(F.col("_boiler")).alias("n_boilerplate"),
        )
    )
    ratio = F.when(
        F.col("n_grams") > 0, F.col("n_boilerplate") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_grams",
        "n_boilerplate",
        F.round(ratio, 6).alias("boilerplate_ratio"),
    )


def source_cap(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 10,
) -> DataFrame:
    """RefinedWeb-style per-source document cap: keep at most ``cap``
    documents per source, chosen by a deterministic content-hash order
    (md5 over a salted id — the ``doc_sample_mix`` device), so the kept
    set is reproducible under any partitioning or retry and never
    correlates with ingest order.

    Plan shape (100 TB): the rank predicate is applied WITH the window,
    so Spark's WindowGroupLimit pushes a partial per-source top-``cap``
    BELOW the shuffle (plan-asserted) — each map task forwards at most
    ``cap`` rows per source it sees, and the single key shuffle carries
    O(sources × cap × tasks) rows, not the corpus.  A pathological
    single-source corpus degrades to cap×tasks rows on one reducer,
    which is still bounded by the cap, not the data."""
    from pyspark.sql.window import Window

    order = F.md5(
        F.concat(F.lit("cap:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col))
    return (
        df.select(id_col, group_col)
        .withColumn("src_rank", F.row_number().over(w))
        .where(F.col("src_rank") <= cap)
    )


def stratified_split(
    df: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic stratified train/val/test assignment with EXACT
    per-stratum proportions — the split a training pipeline materializes
    once and must be able to reproduce forever.

    Docs are ordered within each stratum by a salted content hash (the
    ``doc_sample_mix``/``source_cap`` md5 device — reproducible under any
    partitioning, uncorrelated with ingest order) and cut at integer
    rank boundaries ``(n·train_pct)//100`` / ``(n·(train_pct+val_pct))//100``,
    so counts are exact, not expected values (a plain hash-mod split
    drifts by O(√n) per stratum and can starve small strata).

    Plan shape: one key shuffle on the stratum + two window functions
    over it (rank + stratum size) — no joins, no second pass.  Skewed
    strata (one dominant language) are real at 100 TB: the rank must see
    the whole stratum, so this op intentionally trades one full-stratum
    sort for exactness; use a hash-mod split when approximate
    proportions suffice.
    """
    from pyspark.sql.window import Window

    order = F.md5(F.concat(F.lit("split:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(order, F.col(id_col))
    ws = Window.partitionBy(strata_col)
    ranked = df.select(
        id_col,
        strata_col,
        (F.row_number().over(w) - 1).cast("long").alias("_r"),
        F.count(F.lit(1)).over(ws).alias("_n"),
    )
    # integer boundaries (DIV, not float division): exact at any stratum size
    return ranked.select(
        id_col,
        strata_col,
        F.when(
            F.col("_r") < F.expr(f"(_n * {train_pct}) DIV 100"), F.lit("train")
        )
        .when(
            F.col("_r") < F.expr(f"(_n * {train_pct + val_pct}) DIV 100"),
            F.lit("val"),
        )
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality proxy: per document, the mean
    negative log-probability of its tokens under the corpus's own
    unigram model (high = surprising/rare vocabulary, low = typical).
    The real CCNet uses a KenLM 5-gram; the unigram variant keeps the
    exact same pipeline shape (train stats on the corpus, score every
    doc) while staying SQL-oracle-checkable.

    Plan shape (100 TB): one partially-aggregated shuffle builds the
    unigram table (vocabulary-sized — Heaps' law), which BROADCASTS
    back onto the token stream together with the 1-row total; the
    per-doc mean is the only corpus-sized shuffle."""
    from nomenklatura_spark.dedup.ngram import (
        normalize_for_shingles,
        widen_small_scan,
    )

    ws = F.filter(
        F.split(normalize_for_shingles(F.col(text_col)), " "),
        lambda w: w != "",
    )
    tok = widen_small_scan(df).select(
        F.col(id_col).alias("id"), F.explode(ws).alias("word")
    )
    vocab = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = tok.select(F.count(F.lit(1)).alias("_total"))
    scored = (
        tok.join(F.broadcast(vocab), "word")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("c") / F.col("_total"))), 6
            ).alias("avg_neg_logprob"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col), "n_tokens", "avg_neg_logprob"
    )


def budget_select(
    df: DataFrame,
    budget_tokens: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """Quality-ranked selection under a per-stratum token budget — the
    final assembly step of a data-selection pipeline: fill each
    language's token budget with its highest-quality documents
    (score = stopword density, the classic fluency proxy; swap in the
    trained classifier's probability upstream for the production form).

    Docs are ranked within each stratum by the ROUNDED score
    (round-before-rank float discipline; ties by id), a running token
    sum gates admission at ``budget_tokens``, and only admitted rows
    return: ``(id, stratum, n_tokens, score, cum_tokens)``.

    Plan shape: one stratum shuffle + one running-sum window — the
    ``doc_pack`` budgeting device pointed at selection instead of shard
    assignment.  The full-stratum sort is inherent to exact greedy
    selection; at 100 TB pre-filter with a score floor so the sort sees
    candidates, not the corpus.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(strata_col).alias("stratum"),
        words(F.col(text_col)).alias("_ws"),
    )
    feats = base.select(
        "id",
        "stratum",
        F.size("_ws").alias("n_tokens"),
        F.round(
            F.when(
                F.size("_ws") > 0,
                F.size(
                    F.filter(F.col("_ws"), lambda w: w.isin(*LANG_MARKERS["en"]))
                )
                / F.size("_ws"),
            ).otherwise(F.lit(0.0)),
            decimals,
        ).alias("score"),
    )
    w = Window.partitionBy("stratum").orderBy(
        F.col("score").desc(), F.col("id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        feats.withColumn(
            "cum_tokens", F.sum("n_tokens").over(w).cast("long")
        )
        .where(F.col("cum_tokens") <= budget_tokens)
    )


def unigram_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    decimals: int = 9,
) -> DataFrame:
    """Corpus drift monitor: per-word probability shift between two
    corpus snapshots (crawl N vs crawl N+1, pre- vs post-filter) under
    Laplace-smoothed unigram models on the union vocabulary.

    Returns ``(word, c_old, c_new, p_old, p_new, delta, kl_term)`` where
    ``delta = p_new − p_old`` and ``kl_term = p_new·ln(p_new/p_old)`` is
    the word's contribution to KL(new ‖ old) — the standard distribution
    -shift alarm a training pipeline runs between snapshots, with the
    per-word table telling you *what* drifted, not just how much.

    Plan shape (100 TB): each snapshot contributes one partial-agg token
    shuffle; everything downstream (full-outer vocabulary join, totals)
    is vocabulary-sized (Heaps' law), with the 1-row totals broadcast
    back.  Smoothing (+1 on the union vocabulary) keeps every log/ratio
    finite, so no word needs special-casing in either engine.
    """
    from nomenklatura_spark.dedup.ngram import (
        normalize_for_shingles,
        widen_small_scan,
    )

    def _counts(df: DataFrame) -> DataFrame:
        ws = F.filter(
            F.split(normalize_for_shingles(F.col(text_col)), " "),
            lambda w: w != "",
        )
        return (
            widen_small_scan(df)
            .select(F.explode(ws).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("count"))
        )

    return unigram_drift_from_counts(_counts(old), _counts(new), decimals)


def unigram_drift_from_counts(
    old_counts: DataFrame,
    new_counts: DataFrame,
    decimals: int = 9,
) -> DataFrame:
    """The drift algebra over two (word, count) relations — the core of
    ``unigram_drift``, exposed so STORED vocabulary snapshots answer
    "what changed since version v" by reading two index versions
    (``streaming/vocab_index.py``), never rescanning either corpus:
    the monitoring twin of the retrieval/ANN/sketch/funnel at-rest
    serving paths.  Everything here is vocabulary-sized."""
    co = (
        old_counts.select("word", F.col("count").alias("c_old"))
        .join(
            new_counts.select("word", F.col("count").alias("c_new")),
            "word",
            "full_outer",
        )
        .select(
            "word",
            F.coalesce("c_old", F.lit(0)).alias("c_old"),
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
        )
    )
    totals = co.agg(
        F.sum("c_old").alias("_t_old"),
        F.sum("c_new").alias("_t_new"),
        F.count(F.lit(1)).alias("_v"),
    )
    p_old = (F.col("c_old") + 1) / (F.col("_t_old") + F.col("_v"))
    p_new = (F.col("c_new") + 1) / (F.col("_t_new") + F.col("_v"))
    return co.crossJoin(F.broadcast(totals)).select(
        "word",
        "c_old",
        "c_new",
        F.round(p_old, decimals).alias("p_old"),
        F.round(p_new, decimals).alias("p_new"),
        F.round(p_new - p_old, decimals).alias("delta"),
        F.round(p_new * F.log(p_new / p_old), decimals).alias("kl_term"),
    )


def corpus_vocab(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = 1000,
) -> DataFrame:
    """Corpus vocabulary rollup for tokenizer training / frequency
    filtering: per word, total occurrences and document frequency, top
    ``top_k`` by count (``None`` = the full unordered vocabulary, for
    incremental maintenance).  Two-level aggregation — (doc, word)
    counts first, then the word rollup — so BOTH shuffles get map-side
    partial aggregation and no countDistinct expand is needed; the
    second shuffle carries one row per (doc, distinct word), not per
    token.  The final top-k is a TakeOrdered, not a global sort."""
    from nomenklatura_spark.dedup.ngram import (
        normalize_for_shingles,
        widen_small_scan,
    )

    ws = F.filter(
        F.split(normalize_for_shingles(F.col(text_col)), " "),
        lambda w: w != "",
    )
    per_doc = (
        widen_small_scan(df)
        .select(F.col(id_col).alias("id"), F.explode(ws).alias("word"))
        .groupBy("id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = per_doc.groupBy("word").agg(
        F.sum("n").alias("count"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    if top_k is None:
        return agg
    return agg.orderBy(
        F.col("count").desc(), F.col("word")
    ).limit(top_k)


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    lid: str = "lid",
    rid: str = "rid",
    train_permille: int = 900,
    val_permille: int = 950,
) -> DataFrame:
    """Near-dup-aware train/val/test split: an entire near-duplicate
    FAMILY lands on one side, so no eval document has a training-set
    near-copy (the leakage a per-document random or stratified split
    cannot prevent — ``stratified_split`` keys on doc identity, and a
    near-dup pair straddling the train/test boundary is contamination
    by construction).

    Family = connected component of the near-dup pair graph
    (``resolver/components.py`` star contraction; singletons are their
    own family); split = md5 bucket of the FAMILY representative, so
    membership is reproducible under any partitioning and any corpus
    growth that doesn't change the family.  Proportions are
    approximate (hash-bucket, weighted by family size) — exact cuts
    are impossible once documents must move in groups; at corpus scale
    the deviation is the usual multinomial noise.

    Returns (id, family, split).  Scale shape: the family mapping is
    ``dedup/survivors.select_survivors``'s own (doc, canonical) relation
    — the dedup tier's checkpointed star contraction plus its
    deliberately-unhinted verdict join (rationale documented there);
    everything after is a map-side hash projection.
    """
    from nomenklatura_spark.dedup.survivors import select_survivors
    from nomenklatura_spark.functions.hashing import md5_bucket

    fam = select_survivors(docs, dup_pairs, id_col=id_col, lid=lid, rid=rid)
    bucket = md5_bucket("famsplit", F.col("canonical_doc"), 1000)
    return fam.select(
        F.col(id_col),
        F.col("canonical_doc").alias("family"),
        F.when(bucket < train_permille, F.lit("train"))
        .when(bucket < val_permille, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def priority_sample(
    df: DataFrame,
    weight_col: Column,
    k: int,
    id_col: str = "doc_id",
    salt: str = "psample",
    strata_col: str | None = None,
) -> DataFrame:
    """Exactly-k weight-proportional sample via priority sampling
    (Duffield, Lund & Thorup, JACM 2007): each item gets priority
    ``q_i = w_i / u_i`` with ``u_i`` uniform on (0, 1]; the k largest
    priorities are the sample.  Unlike the permille-bucket sampler
    (``doc_sample_mix``) the output size is EXACT, and unlike a quality
    cutoff (``budget_select``) low-weight items retain proportional
    inclusion odds — the shape a training-mix stage wants when a corpus
    must shrink to a fixed row budget without hard-censoring any slice.

    Engine-stable determinism: ``u_i = (h_i + 1) / 16^15`` with ``h_i``
    the 60-bit md5 integer of ``salt:id`` (functions/hashing.py), so
    ranking by q descending equals ranking by the BIGINT floor quotient
    ``(h_i + 1) DIV w_i`` ascending.  The floor quantizes u at 2^-60 —
    ties broken by id, a distortion both engines replay identically —
    so the DuckDB oracle reproduces the selection bit-for-bit; float
    ``ln``/``pow`` keys (the usual Efraimidis-Spirakis formulation)
    would hinge the k-th boundary on libm ulp agreement.

    Scale shape: weights are map-side expressions and the winner cut is
    ``orderBy(key).limit(k)``, which compiles to TakeOrderedAndProject —
    every task keeps its local top-k and the driver merges tasks x k
    rows; the corpus is never shuffled.  Weights clamp to >= 1 (a
    zero-weight row would divide by zero; keeping it at the floor weight
    matches the reference semantics of "never unsampleable").

    With ``strata_col`` the cut is exactly-k PER STRATUM: the rank
    predicate rides the window so WindowGroupLimit bounds what each map
    task ships to k rows per stratum it sees (the ``source_cap``
    discipline) — the single key shuffle carries O(strata x k x tasks)
    rows, never the corpus.
    """
    from nomenklatura_spark.functions.hashing import md5_bucket

    w = F.greatest(weight_col.cast("bigint"), F.lit(1))
    # md5_bucket with mod 16^15 is the raw 60-bit integer (pmod no-op).
    h = md5_bucket(salt, F.col(id_col), 16**15)
    key = F.expr("(_ps_h + 1) DIV _ps_w")
    keyed = (
        df.withColumn("_ps_w", w)
        .withColumn("_ps_h", h)
        .withColumn("_ps_key", key)
    )
    if strata_col is None:
        cut = keyed.orderBy("_ps_key", id_col).limit(k)
    else:
        from pyspark.sql.window import Window

        win = Window.partitionBy(strata_col).orderBy("_ps_key", id_col)
        cut = keyed.withColumn("_ps_rk", F.row_number().over(win)).where(
            F.col("_ps_rk") <= k
        ).drop("_ps_rk")
    return (
        cut.drop("_ps_h")
        .withColumnRenamed("_ps_w", "weight")
        .withColumnRenamed("_ps_key", "priority_key")
    )


def bigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
) -> DataFrame:
    """Bigram LM quality score with Jelinek-Mercer interpolation: per
    document, the mean surprisal of each token given its predecessor
    under the corpus's own bigram model,

        p(w | v) = lam * c(v,w)/c(v·) + (1-lam) * c(w)/total ,

    the next rung of the CCNet ladder above ``unigram_logprob_scores``
    (context catches "the the"-style degeneracy and boilerplate n-grams
    that unigram frequency scores as perfectly normal).  A ``<s>``
    sentinel prepends every doc, so position 1 scores p(w1 | <s>) and a
    1-token doc still has one scored transition.

    Bigrams are built MAP-SIDE by zipping the token array against its
    shifted self (no lag window — a per-doc window would shuffle the
    corpus before any aggregation).  The context normalizer c(v·) sums
    bigram counts per context, so each conditional distribution sums to
    exactly 1 and the interpolation stays a proper probability.

    Plan shape (100 TB): two partial-agg shuffles build the bigram and
    unigram tables (vocabulary- and bigram-vocabulary-sized), both
    BROADCAST back onto the exploded transition stream; the per-doc mean
    is the only corpus-sized shuffle — the same silhouette as the
    unigram scorer, one broadcast wider.
    """
    from nomenklatura_spark.dedup.ngram import (
        normalize_for_shingles,
        widen_small_scan,
    )

    ws = F.filter(
        F.split(normalize_for_shingles(F.col(text_col)), " "),
        lambda w: w != "",
    )
    base = widen_small_scan(df).select(
        F.col(id_col).alias("id"), ws.alias("_ws")
    )
    prev = F.concat(
        F.array(F.lit("<s>")),
        F.slice(
            F.col("_ws"), 1, F.greatest(F.size("_ws") - 1, F.lit(0))
        ),
    )
    pairs = base.where(F.size("_ws") > 0).select(
        "id",
        F.explode(
            F.zip_with(prev, F.col("_ws"), lambda v, w: F.struct(v.alias("v"), w.alias("w")))
        ).alias("bg"),
    ).select("id", F.col("bg.v").alias("v"), F.col("bg.w").alias("w"))
    bigrams = pairs.groupBy("v", "w").agg(F.count(F.lit(1)).alias("cb"))
    ctx = pairs.groupBy("v").agg(F.count(F.lit(1)).alias("cv"))
    uni = pairs.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    total = pairs.select(F.count(F.lit(1)).alias("_total"))
    p = F.lit(lam) * F.col("cb") / F.col("cv") + (
        F.lit(1.0 - lam) * F.col("cu") / F.col("_total")
    )
    scored = (
        pairs.join(F.broadcast(bigrams), ["v", "w"])
        .join(F.broadcast(ctx), "v")
        .join(F.broadcast(uni), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(p)), 6).alias("avg_neg_logprob_bi"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col), "n_tokens", "avg_neg_logprob_bi"
    )


def doc_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Per-document TF-IDF keywords: each document's ``top_k`` terms by
    ``tf * ln(1 + N / df)`` — the per-DOCUMENT sibling of
    ``textops/domains.cluster_keywords`` (that one labels discovered
    clusters; this one tags every document), the metadata column a
    curated corpus ships for search facets, routing rules, and cheap
    topical filters.

    Determinism follows the c-TF-IDF device: the score is rounded to
    6dp BEFORE the rank so the top-k cut cannot flip on float noise,
    ties break by word ascending.

    Scale shape: one token explode + (doc, word) partial-agg shuffle
    (checkpointed — both the document-frequency aggregate and the score
    join consume it), one word-keyed partial agg for df, the corpus
    size N as a broadcast one-row relation, and a
    WindowGroupLimit-bounded top-k per document.  Nothing exceeds the
    (doc x distinct-words) grain.

    Returns (doc_id, rank, word, tf, score).
    """
    from pyspark.sql.window import Window

    tok = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode_outer(words(F.col(text_col))).alias("w"),
        )
        .where(F.col("w").isNotNull())
    )
    tf = (
        tok.groupBy("id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = F.broadcast(tf.agg(F.count_distinct("id").alias("_n")))
    scored = (
        tf.join(df_, "w")
        .crossJoin(n_docs)
        .select(
            "id",
            "w",
            "tf",
            F.round(
                F.col("tf") * F.log(F.lit(1.0) + F.col("_n") / F.col("_df")),
                6,
            ).alias("score"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("id").orderBy(F.col("score").desc(), "w")
    )
    return (
        scored.withColumn("rank", rk)
        .where(F.col("rank") <= top_k)
        .select(
            F.col("id").alias(id_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("w").alias("word"),
            F.col("tf").cast("long").alias("tf"),
            "score",
        )
    )
