"""Semantics of the corpus-level boilerplate pass and the vocabulary
rollup (textops/analysis.{boilerplate_stats,corpus_vocab}) on crafted
corpora; the testdata-scale values are oracle-checked by
tests/test_entry_contract.py (`doc_boilerplate`, `doc_vocab`)."""

from __future__ import annotations

from nomenklatura_spark.textops.analysis import boilerplate_stats, corpus_vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_boilerplate_flags_corpus_frequent_bigrams(spark):
    # "terms apply" appears in 3/4 docs (75%); every other bigram is
    # unique to its doc. At a 50% threshold only that bigram is boiler.
    docs = _docs(
        spark,
        [
            "alpha beta terms apply",
            "gamma delta terms apply",
            "epsilon zeta terms apply",
            "eta theta iota",
        ],
    )
    rows = {
        r.doc_id: r
        for r in boilerplate_stats(docs, k=2, min_df=(1, 2)).collect()
    }
    # doc 0 grams: {alpha beta, beta terms, terms apply} -> 1 of 3 boiler
    assert rows[0].n_grams == 3
    assert rows[0].n_boilerplate == 1
    assert rows[0].boilerplate_ratio == round(1 / 3, 6)
    # doc 3 shares nothing
    assert rows[3].n_boilerplate == 0
    assert rows[3].boilerplate_ratio == 0.0


def test_boilerplate_threshold_is_integer_exact(spark):
    # df == 2 of 4 docs at threshold 2/4: the >= compare must include the
    # boundary (2*4 >= 4*2) with no float-ceil drift
    docs = _docs(
        spark,
        ["shared pair one", "shared pair two", "only here", "also unique"],
    )
    rows = {
        r.doc_id: r
        for r in boilerplate_stats(docs, k=2, min_df=(2, 4)).collect()
    }
    assert rows[0].n_boilerplate == 1  # "shared pair" df=2 == bound
    assert rows[2].n_boilerplate == 0


def test_boilerplate_keeps_sub_k_word_docs(spark):
    # a doc with fewer than k words emits zero grams but still appears
    docs = _docs(spark, ["solo", "alpha beta gamma"])
    rows = {
        r.doc_id: r
        for r in boilerplate_stats(docs, k=2, min_df=(1, 2)).collect()
    }
    assert rows[0].n_grams == 0
    assert rows[0].boilerplate_ratio == 0.0
    assert rows[1].n_grams == 2


def test_boilerplate_grams_are_doc_distinct(spark):
    # repeated bigram inside ONE doc must count once toward df — with a
    # 50% bar over 3 docs, df=1 (despite 3 in-doc occurrences) stays out
    docs = _docs(
        spark,
        ["echo echo echo echo", "unrelated words here", "more filler text"],
    )
    rows = {
        r.doc_id: r
        for r in boilerplate_stats(docs, k=2, min_df=(1, 2)).collect()
    }
    assert rows[0].n_grams == 1  # distinct {"echo echo"}
    assert rows[0].n_boilerplate == 0


def test_vocab_counts_and_df(spark):
    docs = _docs(spark, ["cat cat dog", "dog bird", "Cat!"])
    rows = corpus_vocab(docs, "text", "doc_id", top_k=10).collect()
    by_word = {r.word: r for r in rows}
    # normalization folds case/punct: "Cat!" -> cat
    assert by_word["cat"]["count"] == 3
    assert by_word["cat"].n_docs == 2
    assert by_word["dog"]["count"] == 2
    assert by_word["dog"].n_docs == 2
    assert by_word["bird"]["count"] == 1
    # ordering: count desc, then word asc
    assert [r.word for r in rows] == ["cat", "dog", "bird"]


def test_vocab_top_k_truncates_deterministically(spark):
    docs = _docs(spark, ["a b c d e f"])
    rows = corpus_vocab(docs, "text", "doc_id", top_k=3).collect()
    # all counts tie at 1 -> lexicographic tiebreak picks a, b, c
    assert [r.word for r in rows] == ["a", "b", "c"]


def test_lm_score_ranks_rare_words_as_surprising(spark):
    from math import isclose, log

    from nomenklatura_spark.textops.analysis import unigram_logprob_scores

    # "common" appears 6x, each rare word once -> doc 1 (all common) must
    # score lower surprisal than doc 2 (all rare)
    docs = _docs(
        spark,
        ["common common common", "rare exotic singular", "common common common"],
    )
    rows = {r.doc_id: r for r in unigram_logprob_scores(docs).collect()}
    assert rows[0].n_tokens == 3
    assert rows[0].avg_neg_logprob < rows[1].avg_neg_logprob
    # exact value: p(common) = 6/9 -> -ln(2/3)
    assert isclose(rows[0].avg_neg_logprob, round(-log(6 / 9), 6), abs_tol=1e-6)
    assert isclose(rows[1].avg_neg_logprob, round(-log(1 / 9), 6), abs_tol=1e-6)


def test_doc_keywords_crafted(spark):
    """Per-doc TF-IDF: a term unique to one doc outranks a ubiquitous
    one; round-before-rank breaks ties by word; top_k bounds rows."""
    from nomenklatura_spark.textops.analysis import doc_keywords

    docs = spark.createDataFrame(
        [
            (1, "zebra zebra common common common"),
            (2, "common common apple"),
            (3, "common banana banana"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["rank"]): (r["word"], r["tf"])
        for r in doc_keywords(docs, top_k=2).collect()
    }
    # 'common' appears in all 3 docs (idf ln(2)); rare words win
    assert got[(1, 1)] == ("zebra", 2)
    assert got[(2, 1)] == ("apple", 1)
    assert got[(3, 1)] == ("banana", 2)
    # rank 2 falls to the ubiquitous term; exactly top_k rows per doc
    assert got[(1, 2)][0] == "common"
    assert len(got) == 6
