"""Distributed BPE training (textops/bpe.py): the merge loop must match
hand-derivable textbook behavior on the classic Sennrich-style corpus,
and applying the learned table must compress token counts
monotonically."""

from __future__ import annotations

from nomenklatura_spark.textops.bpe import (
    _encode_word,
    bpe_encode,
    bpe_token_counts,
    bpe_vocab,
    train_bpe,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_textbook_merges(spark):
    # word counts: low x5, lower x2, newest x6, widest x3 (the classic
    # example). First merges must fuse the most frequent adjacent pair.
    docs = _docs(
        spark,
        [" ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)],
    )
    merges = train_bpe(docs, n_merges=4)
    # "es" occurs in newest(6) + widest(3) = 9 — the top pair; then
    # "es"+"t" = 9, then "est"+"</w>" = 9, then lo (7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def test_encode_word_uses_merge_ranks(spark):
    merges = [("e", "s"), ("es", "t"), ("est", "</w>")]
    ranks = {p: i for i, p in enumerate(merges)}
    # newest -> n e w est</w> = 4 tokens
    assert _encode_word("newest", ranks) == 4
    # no applicable merge: each char + </w>
    assert _encode_word("low", ranks) == 4


def test_token_counts_shrink_with_more_merges(spark):
    corpus = ["the cat sat on the mat", "the bat and the rat sat"] * 3
    docs = _docs(spark, corpus)
    none = bpe_token_counts(docs, []).collect()
    some = bpe_token_counts(docs, train_bpe(docs, n_merges=20)).collect()
    total_none = sum(r.n_bpe_tokens for r in none)
    total_some = sum(r.n_bpe_tokens for r in some)
    assert total_some < total_none
    # with zero merges every word costs len(word)+1 symbols
    first = corpus[0]
    n_chars = sum(len(w) + 1 for w in first.split())
    assert none[0].n_bpe_tokens == n_chars


def test_vocab_above_max_vocab_raises(spark):
    """The driver-side scale contract: a post-min_count vocabulary
    larger than max_vocab must raise loudly BEFORE collecting, naming
    both escape hatches (raise min_count / pass top_k)."""
    import pytest

    docs = _docs(spark, ["alpha beta gamma delta epsilon zeta"])
    with pytest.raises(ValueError, match="min_count|top_k"):
        train_bpe(docs, n_merges=2, max_vocab=3)
    # raising min_count past every word's count shrinks the vocab
    # under the bound — the contract's first escape hatch works
    assert train_bpe(docs, n_merges=2, max_vocab=3, min_count=2) == []


def test_top_k_covering_vocab_matches_unbounded(spark):
    """Bounded training (top_k >= true vocabulary) must yield the exact
    merge list of the unbounded form, and top_k skips the vocab-count
    job so it never trips max_vocab."""
    docs = _docs(
        spark,
        [" ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)],
    )
    unbounded = train_bpe(docs, n_merges=4)
    bounded = train_bpe(docs, n_merges=4, top_k=10, max_vocab=1)
    assert bounded == unbounded
    # top_k below the vocabulary still trains, on the frequent head only
    head_only = train_bpe(docs, n_merges=4, top_k=1)
    assert head_only[0] == ("e", "s")


def test_determinism_across_runs(spark):
    docs = _docs(spark, ["aa ab ba bb ab aa", "ba aa bb ab"])
    m1 = train_bpe(docs, n_merges=5)
    m2 = train_bpe(docs, n_merges=5)
    assert m1 == m2


def test_encode_ids_agree_with_counter_and_vocab(spark):
    """encode-to-ids is the counter's sibling kernel: size(token_ids)
    must equal n_bpe_tokens under TRAINED merges, ids must decode back
    through the vocab to the greedy token strings, and empty/None text
    encodes to an empty sequence."""
    from pyspark.sql import functions as F

    corpus = ["the cat sat on the mat", "the bat and the rat sat", ""] * 2
    docs = _docs(spark, corpus)
    merges = train_bpe(docs, n_merges=12)
    joined = (
        bpe_encode(docs, merges)
        .join(bpe_token_counts(docs, merges), "doc_id")
        .select("doc_id", F.size("token_ids").alias("n"), "n_bpe_tokens")
        .collect()
    )
    assert all(r.n == r.n_bpe_tokens for r in joined)
    # decode roundtrip on one document
    vocab = bpe_vocab(merges)
    rev = {}
    for t, i in vocab.items():
        rev.setdefault(i, t)
    row = bpe_encode(docs, merges).where("doc_id = 0").collect()[0]
    text = "".join(rev[i] for i in row.token_ids).replace("</w>", " ")
    assert text.strip() == corpus[0]
    empty = bpe_encode(docs, merges).where("doc_id = 2").collect()[0]
    assert empty.token_ids == []
