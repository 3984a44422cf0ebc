"""Distributed BPE tokenizer training (training-data tier).

Classic byte-pair encoding trains on the WORD-FREQUENCY table, not the
raw corpus (Sennrich et al. 2016): every merge decision needs only
(word, count).  That splits cleanly across Spark's execution model:

- the corpus-scale part — counting words — is one partially-aggregated
  shuffle (``textops.analysis.corpus_vocab``), whose output is
  vocabulary-bounded (Heaps' law: sub-linear in the corpus);
- the vocab-scale part — the merge loop — runs driver-local over that
  bounded table, like fitted model coefficients elsewhere in this
  engine (``matching/train.py``); nothing corpus-sized is collected.

"Vocabulary-bounded" is an EXECUTABLE contract, not an assumption: a
web-scale corpus at ``min_count=1`` has a noise vocabulary (typos,
hashes, boilerplate tokens) in the 1e8–1e9 range, which would OOM the
driver and make the pure-Python merge loop (O(n_merges × vocab) per
merge) the pipeline bottleneck.  ``train_bpe`` therefore counts the
post-filter vocabulary BEFORE collecting and raises a loud ValueError
above ``max_vocab`` (default 1e6 — ~100 MB of driver state and a
merge loop in seconds), telling the caller to raise ``min_count`` or
pass ``top_k``; ``top_k`` trains on the k most frequent words via a
TakeOrdered, so its collect is bounded by construction (same pattern
as ``operators/sketch.hll_pairwise_union``'s 4096-key guard and the
funnel index's orphan cap).

Applying a learned merge table is a per-document kernel
(``bpe_token_counts`` — Arrow-batched pandas UDF over the documents),
used for token budgeting with the learned vocabulary instead of the
regex estimate in ``textops.analysis.bpe_ish_token_count``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def train_bpe(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 100,
    min_count: int = 1,
    top_k: int | None = None,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns the
    ranked merge list.  Ties on pair frequency break lexicographically
    so training is deterministic across partitionings.

    Driver-side scale contract: the collected word table is the
    post-``min_count`` vocabulary.  With ``top_k`` set, only the k most
    frequent words are collected (count-desc, word-asc tie-break — a
    deterministic TakeOrdered, bounded by construction).  With
    ``top_k=None`` the vocabulary is counted first and a vocabulary
    above ``max_vocab`` raises instead of collecting — raise
    ``min_count`` (noise vocabularies are count-1-heavy) or pass
    ``top_k``.  Merges learned from a top-k table are identical to the
    unbounded ones whenever k covers the true vocabulary (pytest-pinned
    in tests/test_bpe.py)."""
    from nomenklatura_spark.textops.analysis import corpus_vocab

    vocab_df = (
        corpus_vocab(docs, text_col, id_col, top_k=None)
        .where(F.col("count") >= min_count)
        .select("word", "count")
    )
    if top_k is not None:
        vocab_df = vocab_df.orderBy(
            F.col("count").desc(), F.col("word")
        ).limit(int(top_k))
    else:
        n_words = vocab_df.count()
        if n_words > max_vocab:
            raise ValueError(
                f"train_bpe: post-min_count vocabulary has {n_words} words, "
                f"above the max_vocab={max_vocab} driver-side bound "
                f"(the merge loop is O(n_merges x vocab) on the driver); "
                f"raise min_count (currently {min_count}) or pass top_k "
                f"to train on the most frequent words only"
            )
    rows = vocab_df.collect()
    # symbol sequences with an explicit end-of-word marker
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + ("</w>",): int(r["count"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        best_count = top
        if best_count < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def _merge_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """BPE token strings for one word under the learned merges: greedy
    lowest-rank-first with leftmost tie-break — equivalent to applying
    the merge list in rank order, each merge exhaustively left-to-right
    (the two formulations coincide whenever every merge's constituents
    are producible only by earlier merges, which training guarantees;
    the DuckDB oracle replays the rank-order form)."""
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE tokens for one word under the learned merges."""
    return len(_merge_word(word, ranks))


def bpe_token_counter(merges: list[tuple[str, str]]):
    """Column function: token count per document under the learned
    merges — an Arrow-batched pandas UDF; the merge table rides the
    closure (broadcast once per executor, vocabulary-sized)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(T.IntegerType())
    def _count(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(0)
                continue
            # same normalization as corpus_vocab / the training word counts
            words = [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]
            out.append(sum(_encode_word(w, ranks) for w in words))
        return pd.Series(out, dtype="int32")

    return _count


#: Deterministic token-id space shared with the SQL oracle replay: the
#: normalization closes the alphabet over [a-z0-9], so base ids are
#: fixed, '</w>' is 36, and merge r's output token gets 37 + r (first
#: rank wins if two merges ever produce the same string).
_BASE_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"
_EOW = "</w>"


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """token string -> id under the fixed id scheme above."""
    vocab = {c: i for i, c in enumerate(_BASE_ALPHABET)}
    vocab[_EOW] = len(_BASE_ALPHABET)
    for r, (a, b) in enumerate(merges):
        vocab.setdefault(a + b, len(_BASE_ALPHABET) + 1 + r)
    return vocab


def bpe_encoder(merges: list[tuple[str, str]]):
    """Column function: token-id sequence per document (array<int>) —
    the tokenizer-APPLY kernel, same Arrow-batched shape as the
    counter; the merge table and vocab ride the closure (broadcast once
    per executor, vocabulary-sized)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    vocab = bpe_vocab(merges)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _enc(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            words = [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]
            ids: list[int] = []
            for w in words:
                ids.extend(vocab[s] for s in _merge_word(w, ranks))
            out.append(ids)
        return pd.Series(out)

    return _enc


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, token_ids array<int>) per document — the projection a
    packing/training pipeline consumes (``doc_pack``'s unit switches
    from estimated counts to real ids via ``size(token_ids)``)."""
    enc = bpe_encoder(merges)
    return docs.select(
        id_col, enc(F.col(text_col)).alias("token_ids")
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bpe_tokens) per document under the learned merge table."""
    counter = bpe_token_counter(merges)
    return docs.select(
        id_col, counter(F.col(text_col)).alias("n_bpe_tokens")
    )
