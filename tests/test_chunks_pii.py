"""Chunking + PII scrubbing behavior (textops/chunks.py) on crafted
inputs — the driver corpus carries no real PII, so redaction semantics
are pinned here."""

from __future__ import annotations

from pyspark.sql import functions as F

from nomenklatura_spark.textops.chunks import chunk_documents, pii_features


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunking_tail_coverage(spark):
    # 100 words, window 64, stride 48 → starts 0 and 48; the tail chunk
    # carries the remaining 52 words and every word is covered
    text = " ".join(f"w{i}" for i in range(100))
    out = chunk_documents(_docs(spark, [(1, text)])).collect()
    assert [(r.chunk_idx, r.n_words) for r in out] == [(0, 64), (1, 52)]
    covered = set()
    for r in out:
        covered |= set(r.chunk_text.split())
    assert covered == {f"w{i}" for i in range(100)}


def test_chunking_short_doc_single_chunk(spark):
    out = chunk_documents(_docs(spark, [(1, "a b c")])).collect()
    assert len(out) == 1
    assert out[0].chunk_idx == 0 and out[0].n_words == 3


def test_chunking_exact_window(spark):
    text = " ".join(f"w{i}" for i in range(64))
    out = chunk_documents(_docs(spark, [(1, text)])).collect()
    assert [(r.chunk_idx, r.n_words) for r in out] == [(0, 64)]


def test_chunk_overlap(spark):
    text = " ".join(f"w{i}" for i in range(113))
    out = chunk_documents(_docs(spark, [(1, text)])).collect()
    # starts 0, 48, 96 → the 48-overlap region appears in two chunks
    assert [r.chunk_idx for r in out] == [0, 1, 2]
    assert "w50" in out[0].chunk_text and "w50" in out[1].chunk_text


def test_pii_counts_and_scrub(spark):
    rows = [
        (1, "contact john.doe+x@example.com or admin@host.org today"),
        (2, "server at 192.168.001.1 port"),
        (3, "call +1 (555) 123-4567 now"),
        (4, "clean text with no identifiers"),
    ]
    out = {r.doc_id: r for r in pii_features(_docs(spark, rows)).collect()}
    assert out[1].n_email == 2 and out[1].n_ipv4 == 0
    assert out[2].n_ipv4 == 1
    assert out[3].n_phone == 1
    assert out[4].n_email == out[4].n_ipv4 == out[4].n_phone == 0
    # scrubbing changes the hash only when something was redacted
    base = {
        r.doc_id: r.h
        for r in _docs(spark, rows).select(
            "doc_id", F.md5("text").alias("h")
        ).collect()
    }
    assert out[4].scrubbed_hash == base[4]
    assert out[1].scrubbed_hash != base[1]
