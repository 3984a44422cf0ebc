"""BM25 retrieval (`textops/retrieval.py`): ranking behavior on crafted
corpora plus the plan-shape claims the module docstring makes."""

from __future__ import annotations

from pyspark.sql import functions as F

from nomenklatura_spark.textops.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_ranks_term_dense_docs_first(spark):
    corpus = _docs(
        spark,
        [
            (1, "spark shuffle join"),
            (2, "spark spark spark shuffle"),
            (3, "gardening tips for spring bulbs"),
            (4, "spark"),
            (5, "the catalyst optimizer and the shuffle service of spark"),
        ],
    )
    q = _docs(spark, [(100, "spark shuffle")])
    out = bm25_topk(corpus, q, query_id_col="doc_id", k=5).collect()
    assert [r["doc_id"] for r in out if r["query_id"] == 100][0] in (1, 2)
    ranked = {r["doc_id"]: r["rank"] for r in out}
    # doc 3 shares no term and must be absent entirely
    assert 3 not in ranked
    # both-term docs (1, 2, 5) outrank the one-term doc 4 on idf mass
    assert max(ranked[1], ranked[2], ranked[5]) < ranked[4]


def test_bm25_idf_favors_rare_terms(spark):
    # "zebra" appears once, "common" in every doc: the zebra doc must
    # win a query containing both despite equal tf
    rows = [(i, "common filler words here") for i in range(1, 9)]
    rows.append((9, "common zebra"))
    corpus = _docs(spark, rows)
    q = _docs(spark, [(100, "common zebra")])
    out = bm25_topk(corpus, q, query_id_col="doc_id", k=3).collect()
    assert out[0]["doc_id"] == 9 and out[0]["rank"] == 1


def test_bm25_exclude_self_and_k_bound(spark):
    rows = [(i, "alpha beta gamma delta") for i in range(1, 7)]
    corpus = _docs(spark, rows)
    q = corpus.limit(2)
    out = bm25_topk(corpus, q, query_id_col="doc_id", k=3, exclude_self=True)
    rows_out = out.collect()
    per_q = {}
    for r in rows_out:
        assert r["doc_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)) and len(ranks) <= 3


def test_source_cap_determinism_and_plan(spark, sf_dir):
    """source_cap keeps at most `cap` docs per source, identically
    across repartitionings, and the rank filter compiles to a partial
    WindowGroupLimit below the shuffle (each map task ships at most
    cap rows per source)."""
    from nomenklatura_spark.textops.analysis import source_cap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    out = source_cap(docs, cap=3)
    rows = {(r["doc_id"], r["source"], r["src_rank"]) for r in out.collect()}
    per_src = {}
    for _, s, rk in rows:
        per_src.setdefault(s, []).append(rk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3
               for v in per_src.values())
    rows2 = {
        (r["doc_id"], r["source"], r["src_rank"])
        for r in source_cap(docs.repartition(7), cap=3).collect()
    }
    assert rows == rows2

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_bm25_indexed_matches_in_memory(spark, sf_dir, tmp_path):
    """The at-rest serving layout returns exactly the in-memory rows,
    and its postings/df scans carry the probed buckets as partition
    filters (only the query terms' posting buckets are read)."""
    from nomenklatura_spark.textops.retrieval import (
        bm25_topk_indexed,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    probes = docs.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id").limit(4)
    path = str(tmp_path / "bm25_index")
    write_bm25_index(docs, path, n_buckets=16)

    mem = bm25_topk(docs, probes, query_id_col="doc_id", k=5, exclude_self=True)
    idx = bm25_topk_indexed(
        spark, path, probes, query_id_col="doc_id", k=5, exclude_self=True
    )
    mrows = sorted((tuple(r) for r in mem.collect()), key=lambda t: (t[0], t[4]))
    irows = sorted((tuple(r) for r in idx.collect()), key=lambda t: (t[0], t[4]))
    assert mrows == irows and len(mrows) > 0

    plan = idx._jdf.queryExecution().executedPlan().toString()
    pf = [
        line for line in plan.splitlines()
        if "PartitionFilters" in line and "wb" in line.split("PartitionFilters")[1][:120]
    ]
    assert len(pf) >= 2, f"postings/df scans not partition-pruned:\n{plan}"


def test_bm25_plan_single_corpus_tokenize(spark, sf_dir):
    """The docstring's 100 TB claims, held against the actual plan: the
    served plan holds exactly ONE parquet scan (the map-only stats
    pass) per adaptive plan copy — the token pass ran once into the tf
    checkpoint, which both the df rollup and the scoring join read back
    as an RDD scan; the probe lineage is a LocalRelation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    probes = docs.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id").limit(4)
    out = bm25_topk(corpus=docs, queries=probes, query_id_col="doc_id", k=5,
                    exclude_self=True)
    out.collect()  # resolve the final adaptive plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1
    assert final.count("Scan ExistingRDD[id") >= 2  # tf read by both branches


def test_rrf_fuse_crafted_runs(spark):
    from nomenklatura_spark.textops.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    sem = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, doc_id long, rank int",
    )
    out = {
        r["doc_id"]: r
        for r in rrf_fuse({"lex": lex, "sem": sem}, k=10).collect()
    }
    # doc 11 appears in both runs: score = 1/62 + 1/61 and wins
    assert out[11]["lex_rank"] == 2 and out[11]["sem_rank"] == 1
    assert out[11]["rank"] == 1
    assert out[11]["rrf"] == round(1 / 62 + 1 / 61, 6)
    # single-run docs carry 0 (not NULL) for the absent rank
    assert out[10]["sem_rank"] == 0
    assert out[10]["rrf"] == round(1 / 61, 6)
    assert out[13]["lex_rank"] == 0
    # fused order: 11 (both) > 10 (lex#1) > 13 (sem#2) > 12 (lex#3)
    assert [out[d]["rank"] for d in (11, 10, 13, 12)] == [1, 2, 3, 4]


def test_rrf_fuse_ties_break_on_id_and_k_cuts(spark):
    from nomenklatura_spark.textops.retrieval import rrf_fuse

    # same rank in the same run -> identical scores -> id ascending
    a = spark.createDataFrame(
        [(1, 20, 1), (1, 5, 1), (1, 7, 2)],
        "query_id long, doc_id long, rank int",
    )
    rows = rrf_fuse({"only": a}, k=2).orderBy("rank").collect()
    assert [(r["doc_id"], r["rank"]) for r in rows] == [(5, 1), (20, 2)]
