"""Composed curation verdict (plans/curate.py): per-stage flags on a
crafted corpus where each document violates exactly one dimension; the
corpus-level composition is oracle-checked by tests/test_entry_contract.py
(`corpus_curate`)."""

from __future__ import annotations

from nomenklatura_spark.plans.curate import curate_verdicts, curation_audit


def test_each_stage_flags_its_own_offender(spark):
    rows = [
        # 0: clean
        (0, "alpha beta gamma delta epsilon zeta"),
        # 1: exact duplicate of 0 (same word bag, shuffled) -> loses on min-id
        (1, "zeta epsilon delta gamma beta alpha"),
        # 2: quality offender (too few words)
        (2, "tiny text"),
        # 3: clean
        (3, "completely different words in this one here"),
        # 4: boilerplate offender is exercised at corpus scale (bigram
        #    df bar needs a corpus); stays clean here
        (4, "yet another unrelated document body text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1)], "lid long, rid long")
    bench = spark.createDataFrame(
        [(100, "completely different words in this one here")],
        "doc_id long, text string",
    )
    v = {
        r.doc_id: r
        for r in curate_verdicts(
            docs, pairs, bench, boiler_max=1.01  # no boiler cut here
        ).collect()
    }
    assert v[0].keep  # clean wins its component and fingerprint group
    assert not v[1].keep_exact and not v[1].keep_near_dup  # dup of 0
    assert v[1].keep_quality  # its other flags are independent
    assert not v[2].keep_quality and v[2].keep_exact
    assert not v[3].keep_decontam  # contains the bench item verbatim
    assert v[4].keep

    audit = curation_audit(
        curate_verdicts(docs, pairs, bench, boiler_max=1.01)
    ).collect()[0]
    assert audit.n_docs == 5
    assert audit.n_keep_quality == 4
    assert audit.n_keep_exact == 4
    assert audit.n_keep_near_dup == 4
    assert audit.n_keep_decontam == 4
    assert audit.n_keep == sum(1 for r in v.values() if r.keep)


def test_extra_dup_graph_adds_a_dimension(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "completely different words in this one"),
            (2, "yet another unrelated document body"),
        ],
        "doc_id long, text string",
    )
    no_pairs = spark.createDataFrame([], "lid long, rid long")
    bench = spark.createDataFrame([], "doc_id long, text string")
    # a semantic (embedding) dup graph merging 1 and 2
    semantic = spark.createDataFrame([(1, 2)], "lid long, rid long")
    v = {
        r.doc_id: r
        for r in curate_verdicts(
            docs,
            no_pairs,
            bench,
            boiler_max=1.01,
            extra_dup_graphs={"semantic": semantic},
        ).collect()
    }
    assert v[1].keep_semantic and not v[2].keep_semantic
    assert v[1].keep_near_dup and v[2].keep_near_dup  # ngram graph empty
    assert v[0].keep and v[1].keep and not v[2].keep
    audit = curation_audit(
        curate_verdicts(
            docs, no_pairs, bench, boiler_max=1.01,
            extra_dup_graphs={"semantic": semantic},
        )
    ).collect()[0]
    assert audit.n_keep_semantic == 2
    assert audit.n_keep == 2


def test_cli_curate(spark, tmp_path, sf_dir):
    import json
    import os

    from click.testing import CliRunner

    from nomenklatura_spark.cli import cli

    docs_path = os.path.join(sf_dir, "documents.parquet")
    out = tmp_path / "verdicts"
    res = CliRunner().invoke(
        cli, ["curate", docs_path, "-o", str(out), "--bench-path", docs_path]
    )
    assert res.exit_code == 0, res.output
    audit = json.loads(res.output.strip().splitlines()[-1])
    assert audit["n_docs"] == 500
    assert 0 < audit["n_keep"] < audit["n_docs"]
    rows = spark.read.parquet(str(out))
    assert rows.count() == 500
    assert "keep" in rows.columns
    # filtered mode writes only kept documents
    out2 = tmp_path / "kept"
    res2 = CliRunner().invoke(
        cli, ["curate", docs_path, "-o", str(out2), "--filtered"]
    )
    assert res2.exit_code == 0, res2.output
    audit2 = json.loads(res2.output.strip().splitlines()[-1])
    assert spark.read.parquet(str(out2)).count() == audit2["n_keep"]


def test_keep_is_conjunction_of_stage_flags(spark, sf_dir):
    from nomenklatura_spark.plans.queries import QUERIES

    rows = QUERIES["corpus_curate"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.keep == (
            r.keep_quality
            and r.keep_exact
            and r.keep_near_dup
            and r.keep_decontam
            and r.keep_boiler
        )


def test_training_batch_lineage(spark, sf_dir):
    """Every doc in the composed training feed is traceable through
    each gate: it passed the full text-curation conjunction AND its
    primary media asset survived the dHash keep-list — and every doc
    failing either gate is absent.  The attached contrastive columns
    replay their source relations (component co-member count, md5
    min-k pool membership)."""
    from pyspark.sql import functions as F

    from nomenklatura_spark.functions.hashing import md5_bucket
    from nomenklatura_spark.multimodal.decode import (
        synthetic_media_pair_assets,
    )
    from nomenklatura_spark.multimodal.dhash import media_dedup_pairs
    from nomenklatura_spark.plans.queries import (
        QUERIES,
        _spark_ngram_pairs,
    )
    from nomenklatura_spark.resolver.components import (
        connected_components,
    )
    from nomenklatura_spark.session import load_table

    out = {
        r.doc_id: r
        for r in QUERIES["training_batch_served"](spark, sf_dir).collect()
    }
    assert out  # non-degenerate at the smoke SF

    # gate 1: the text-curation conjunction
    curate = {
        r.doc_id: r.keep
        for r in QUERIES["corpus_curate"](spark, sf_dir).collect()
    }
    # gate 2: primary asset survives the media keep-list
    docs = load_table(spark, sf_dir, "documents")
    mcomp = connected_components(
        media_dedup_pairs(
            synthetic_media_pair_assets(docs.select("doc_id")),
            max_hamming=6,
        ),
        src="lid",
        dst="rid",
    )
    media_dropped = {
        r.node // 2
        for r in mcomp.where(
            (F.col("node") != F.col("component"))
            & (F.col("node") % 2 == 0)
        ).collect()
    }
    expected = {
        d for d, keep in curate.items() if keep and d not in media_dropped
    }
    assert set(out) == expected

    # contrastive columns replay their source relations
    comps = connected_components(
        _spark_ngram_pairs(spark, sf_dir), src="lid", dst="rid"
    ).collect()
    sizes: dict = {}
    for r in comps:
        sizes[r.component] = sizes.get(r.component, 0) + 1
    by_node = {r.node: sizes[r.component] - 1 for r in comps}
    pool = {
        r.doc_id
        for r in docs.select(
            "doc_id",
            md5_bucket("negpair:pool", F.col("doc_id"), 16**15).alias(
                "_pk"
            ),
        )
        .orderBy("_pk", "doc_id")
        .limit(64)
        .collect()
    }
    for d, r in out.items():
        assert r.n_positives == by_node.get(d, 0)
        assert r.in_neg_pool == (d in pool)
    # the packing leg shards in doc_id order within each language
    by_lang: dict = {}
    for r in sorted(out.values(), key=lambda r: r.doc_id):
        by_lang.setdefault(r.lang_pred, []).append(r)
    for rows in by_lang.values():
        run = 0
        for r in rows:
            assert r.shard == run // 2048
            run += r.n_tokens


def test_served_rows_record_fold_serve_profile(spark, sf_dir):
    """The fold/serve split the bench detail record depends on: a
    *_served query call overwrites its SERVE_PROFILE row with one wall
    per ingest fold plus the serve wall — if this contract breaks, the
    bench's fold_serve field silently goes empty."""
    from nomenklatura_spark.plans.queries import QUERIES, SERVE_PROFILE

    SERVE_PROFILE.pop("doc_sample_served", None)
    QUERIES["doc_sample_served"](spark, sf_dir).collect()
    prof = SERVE_PROFILE["doc_sample_served"]
    assert len(prof["fold"]) == 3  # three id-sliced ingest batches
    assert all(isinstance(w, float) and w >= 0 for w in prof["fold"])
    assert isinstance(prof["serve"], float) and prof["serve"] >= 0
