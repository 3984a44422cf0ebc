"""Deterministic negative-pair sampling (textops/contrastive.py):
exclusion rules, determinism across runs, the broadcast-pool scale
contract, and the map-side group-limit plan shape."""

from __future__ import annotations

import pytest

from nomenklatura_spark.textops.contrastive import sample_negative_pairs


def _docs(spark, n=40, sources=4):
    return spark.createDataFrame(
        [(i, f"text {i}", f"s{i % sources}") for i in range(n)],
        "doc_id long, text string, source string",
    )


def test_negatives_shape_and_exclusions(spark):
    docs = _docs(spark)
    out = sample_negative_pairs(
        docs, k=3, pool_size=16, group_col="source"
    ).collect()
    by_anchor: dict[int, list] = {}
    for r in out:
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    assert set(by_anchor) == set(range(40))  # every anchor served
    src = {i: f"s{i % 4}" for i in range(40)}
    for a, rows in by_anchor.items():
        assert [r["neg_rank"] for r in sorted(rows, key=lambda r: r["neg_rank"])] == [1, 2, 3]
        for r in rows:
            assert r["negative_id"] != a  # never self
            assert src[r["negative_id"]] != src[a]  # never same group
        # no duplicate negatives within an anchor
        assert len({r["negative_id"] for r in rows}) == 3


def test_negatives_null_group_is_one_shared_group(spark):
    """NULL groups are null-safe (IS DISTINCT FROM semantics): a
    NULL-source anchor still draws negatives from every known-source
    candidate, and two NULL-source docs never pair as negatives —
    plain != would silently emit zero rows for NULL-group anchors."""
    docs = spark.createDataFrame(
        [(0, "a", None), (1, "b", None)]
        + [(i, f"t{i}", f"s{i % 3}") for i in range(2, 20)],
        "doc_id long, text string, source string",
    )
    out = sample_negative_pairs(
        docs, k=20, pool_size=20, group_col="source"
    ).collect()
    by_anchor: dict[int, set] = {}
    for r in out:
        by_anchor.setdefault(r["anchor_id"], set()).add(r["negative_id"])
    # NULL-group anchors are served, not silently dropped — the whole
    # pool minus self minus the other NULL doc (k=pool_size keeps all)
    assert by_anchor[0] == set(range(2, 20))
    assert by_anchor[1] == set(range(2, 20))
    # a known-group anchor draws NULL-group docs freely (distinct
    # groups under IS DISTINCT FROM) plus every other-source doc
    src = {i: i % 3 for i in range(2, 20)}
    assert by_anchor[2] == {0, 1} | {
        i for i in range(2, 20) if src[i] != src[2]
    }


def test_negatives_caller_supplied_pool(spark):
    """A caller-supplied pool (the streaming serving path) reproduces
    the built-in draw when it carries the same rows, and the maintained
    min-k sample index at weight 1 with the pool salt IS that pool."""
    from pyspark.sql import functions as F

    from nomenklatura_spark.streaming.sample_index import SampleIndexState

    docs = _docs(spark)
    builtin = sorted(
        map(
            tuple,
            sample_negative_pairs(
                docs, k=3, pool_size=16, group_col="source"
            ).collect(),
        )
    )
    import tempfile, shutil

    root = tempfile.mkdtemp(prefix="nk_test_negpool_")
    try:
        state = SampleIndexState(spark, root, k=16, salt="negpair:pool")
        state.apply_batch(docs.where(F.col("doc_id") % 2 == 0), F.lit(1))
        state.apply_batch(docs.where(F.col("doc_id") % 2 == 1), F.lit(1))
        pool = (
            state.sample()
            .select(F.col("id").cast("bigint").alias("doc_id"))
            .join(docs.select("doc_id", "source"), "doc_id")
        )
        served = sorted(
            map(
                tuple,
                sample_negative_pairs(
                    docs, k=3, pool_size=16, group_col="source",
                    pool=pool,
                ).collect(),
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    assert served == builtin


def test_negatives_deterministic_and_pool_shared(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, sample_negative_pairs(docs, k=2, pool_size=8).collect()))
    b = sorted(map(tuple, sample_negative_pairs(docs, k=2, pool_size=8).collect()))
    assert a == b
    # negatives come from one shared pool of at most pool_size ids
    negs = {t[1] for t in a}
    assert len(negs) <= 8
    # a different salt yields a different (but still valid) pairing
    c = sorted(
        map(tuple, sample_negative_pairs(docs, k=2, pool_size=8, salt="x").collect())
    )
    assert c != a


def test_negatives_contract_raises(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="max_pool"):
        sample_negative_pairs(docs, k=2, pool_size=100, max_pool=50)
    with pytest.raises(ValueError, match="pool_size"):
        sample_negative_pairs(docs, k=10, pool_size=5)
    with pytest.raises(ValueError, match="k must be"):
        sample_negative_pairs(docs, k=0)


def test_negatives_short_anchors_emit_fewer(spark):
    # one dominant source: anchors from it can only draw the few
    # other-source pool members — they emit fewer than k, never pad
    docs = spark.createDataFrame(
        [(i, "t", "big" if i < 19 else "rare") for i in range(20)],
        "doc_id long, text string, source string",
    )
    out = sample_negative_pairs(
        docs, k=5, pool_size=20, group_col="source"
    ).collect()
    by_anchor: dict[int, int] = {}
    for r in out:
        by_anchor[r["anchor_id"]] = max(
            by_anchor.get(r["anchor_id"], 0), r["neg_rank"]
        )
    # big-source anchors see only the single rare doc in the pool
    assert all(v == 1 for a, v in by_anchor.items() if a < 19)
    assert by_anchor[19] == 5  # the rare anchor has 19 candidates


def test_positive_pairs_from_components(spark):
    """Positives come from the component (transitive closure): a chain
    a-b, b-c yields (a, c) pairs; singletons emit nothing; ranks are
    1..min(k, |component|-1); determinism across runs."""
    from nomenklatura_spark.textops.contrastive import build_positive_pairs

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "node long, component long",
    )
    out = build_positive_pairs(comps, k=5).collect()
    by_anchor: dict[int, set] = {}
    for r in out:
        by_anchor.setdefault(r["anchor_id"], set()).add(r["positive_id"])
    assert by_anchor[1] == {2, 3} and by_anchor[3] == {1, 2}
    assert 4 not in by_anchor  # singleton: no positive exists
    assert by_anchor[5] == {6} and by_anchor[6] == {5}
    a = sorted(map(tuple, out))
    b = sorted(map(tuple, build_positive_pairs(comps, k=5).collect()))
    assert a == b
    # k caps the per-anchor cut
    capped = build_positive_pairs(comps, k=1).collect()
    assert all(r["pos_rank"] == 1 for r in capped)
    assert len([r for r in capped if r["anchor_id"] == 1]) == 1


def test_positive_pairs_giant_component_raises(spark):
    """The executable self-join bound: a component above max_cluster
    raises loudly naming it before any quadratic join runs."""
    import pytest

    from nomenklatura_spark.textops.contrastive import build_positive_pairs

    comps = spark.createDataFrame(
        [(i, 99) for i in range(12)] + [(100, 100), (101, 100)],
        "node long, component long",
    )
    with pytest.raises(ValueError, match=r"99\(12\)"):
        build_positive_pairs(comps, k=2, max_cluster=10)
    # at the bound: fine
    out = build_positive_pairs(comps, k=2, max_cluster=12).collect()
    assert len(out) > 0


def test_hard_negatives_skip_top_slices_ann_ranks(spark):
    """Hard negatives are the IVF neighbor list with the head skipped:
    ranks skip_top+1..skip_top+k re-ranked to 1..k, scores carried —
    and skip_top=0 degenerates to the plain neighbor list."""
    import random

    from nomenklatura_spark.ann.ivf import ivf_topk
    from nomenklatura_spark.textops.contrastive import mine_hard_negatives

    rnd = random.Random(7)
    vecs = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = emb.where("vec_id % 20 = 0")
    full = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in ivf_topk(
            emb, queries, k=6, n_centroids=4, n_probe=2, dim=8
        ).collect()
    }
    hard = mine_hard_negatives(
        emb, queries, k=4, skip_top=2, n_centroids=4, n_probe=2, dim=8
    ).collect()
    assert len(hard) == 3 * 4
    for r in hard:
        nid, sim = full[(r["anchor_id"], r["neg_rank"] + 2)]
        assert (r["negative_id"], r["cosine_sim"]) == (nid, sim)
    import pytest

    with pytest.raises(ValueError, match="skip_top"):
        mine_hard_negatives(emb, queries, k=2, skip_top=-1)


def test_negatives_plan_group_limits_map_side(spark):
    docs = _docs(spark, n=200)
    plan = sample_negative_pairs(
        docs, k=3, pool_size=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # k rows per anchor leave the map side
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_negatives_oversized_supplied_pool_is_deterministic(spark):
    """ADVICE r10: a caller-supplied pool LARGER than pool_size must
    take a deterministic subset — the same md5 pool ordering as the
    built-in draw, so supplying the whole corpus as the pool reproduces
    the built-in draw exactly (not whatever partitions arrive first)."""
    docs = _docs(spark)
    builtin = sorted(
        map(
            tuple,
            sample_negative_pairs(
                docs, k=3, pool_size=8, group_col="source"
            ).collect(),
        )
    )
    # the whole corpus (> pool_size rows), deliberately shuffled into a
    # different partitioning than the built-in path reads
    supplied = docs.select("doc_id", "source").repartition(7)
    served = sorted(
        map(
            tuple,
            sample_negative_pairs(
                docs, k=3, pool_size=8, group_col="source", pool=supplied
            ).collect(),
        )
    )
    assert served == builtin
