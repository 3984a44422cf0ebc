"""Priority sampling (textops/analysis.priority_sample): exact-k,
brute-force key agreement, partition invariance, weight monotonicity
in aggregate, and the no-shuffle TakeOrderedAndProject cut."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row, functions as F

from nomenklatura_spark.textops.analysis import priority_sample


def _h60(salt: str, value) -> int:
    return int(hashlib.md5(f"{salt}:{value}".encode()).hexdigest()[:15], 16)


def _corpus(spark, n=300):
    rows = [Row(doc_id=i, w=(i % 17) + 1) for i in range(n)]
    return spark.createDataFrame(rows)


def _brute(n, k, salt="psample"):
    keyed = sorted(
        ((_h60(salt, i) + 1) // ((i % 17) + 1), i) for i in range(n)
    )
    return [i for _, i in keyed[:k]]


def test_exact_k_and_brute_force_agreement(spark):
    out = priority_sample(_corpus(spark), F.col("w"), 40, id_col="doc_id")
    rows = out.collect()
    assert len(rows) == 40
    assert sorted(r["doc_id"] for r in rows) == sorted(_brute(300, 40))
    # the emitted key is the exact floor quotient
    for r in rows:
        assert r["priority_key"] == (_h60("psample", r["doc_id"]) + 1) // r["weight"]


def test_partition_invariance(spark):
    df = _corpus(spark)
    a = priority_sample(df.repartition(1), F.col("w"), 25).collect()
    b = priority_sample(df.repartition(13, "doc_id"), F.col("w"), 25).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)


def test_zero_weight_clamped_not_dropped(spark):
    df = spark.createDataFrame([Row(doc_id=i, w=0) for i in range(10)])
    out = priority_sample(df, F.col("w"), 10).collect()
    assert len(out) == 10
    assert all(r["weight"] == 1 for r in out)


def test_heavier_items_oversampled(spark):
    # ~4000 items, half weight 1, half weight 9: the weight-9 half should
    # dominate the sample (expected share 90%; the 2^-60 floor
    # quantization cannot move that).
    rows = [Row(doc_id=i, w=1 if i % 2 else 9) for i in range(4000)]
    out = priority_sample(spark.createDataFrame(rows), F.col("w"), 400)
    heavy = out.where(F.col("weight") == 9).count()
    assert heavy > 300


def test_cut_is_take_ordered_no_shuffle(spark):
    out = priority_sample(_corpus(spark), F.col("w"), 25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_stratified_exact_k_per_stratum(spark):
    from pyspark.sql import Row as _Row

    rows = [
        _Row(doc_id=i, w=(i % 7) + 1, src=f"s{i % 3}") for i in range(120)
    ]
    df = spark.createDataFrame(rows)
    out = priority_sample(
        df, F.col("w"), 10, id_col="doc_id", strata_col="src"
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["src"], []).append(r["doc_id"])
    assert {k: len(v) for k, v in by.items()} == {"s0": 10, "s1": 10, "s2": 10}
    # within a stratum the winners are that stratum's global-key top-10
    for s, ids in by.items():
        stratum = [i for i in range(120) if f"s{i % 3}" == s]
        keyed = sorted(
            ((_h60("psample", i) + 1) // ((i % 7) + 1), i) for i in stratum
        )
        assert sorted(ids) == sorted(i for _, i in keyed[:10])


def test_stratified_plan_uses_window_group_limit(spark):
    from pyspark.sql import Row as _Row

    df = spark.createDataFrame(
        [_Row(doc_id=i, w=1, src=f"s{i % 3}") for i in range(60)]
    )
    plan = (
        priority_sample(df, F.col("w"), 5, strata_col="src")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
