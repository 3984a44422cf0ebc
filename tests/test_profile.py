"""Table profiling (operators/profile.py): value correctness against
hand counts, null handling, approx path plan shape."""

from __future__ import annotations

from pyspark.sql import Row

from nomenklatura_spark.operators.profile import profile_table


def _df(spark):
    rows = [
        Row(k=1, s="a", v=1.5),
        Row(k=2, s="b", v=None),
        Row(k=2, s=None, v=10.25),
        Row(k=3, s="a", v=-2.0),
    ]
    return spark.createDataFrame(rows, "k bigint, s string, v double")


def test_profile_values(spark):
    out = {r["col_name"]: r for r in profile_table(_df(spark)).collect()}
    assert set(out) == {"k", "s", "v"}
    assert all(r["n_rows"] == 4 for r in out.values())
    k = out["k"]
    assert (k["n_nulls"], k["n_distinct"], k["min_value"], k["max_value"]) == (
        0, 3, "1", "3"
    )
    s = out["s"]
    assert (s["n_nulls"], s["n_distinct"], s["min_value"], s["max_value"]) == (
        1, 2, "a", "b"
    )
    v = out["v"]
    # doubles render via DECIMAL(18,2); min is the NUMERIC min (-2.00,
    # not the string-order min "10.25")
    assert (v["n_nulls"], v["n_distinct"], v["min_value"], v["max_value"]) == (
        1, 3, "-2.00", "10.25"
    )


def test_profile_column_subset(spark):
    out = profile_table(_df(spark), columns=["s"]).collect()
    assert [r["col_name"] for r in out] == ["s"]


def test_approx_profile_has_no_expand(spark):
    df = _df(spark)
    exact_plan = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    approx_plan = (
        profile_table(df, exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exact distinct needs Expand (the documented C-fold amplification);
    # the scale path must not
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
    approx = {
        r["col_name"]: r for r in profile_table(df, exact=False).collect()
    }
    # HLL++ is exact at these cardinalities; min/max/nulls unaffected
    assert approx["k"]["n_distinct"] == 3
    assert approx["v"]["min_value"] == "-2.00"
