"""Table profiling: one aggregation pass -> one summary row per column.

The pipeline pre-flight a 100 TB ingest runs before anything else:
per-column null counts, distinct cardinality, and min/max, computed in
a SINGLE aggregate over the table (the profile relation itself is
columns-sized — driver-trivial).  The reference exposes dataset
statistics through its `nomenklatura statistics` summaries
(reference: nomenklatura/cli.py dataset stats verbs); this is the
engine-level generalization to arbitrary tables.

Scale note — exact vs approx distinct: ``exact=True`` uses
``count(DISTINCT col)`` per column, which Catalyst plans via an Expand
node (each input row is replicated once per distinct-aggregate path, so
a C-column profile amplifies the scan C-fold before the partial
aggregate).  That is the bit-exact oracle form.  At 100 TB pass
``exact=False``: ``approx_count_distinct`` (HyperLogLog++) keeps the
plan a single partial-agg scan with NO Expand — the plan shape is
asserted in tests/test_layout.py.  Min/max/null counts are identical
either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def _fmt(col: Column, dtype: T.DataType) -> Column:
    """Render a value as an engine-portable string: doubles via
    DECIMAL(18,2) (both engines print the plain two-decimal form),
    timestamps via an explicit pattern; everything else casts directly."""
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.round(col, 2).cast("decimal(18,2)").cast("string")
    if isinstance(dtype, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns one row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value) with min/max rendered as strings under
    ``_fmt``.  Min/max aggregate on the NATIVE type (string-formatting
    before the aggregate would order "9" above "100") and format after.
    The stack() unpivot runs on the single aggregated row.
    """
    cols = columns or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("bigint")).alias(f"__nulls_{c}"))
        nd = F.countDistinct(col) if exact else F.approx_count_distinct(col)
        aggs.append(nd.alias(f"__nd_{c}"))
        aggs.append(F.min(col).alias(f"__min_{c}"))
        aggs.append(F.max(col).alias(f"__max_{c}"))
    row = df.agg(*aggs)
    parts = []
    for c in cols:
        dtype = df.schema[c].dataType
        fmt_min = _fmt(F.col(f"__min_{c}"), dtype).alias(f"__fmin_{c}")
        fmt_max = _fmt(F.col(f"__max_{c}"), dtype).alias(f"__fmax_{c}")
        row = row.withColumns({f"__fmin_{c}": fmt_min, f"__fmax_{c}": fmt_max})
        parts.append(
            f"'{c}', `__nulls_{c}`, `__nd_{c}`, `__fmin_{c}`, `__fmax_{c}`"
        )
    stack = (
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(col_name, n_nulls, n_distinct, min_value, max_value)"
    )
    return row.selectExpr("__n AS n_rows", stack).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )
