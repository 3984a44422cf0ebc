"""Local mirror of the driver's correctness gate: run every queries()
entry and compare with its oracle_sql() via DuckDB — row count, column
names, and order-insensitive value comparison."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry_mod

QUERY_NAMES = sorted(entry_mod.queries().keys())


def _normalize(rows, colnames):
    """Rows → sorted list of tuples with columns sorted by name and floats
    rounded, mirroring the driver's order-insensitive value-hash."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if hasattr(v, "item"):  # unwrap numpy scalars from pandas rows
                v = v.item()
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            if isinstance(v, bool):
                v = int(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        # driver fallback for non-SQL-expressible ops: rows-only check
        sdf = queries[name](spark, sf_dir)
        assert sdf.columns and sdf.count() >= 0
        return

    sdf = queries[name](spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(oracles[name])
    duck_cols = [d[0].lower() for d in res.description]
    # Fetch through pandas, like the driver: DuckDB HUGEINT (e.g. sum of
    # BIGINT) becomes float64 here, so an oracle missing an explicit BIGINT
    # cast hashes as "99111.0" vs Spark's "99111" and fails — fetchall()
    # would mask that by returning Python ints.
    pdf = res.df()
    duck_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns = _normalize(spark_rows, spark_cols)
    nd = _normalize(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(ns, nd) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


# Engine-regression pin for the one registry row without a SQL oracle:
# the LogicV2 alignment DP (pair_scores_v2) is not SQL-expressible, so
# instead of a DuckDB replay its full sf output is hash-pinned here with
# the driver's own normalization (columns sorted by name, floats rounded
# to 6, rows sorted).  The pinned values were produced by the engine
# whose per-case parity against the reference's frozen 812-case run is
# asserted in tests/test_parity_corpora.py — so this pin chains the
# driver-visible check to the measured reference parity.  If a deliberate
# scoring change moves the hash, re-run tests/test_parity_corpora.py and
# re-pin.
_V2_PINS = {
    "/root/testdata/sf0.001": (
        5000,
        "e9e415ecb7c00a4e5b3ebc35f421c9f3c0416106f7417f2e4f54fba5a2b72a32",
    ),
    "/root/testdata/sf0.01": (
        5000,
        "b5d93d5bac2d05aafd70ad983db9997be4df51ba96e4f119de9deb3cfa7551bd",
    ),
    "/root/testdata/sf0.1": (
        1000,
        "555a727736aa415d5ec8bba74037878c68f8a79e971337fdfbd99363d2d5f0e7",
    ),
}


def test_pair_scores_v2_engine_pin(spark, sf_dir):
    import hashlib

    pin = _V2_PINS.get(sf_dir)
    if pin is None:
        pytest.skip(f"no pin recorded for {sf_dir}")
    sdf = entry_mod.queries()["pair_scores_v2"](spark, sf_dir)
    rows = _normalize(
        [tuple(r) for r in sdf.collect()], [c.lower() for c in sdf.columns]
    )
    joined = "\x1e".join("\x1f".join(r) for r in rows)
    digest = hashlib.sha256(joined.encode()).hexdigest()
    assert (len(rows), digest) == pin
