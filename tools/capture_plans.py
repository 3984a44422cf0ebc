"""Capture .explain("formatted") for named registry queries into
plans/<round>/<name>_<tag>.txt — the optimization round's plan evidence.

Usage: python tools/capture_plans.py <tag> <query> [<query> ...]
(round dir via NK_PLANS_ROUND, default r12)

Queries whose builder executes eagerly during DataFrame construction
(the *_served rows fold state; iterative graph rows localCheckpoint per
round) still produce a meaningful final-plan capture: the explain shows
the serve/read-back plan, and the fold-side evidence lives in the
operator modules' plan-asserted tests (tests/test_layout.py).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

from nomenklatura_spark.session import get_spark


def explain_formatted(df) -> str:
    """``df.explain("formatted")`` output as a string, via the public
    API only (the r11 capture used private py4j internals —
    ``PythonSQLUtils.explainString`` / ``_jdf.queryExecution()`` —
    which are brittle across PySpark versions; ADVICE r11)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("nk-plan-capture", cpus=cpus, shuffle_partitions=cpus)
    from nomenklatura_spark.plans.queries import QUERIES

    rnd = os.environ.get("NK_PLANS_ROUND", "r12")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = explain_formatted(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
