"""Capture the physical plans of every relation a STEADY-STATE ingest
fold materializes (localCheckpoint) or writes (parquet) — the fold-side
plan evidence for the maintained dedup indexes, whose bench wall is the
folds, not the serve.

Usage: python tools/capture_fold_plans.py <text|media> <tag>

Builds the index exactly like the bench row (3 id-sliced batches over
the sf corpus), runs folds 1-2 normally, then instruments fold 3 (the
steady-state shape: non-empty state, append-only batch): every
``DataFrame.localCheckpoint`` and every ``DataFrameWriter.parquet``
call during that fold dumps its input plan as one section of
plans/<round>/<row>_fold_<tag>.txt.  Plans are captured via the public
``explain(mode="formatted")`` only.
"""

from __future__ import annotations

import os
import sys
import tempfile
import shutil
import time

from pyspark.sql.readwriter import DataFrameWriter

try:  # Spark 4: instances are the classic subclass, which overrides
    # localCheckpoint — patch the class the instances actually use
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # pragma: no cover - Spark 3.x
    from pyspark.sql import DataFrame

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.capture_plans import explain_formatted  # noqa: E402
from nomenklatura_spark.session import get_spark, load_table  # noqa: E402


def main() -> None:
    which = sys.argv[1]
    tag = sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("nk-fold-plan-capture", cpus=cpus,
                      shuffle_partitions=cpus)
    from pyspark.sql import functions as F

    row = {
        "text": "doc_positives_served",
        "media": "media_dedup_served",
    }[which]
    docs = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="nk_fold_capture_")
    sections: list[tuple[str, str]] = []
    walls: list[float] = []

    if which == "text":
        from nomenklatura_spark.streaming.dedup_index import DedupIndexState

        state = DedupIndexState(spark, root)

        def batch(b):
            return docs.where(F.col("doc_id") % 3 == b)

        def fold(b):
            t0 = time.perf_counter()
            state.apply_batch(batch(b), "doc_id", "text")
            walls.append(round(time.perf_counter() - t0, 3))
    else:
        from nomenklatura_spark.multimodal.decode import (
            synthetic_media_pair_assets,
        )
        from nomenklatura_spark.streaming.media_index import (
            MediaDedupIndexState,
        )

        assets = synthetic_media_pair_assets(docs.select("doc_id"))
        state = MediaDedupIndexState(spark, root)

        def batch(b):
            return assets.where(F.col("asset_id") % 3 == b)

        def fold(b):
            t0 = time.perf_counter()
            state.apply_batch(batch(b))
            walls.append(round(time.perf_counter() - t0, 3))

    try:
        fold(0)
        fold(1)

        import threading

        orig_ckpt = DataFrame.localCheckpoint
        orig_parquet = DataFrameWriter.parquet
        n = {"ckpt": 0, "write": 0}
        # explain() prints via the process-global stdout redirect — the
        # fold runs writes on worker threads, so serialize captures
        lock = threading.Lock()

        def ckpt(self, *args, **kwargs):
            with lock:
                n["ckpt"] += 1
                sections.append(
                    (f"localCheckpoint #{n['ckpt']}",
                     explain_formatted(self))
                )
            return orig_ckpt(self, *args, **kwargs)

        def parquet(self, path, *args, **kwargs):
            with lock:
                n["write"] += 1
                rel = "/".join(path.rstrip("/").split("/")[-2:])
                sections.append(
                    (f"write #{n['write']} -> {rel}",
                     explain_formatted(self._df))
                )
            return orig_parquet(self, path, *args, **kwargs)

        DataFrame.localCheckpoint = ckpt
        DataFrameWriter.parquet = parquet
        try:
            fold(2)
        finally:
            DataFrame.localCheckpoint = orig_ckpt
            DataFrameWriter.parquet = orig_parquet
    finally:
        shutil.rmtree(root, ignore_errors=True)

    rnd = os.environ.get("NK_PLANS_ROUND", "r12")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{row}_fold_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(
            f"# steady-state (3rd) ingest fold of {row}: every "
            f"localCheckpoint/parquet input plan, in driver order\n"
            f"# fold walls this capture run (incl. instrumentation): "
            f"{walls}\n\n"
        )
        for label, plan in sections:
            fh.write(f"==== {label} ====\n{plan}\n")
    print(f"wrote {path} ({len(sections)} sections, walls {walls})")


if __name__ == "__main__":
    main()
