"""Incremental MinHash-LSH dedup index: the accumulated pair log must be
indistinguishable from a from-scratch MinHash dedup over the union of all
ingested documents, and re-ingesting a changed document must retract its
stale signature rows."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from nomenklatura_spark.dedup.minhash import minhash_dedup_pairs
from nomenklatura_spark.streaming.dedup_index import (
    DedupIndexState,
    maintain_dedup_stream,
)

DOC_SCHEMA = "doc_id string, text string"

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a slow tune in the warm evening air near the old harbor wall"
)
BATCH1 = [
    ("a1", BASE),
    ("a2", BASE + " with one extra clause appended at the end"),
    ("a3", "completely different text about spark query planning and shuffles"),
]
BATCH2 = [
    ("b1", BASE + " and a slightly different extra clause at the end"),
    ("b2", "another unrelated document mentioning catalysts and codegen"),
    ("a3", BASE + " rewritten to now duplicate the base document text"),
]


def _pairset(df):
    return {
        (r["lid"], r["rid"], round(r["est_jaccard"], 6)) for r in df.collect()
    }


def test_incremental_matches_scratch(spark, tmp_path):
    state = DedupIndexState(spark, str(tmp_path / "state"), threshold=0.3)
    b1 = spark.createDataFrame(BATCH1, DOC_SCHEMA)
    b2 = spark.createDataFrame(BATCH2, DOC_SCHEMA)
    p1 = state.apply_batch(b1)
    assert {(r["lid"], r["rid"]) for r in p1.collect()} == {("a1", "a2")}
    state.apply_batch(b2)

    # final corpus: batch2's a3 replaces batch1's a3
    final = {d: t for d, t in BATCH1} | {d: t for d, t in BATCH2}
    scratch = minhash_dedup_pairs(
        spark.createDataFrame(list(final.items()), DOC_SCHEMA),
        "doc_id",
        "text",
        threshold=0.3,
    )
    maintained = state.pairs()
    # the pair log may retain pairs involving superseded doc versions
    # (an append-only log); restricted to the live candidate set it must
    # agree exactly with the from-scratch run
    live = _pairset(
        maintained.join(scratch.select("lid", "rid"), ["lid", "rid"])
    )
    assert live == _pairset(scratch)
    # and every scratch pair must have been surfaced by some batch
    missing = _pairset(scratch) - _pairset(maintained)
    assert not missing
    # cross-batch dup (a1~b1) must have been found against state
    assert any(l == "a1" and r == "b1" for l, r, _ in _pairset(maintained))
    # the rewritten a3 signatures replaced the old rows (upsert-by-doc)
    n_sig_rows = state.signatures().where(F.col("id") == "a3").count()
    assert n_sig_rows == 32  # one row per hash, not two generations


def test_incremental_components_match_scratch(spark, tmp_path):
    """Maintained components (star-compression fold per batch) must be
    bit-identical to a from-scratch connected-components run over the
    full accumulated pair log — the append-only merge-only argument."""
    from nomenklatura_spark.resolver.components import (
        connected_components,
    )

    state = DedupIndexState(spark, str(tmp_path / "state"), threshold=0.3)
    state.apply_batch(spark.createDataFrame(BATCH1, DOC_SCHEMA))
    state.apply_batch(spark.createDataFrame(BATCH2, DOC_SCHEMA))
    scratch = connected_components(state.pairs(), src="lid", dst="rid")
    got = sorted(map(tuple, state.components().collect()))
    want = sorted(map(tuple, scratch.collect()))
    assert got == want
    # the cross-batch chain a1~a2 (batch 1) + a1~b1 (cross) must have
    # merged into ONE component spanning both batches
    comp_of = dict(got)
    assert comp_of["a1"] == comp_of["a2"] == comp_of["b1"]
    # refolding a batch is a no-op for components (replay-idempotent)
    state.apply_batch(spark.createDataFrame(BATCH2, DOC_SCHEMA))
    again = sorted(map(tuple, state.components().collect()))
    assert again == want


def test_serve_positive_pairs_from_state(spark, tmp_path):
    """The contrastive positive feed served from maintained components
    equals build_positive_pairs over the from-scratch components, and
    time travel serves the feed as of an earlier version."""
    from nomenklatura_spark.resolver.components import (
        connected_components,
    )
    from nomenklatura_spark.textops.contrastive import (
        build_positive_pairs,
    )

    state = DedupIndexState(spark, str(tmp_path / "state"), threshold=0.3)
    state.apply_batch(spark.createDataFrame(BATCH1, DOC_SCHEMA))
    v1 = state.version()
    state.apply_batch(spark.createDataFrame(BATCH2, DOC_SCHEMA))

    served = sorted(map(tuple, state.serve_positive_pairs(k=2).collect()))
    scratch = build_positive_pairs(
        connected_components(state.pairs(), src="lid", dst="rid"),
        k=2,
        id_col="node",
        comp_col="component",
    )
    assert served == sorted(map(tuple, scratch.collect()))
    assert served  # the merged a1/a2/b1 component feeds real positives
    # time travel: the v1 components know only batch-1 pairs
    old = {r["node"] for r in state.components(v1).collect()}
    assert "b1" not in old and "a1" in old


def test_streaming_dedup_maintenance(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    state = DedupIndexState(spark, str(tmp_path / "state"), threshold=0.3)
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))

    with open(src / "b1.json", "w") as fh:
        for d, t in BATCH1:
            fh.write(json.dumps({"doc_id": d, "text": t}) + "\n")
    q = maintain_dedup_stream(stream, state, checkpoint_dir=str(tmp_path / "chk"))
    try:
        q.processAllAvailable()
        assert state.version() >= 0
        assert {(r["lid"], r["rid"]) for r in state.pairs().collect()} == {
            ("a1", "a2")
        }
        with open(src / "b2.json", "w") as fh:
            for d, t in BATCH2:
                fh.write(json.dumps({"doc_id": d, "text": t}) + "\n")
        q.processAllAvailable()
        pairs = {(r["lid"], r["rid"]) for r in state.pairs().collect()}
        assert ("a1", "b1") in pairs
    finally:
        q.stop()
