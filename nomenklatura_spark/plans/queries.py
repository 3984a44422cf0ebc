"""Driver-contract query suite: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus an equivalent DuckDB oracle SQL.

The TPC-H-ish testdata tables are mapped into the engine's statement model
(SURVEY.md §1) so the ER operators (tokenizer, blocker, resolver, linker)
run on driver-provided data; the LLM-pipeline extensions (dedup, text
analysis, ANN) run on the ``documents`` / ``embeddings`` tables directly.

Determinism rules for the oracle hash-compare:
- every float is rounded *before* any ranking/limit that depends on it;
- every computed column is aliased identically in Spark and SQL;
- ties in any top-K are broken by explicit id columns.
"""

from __future__ import annotations

from nomenklatura_spark.plans.cache import plan_cache

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from nomenklatura_spark.ann.brute import cosine_topk
from nomenklatura_spark.ann.ivf import ivf_topk
from nomenklatura_spark.ann.lsh import lsh_topk
from nomenklatura_spark.dedup.embedding import embedding_dup_pairs
from nomenklatura_spark.dedup.ngram import ngram_jaccard_pairs
from nomenklatura_spark.functions.normalize import LEGAL_FORMS, STOP_TOKENS
from nomenklatura_spark.functions.tokenize import tokenize_statements
from nomenklatura_spark.matching.symbols import symbol_sql_expr
from nomenklatura_spark.model.statement import statements_from_wide_table
from nomenklatura_spark.operators.assembly import adjacency, assemble_properties
from nomenklatura_spark.operators.blocker import (
    apply_stopwords,
    boosts_df,
    build_matching_token_stats,
    build_token_stats,
    candidate_pairs,
    match_candidates,
    stopwords_from_stats,
    term_frequencies,
    token_entries,
    token_schema_counts,
)
from nomenklatura_spark.resolver.components import connected_components
from nomenklatura_spark.resolver.linker import apply_linker
from nomenklatura_spark.session import load_table
from nomenklatura_spark.textops.analysis import (
    LANG_MARKERS,
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_features,
    token_count,
)

# ---------------------------------------------------------------------------
# fold/serve profiling for the *_served rows

# Each *_served call overwrites its row here with
# {"fold": [per-batch ingest walls], "serve": serving wall} — bench.py
# snapshots it per pass so the detail record splits the by-design
# ingest cost from the regression-sensitive serve cost (a serve-path
# regression must not hide under fold noise: doc_positives_served's
# r10 idle wall was 16.8s of which the serve was 0.79s).
SERVE_PROFILE: dict[str, dict] = {}


class _fold_serve:
    """``p = _fold_serve("row")``; ``with p.fold(): state.apply_batch``
    per ingest batch, ``with p.serve(): out.collect()`` around the
    state-only answer.  Wall-clock only — no Spark instrumentation, so
    the timed plans are byte-identical with or without profiling."""

    def __init__(self, name: str) -> None:
        self.rec = SERVE_PROFILE[name] = {"fold": [], "serve": None}

    def fold(self):
        return self._timed("fold")

    def serve(self):
        return self._timed("serve")

    def _timed(self, kind: str):
        import contextlib
        import time

        @contextlib.contextmanager
        def _cm():
            t0 = time.perf_counter()
            yield
            dt = round(time.perf_counter() - t0, 3)
            if kind == "fold":
                self.rec["fold"].append(dt)
            else:
                self.rec["serve"] = dt

        return _cm()


# ---------------------------------------------------------------------------
# shared constants

MAX_PAIR_COST = 1770       # 60*59/2 — reference default budget
MAX_MATCH_PAIR_COST = 3600  # 60*60
MAX_PAIRS = 5000
MAX_CANDIDATES = 10
MIN_SCORE_RATIO = 0.1

SCHEMATA_PAIRS = [
    ("Part", "Part"),
    ("Customer", "Customer"),
    ("Supplier", "Supplier"),
    ("Customer", "Supplier"),
    ("Supplier", "Customer"),
]


def _sql_list(items: list[str]) -> str:
    return "(" + ", ".join("'" + i.replace("'", "''") + "'" for i in items) + ")"


STOP_IN = _sql_list(STOP_TOKENS)
LEGAL_IN = _sql_list(LEGAL_FORMS)

# ---------------------------------------------------------------------------
# statement construction (Spark side)


def er_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part + customer + supplier as statement rows (the ER corpus).

    Memoized per (session, sf_dir): the DataFrame is an immutable plan,
    and rebuilding it per query re-pays parquet listing plus the py4j
    construction of the unpivot expressions.  One plan object per corpus
    serves every query in the session (the reference materializes the
    same relations in DuckDB once per run)."""
    return _er_statements_cached(spark, sf_dir)


@plan_cache(maxsize=8)
def _er_statements_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = statements_from_wide_table(
        load_table(spark, sf_dir, "part"),
        "p_partkey",
        "Part",
        {"p_name": "name", "p_brand": "brand", "p_type": "typeText"},
        "testdata",
        prop_types={"name": "name", "brand": "string", "typeText": "string"},
    )
    customer = statements_from_wide_table(
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
        "Customer",
        {"c_name": "name", "c_mktsegment": "segment"},
        "testdata",
        prop_types={"name": "name", "segment": "string"},
    )
    supplier = statements_from_wide_table(
        load_table(spark, sf_dir, "supplier"),
        "s_suppkey",
        "Supplier",
        {"s_name": "name"},
        "testdata",
        prop_types={"name": "name"},
    )
    return part.unionByName(customer).unionByName(supplier)


def order_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    return statements_from_wide_table(
        load_table(spark, sf_dir, "orders"),
        "o_orderkey",
        "Order",
        {"o_custkey": "customer", "o_orderdate": "date", "o_orderstatus": "status"},
        "testdata",
        prop_types={"date": "date", "status": "string"},
        entity_props={"customer": "Customer"},
    )


def er_schemata(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SCHEMATA_PAIRS, "left string, right string")


def er_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``entries`` relation, materialized: every blocker stage (stats,
    stopwords, IDF, self-join) re-reads it — the reference materializes it
    as a DuckDB table for the same reason (index.py:148-195).

    The single-pass tokenizer scans the statement input exactly once
    (array-build + one explode), so the statements themselves need no
    cache.  Memoized per (session, sf_dir) like ``er_statements`` — one
    persisted plan serves every blocker stage and query.
    """
    return _er_entries_cached(spark, sf_dir)


@plan_cache(maxsize=8)
def _er_entries_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_entries(tokenize_statements(er_statements(spark, sf_dir))).persist()


# ---------------------------------------------------------------------------
# oracle SQL fragments

# statement rows (schema, id, prop_type, value) for the ER corpus
_ER_STMTS_SQL = """
    SELECT 'Part' AS schema, 'part-' || p_partkey AS id, 'name' AS prop_type, p_name AS value FROM part
    UNION ALL SELECT 'Part', 'part-' || p_partkey, 'string', p_brand FROM part
    UNION ALL SELECT 'Part', 'part-' || p_partkey, 'string', p_type FROM part
    UNION ALL SELECT 'Customer', 'customer-' || c_custkey, 'name', c_name FROM customer
    UNION ALL SELECT 'Customer', 'customer-' || c_custkey, 'string', c_mktsegment FROM customer
    UNION ALL SELECT 'Supplier', 'supplier-' || s_suppkey, 'name', s_name FROM supplier
"""

# normalized token arrays per statement
_NORM_TOKS = (
    "list_filter(string_split(trim(regexp_replace(lower(strip_accents(value)),"
    " '[^a-z0-9]+', ' ', 'g')), ' '), t -> t != '')"
)

_ER_TOKENS_SQL = f"""
    WITH stmts AS ({_ER_STMTS_SQL}),
    name_toks AS (
        SELECT schema, id, {_NORM_TOKS} AS toks
        FROM stmts WHERE prop_type = 'name'
    ),
    np AS (
        SELECT schema, id, 'np' AS field, 'np:' || tok AS token
        FROM (
            SELECT schema, id, unnest(list_distinct(list_filter(toks,
                t -> len(t) >= 3 AND len(t) <= 30
                     AND t NOT IN {LEGAL_IN} AND t NOT IN {STOP_IN}))) AS tok
            FROM name_toks
        )
    ),
    fp AS (
        SELECT schema, id, 'name' AS field, 'n:' || fp AS token
        FROM (
            SELECT schema, id,
                array_to_string(list_sort(list_distinct(list_filter(toks,
                    t -> t NOT IN {LEGAL_IN} AND t NOT IN {STOP_IN}))), '') AS fp
            FROM name_toks
        )
        WHERE len(fp) > 3 AND len(fp) < 200
    ),
    sy AS (
        SELECT schema, id, 'sy' AS field, 'sy:' || sym AS token
        FROM (
            SELECT schema, id, unnest(list_distinct(list_filter(
                list_transform(toks, t -> {symbol_sql_expr('t')}),
                s -> s IS NOT NULL))) AS sym
            FROM name_toks
        )
    ),
    wd AS (
        SELECT schema, id, 'wd' AS field, 'wd:' || tok AS token
        FROM (
            SELECT schema, id, unnest(list_filter({_NORM_TOKS},
                t -> len(t) >= 6 AND t NOT IN {STOP_IN})) AS tok
            FROM stmts WHERE prop_type IN ('text', 'string', 'identifier')
        )
    ),
    all_toks AS (
        SELECT * FROM np UNION ALL SELECT * FROM fp
        UNION ALL SELECT * FROM sy UNION ALL SELECT * FROM wd
    )
    SELECT schema, id, field, substr(token, 1, 40) AS token,
           CAST(count(*) AS INT) AS count
    FROM all_toks
    GROUP BY schema, id, field, substr(token, 1, 40)
"""

_SCHEMATA_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{a}', '{b}')" for a, b in SCHEMATA_PAIRS)
    + ") AS schemata(sl, sr)"
)

_TOKEN_STATS_SQL = f"""
    WITH entries AS ({_ER_TOKENS_SQL}),
    schemata AS ({_SCHEMATA_SQL}),
    tsc AS (
        SELECT token, any_value(field) AS field, schema,
               count(*) AS df, sum("count") AS freq
        FROM entries GROUP BY token, schema
    ),
    schema_pairs AS (
        SELECT DISTINCT least(sl, sr) AS left_schema, greatest(sl, sr) AS right_schema
        FROM schemata
    ),
    compatible AS (
        SELECT l.token,
            sum(CASE WHEN l.schema = r.schema
                THEN CAST(l.df * (l.df - 1) / 2 AS HUGEINT)
                ELSE CAST(l.df * r.df AS HUGEINT) END) AS compatible_pair_cost
        FROM tsc l
        JOIN tsc r ON l.token = r.token AND l.schema <= r.schema
        JOIN schema_pairs s ON s.left_schema = l.schema AND s.right_schema = r.schema
        GROUP BY l.token
    ),
    totals AS (
        SELECT token, any_value(field) AS field, sum(freq) AS freq, sum(df) AS df
        FROM tsc GROUP BY token
    )
    SELECT totals.token, totals.field,
           CAST(totals.freq AS BIGINT) AS freq,
           CAST(totals.df AS BIGINT) AS df,
           CAST(ifnull(compatible.compatible_pair_cost, 0) AS BIGINT) AS compatible_pair_cost,
           ifnull(compatible.compatible_pair_cost, 0) > {MAX_PAIR_COST} AS stopword
    FROM totals LEFT JOIN compatible ON compatible.token = totals.token
"""

_BOOSTS_SQL = (
    "SELECT * FROM (VALUES ('np', 5.0), ('wd', 0.5), ('name', 15.0),"
    " ('phone', 10.0), ('email', 10.0), ('address', 1.0), ('identifier', 10.0)"
    ") AS boosts(field, boost)"
)

_TF_SQL = f"""
    WITH entries AS ({_ER_TOKENS_SQL}),
    boosts AS ({_BOOSTS_SQL}),
    entity_count AS (SELECT count(DISTINCT id) AS n FROM entries),
    token_idf AS (
        SELECT e.token, 1.0 + ln(c.n / count(DISTINCT e.id)) AS idf
        FROM entries e, entity_count c
        GROUP BY e.token, c.n
    ),
    name_counts AS (
        SELECT id, greatest(1, sum("count")) AS n_names
        FROM entries WHERE field = 'name' GROUP BY id
    )
    SELECT e.schema, e.field, e.token, e.id, e."count",
        CASE WHEN e.field IN ('np', 'sy')
            THEN ifnull(boo.boost, 1) * i.idf / sqrt(ifnull(nc.n_names, 1))
            ELSE ifnull(boo.boost, 1) * i.idf
        END AS weight
    FROM entries e
    JOIN token_idf i ON i.token = e.token
    LEFT OUTER JOIN name_counts nc ON nc.id = e.id
    LEFT OUTER JOIN boosts boo ON e.field = boo.field
"""

_PAIRS_SQL = f"""
    WITH tf_all AS ({_TF_SQL}),
    token_stats AS ({_TOKEN_STATS_SQL}),
    stopwords AS (SELECT token FROM token_stats WHERE stopword),
    tf AS (
        SELECT t.* FROM tf_all t
        LEFT OUTER JOIN stopwords sw ON sw.token = t.token
        WHERE sw.token IS NULL
    ),
    schemata AS ({_SCHEMATA_SQL}),
    field_scores AS (
        SELECT l.id AS lid, r.id AS rid, l.field AS field,
               max(l.weight + r.weight) AS maxw, count(*) AS n
        FROM tf l
        JOIN tf r ON l.token = r.token AND l.field = r.field
        INNER JOIN schemata s ON s.sl = l.schema AND s.sr = r.schema
        WHERE l.id > r.id
        GROUP BY l.id, r.id, l.field
    )
    SELECT lid, rid, round(sum(maxw * (1.0 + ln(n))), 6) AS score
    FROM field_scores
    GROUP BY lid, rid
    ORDER BY score DESC, lid, rid
    LIMIT {MAX_PAIRS}
"""

_MATCHING_ENTRIES_SQL = f"""
    SELECT * FROM ({_ER_TOKENS_SQL}) WHERE schema = 'Supplier'
"""

_MATCH_SQL = f"""
    WITH tf_all AS ({_TF_SQL}),
    matching AS ({_MATCHING_ENTRIES_SQL}),
    schemata AS ({_SCHEMATA_SQL}),
    m_tsc AS (
        SELECT token, schema, count(*) AS df FROM matching GROUP BY token, schema
    ),
    i_tsc AS (
        SELECT token, schema, count(*) AS df
        FROM ({_ER_TOKENS_SQL}) GROUP BY token, schema
    ),
    m_cost AS (
        SELECT m.token, sum(CAST(m.df * i.df AS HUGEINT)) AS cost
        FROM m_tsc m
        JOIN i_tsc i ON i.token = m.token
        JOIN schemata s ON s.sl = m.schema AND s.sr = i.schema
        GROUP BY m.token
    ),
    m_stop AS (SELECT token FROM m_cost WHERE cost > {MAX_MATCH_PAIR_COST}),
    matching_filtered AS (
        SELECT m.* FROM matching m
        LEFT OUTER JOIN m_stop sw ON sw.token = m.token
        WHERE sw.token IS NULL
    ),
    field_scores AS (
        SELECT m.id AS matching_id, tf.id AS matches_id, tf.field AS field,
               max(tf.weight) AS maxw, count(*) AS n
        FROM matching_filtered m
        JOIN tf_all tf ON m.token = tf.token AND m.field = tf.field AND tf.id != m.id
        INNER JOIN schemata s ON s.sl = m.schema AND s.sr = tf.schema
        GROUP BY m.id, tf.id, tf.field
    ),
    pair_scores AS (
        SELECT matching_id, matches_id,
               round(sum(maxw * (1.0 + ln(n))), 6) AS score
        FROM field_scores
        GROUP BY matching_id, matches_id
    )
    SELECT matching_id, matches_id, score, rn
    FROM (
        SELECT matching_id, matches_id, score,
            row_number() OVER w AS rn,
            first_value(score) OVER w AS best
        FROM pair_scores
        WINDOW w AS (PARTITION BY matching_id ORDER BY score DESC, matches_id)
    )
    WHERE rn <= {MAX_CANDIDATES} AND score >= best * {MIN_SCORE_RATIO}
    ORDER BY matching_id, rn
"""

# word trigram near-dup pairs over documents
_DOC_WORDS = (
    "list_filter(string_split(trim(regexp_replace(lower(text),"
    " '[^a-z0-9]+', ' ', 'g')), ' '), t -> t != '')"
)

_NGRAM_PAIRS_SQL_BODY = f"""
    WITH ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    tri AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(w) - 2, 0)),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM ws
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
    hot AS (SELECT sh FROM tri GROUP BY sh HAVING count(*) > 100),
    tri_f AS (
        SELECT t.* FROM tri t LEFT OUTER JOIN hot h ON h.sh = t.sh
        WHERE h.sh IS NULL
    ),
    inter AS (
        SELECT l.doc_id AS lid, r.doc_id AS rid, count(*) AS n_common
        FROM tri_f l JOIN tri_f r ON l.sh = r.sh
        WHERE l.doc_id < r.doc_id
        GROUP BY l.doc_id, r.doc_id
    ),
    jac AS (
        SELECT lid, rid,
               round(n_common * 1.0 / (ls.n + rs.n - n_common), 6) AS jaccard
        FROM inter
        JOIN sizes ls ON ls.doc_id = lid
        JOIN sizes rs ON rs.doc_id = rid
    )
    SELECT lid, rid, jaccard FROM jac WHERE jaccard >= 0.5
"""

# The recursive connected-component walk over the near-dup pair graph —
# shared by the components / survivors / leakage-safe-split /
# corpus-curate oracles so the walk's semantics (symmetric edges,
# min-reachable representative) live in exactly one place.
_COMPONENT_WALK_SQL_BODY = f"""pairs AS ({_NGRAM_PAIRS_SQL_BODY}),
    edges AS (
        SELECT lid AS a, rid AS b FROM pairs
        UNION SELECT rid, lid FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    walk(node, reached) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT w.node, e.b FROM walk w JOIN edges e ON e.a = w.reached
    )"""


def _spark_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair relation, memoized+persisted per (session, sf_dir):
    both the pair query and the components query read it, and a real
    deployment materializes the pair graph once before clustering."""
    return _ngram_pairs_cached(spark, sf_dir)


@plan_cache(maxsize=4)
def _media_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dHash near-dup pair relation over the synthetic media assets,
    memoized+persisted per (session, sf_dir): the decode is the
    expensive leg and both ``media_dedup`` and the composed
    ``training_batch_served`` read the same relation — a real pipeline
    materializes the pair graph once (the ``_ngram_pairs_cached``
    pattern; pair rows are tens of bytes, pixels are never cached)."""
    from nomenklatura_spark.multimodal.decode import (
        synthetic_media_pair_assets,
    )
    from nomenklatura_spark.multimodal.dhash import media_dedup_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assets = synthetic_media_pair_assets(docs)
    return media_dedup_pairs(assets, max_hamming=6).persist()


@plan_cache(maxsize=8)
def _ngram_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.5, max_df=100, mode="word"
    )
    return (
        pairs.select("lid", "rid", F.round("jaccard", 6).alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
        .persist()
    )


CONTAINMENT_THRESHOLD = 0.6


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup via exact prefix filtering
    (``dedup/ngram.containment_join``): (contained, container) pairs
    where >= 60% of the contained document's word trigrams appear in
    the container — the quote-inclusion / partial-mirror duplicates
    that every symmetric pass (Jaccard, MinHash bands, SimHash)
    structurally under-recalls, found with NO all-pairs join and NO
    LSH recall loss (prefix filtering is candidate-complete by
    construction).  The oracle replays the identical prefix/verify
    algebra, so a hash-green row proves candidate completeness on
    real data, not just the crafted pytests."""
    from nomenklatura_spark.dedup.ngram import containment_join

    docs = load_table(spark, sf_dir, "documents")
    out = containment_join(
        docs, "doc_id", "text", k=3, mode="word",
        threshold=CONTAINMENT_THRESHOLD,
    )
    return out.select(
        "contained_id",
        "container_id",
        F.round("containment", 6).alias("containment"),
    ).orderBy("contained_id", "container_id")


_DEDUP_CONTAINMENT_SQL = f"""
    WITH ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    tri AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(w) - 2, 0)),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM ws
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
    freq AS (SELECT sh, count(*) AS sdf FROM tri GROUP BY sh),
    ranked AS (
        SELECT t.doc_id, t.sh, s.n,
            row_number() OVER (
                PARTITION BY t.doc_id ORDER BY f.sdf, t.sh
            ) AS rk
        FROM tri t
        JOIN freq f USING (sh)
        JOIN sizes s USING (doc_id)
    ),
    prefix AS (
        SELECT doc_id AS cid, sh FROM ranked
        WHERE rk <= n - ceil({CONTAINMENT_THRESHOLD} * n) + 1
    ),
    cand AS (
        SELECT DISTINCT p.cid, t.doc_id AS oid
        FROM prefix p JOIN tri t ON t.sh = p.sh AND t.doc_id != p.cid
    ),
    inter AS (
        SELECT c.cid, c.oid, s.n AS c_n, count(*) AS n_common
        FROM cand c
        JOIN tri l ON l.doc_id = c.cid
        JOIN tri r ON r.doc_id = c.oid AND r.sh = l.sh
        JOIN sizes s ON s.doc_id = c.cid
        GROUP BY c.cid, c.oid, s.n
    )
    SELECT cid AS contained_id, oid AS container_id,
        round(n_common * 1.0 / c_n, 6) AS containment
    FROM inter
    WHERE n_common * 1.0 / c_n >= {CONTAINMENT_THRESHOLD}
    ORDER BY contained_id, container_id
"""


# ---------------------------------------------------------------------------
# queries


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation over lineitem (warm-up relational op)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_PRICING_SQL = """
    SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        round(avg(l_quantity), 4) AS avg_qty,
        count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


def q_top_revenue_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join star query: revenue by customer nation (broadcast dims)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


_TOP_NATIONS_SQL = """
    SELECT n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        count(DISTINCT o_orderkey) AS n_orders
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


def q_events_user_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-shaped per-key top-K with tie-broken ordering."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .orderBy("user_id", "rn")
    )


_EVENTS_TOPK_SQL = """
    SELECT user_id, event_id, value, rn FROM (
        SELECT user_id, event_id, value,
            row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        FROM events
    ) WHERE rn <= 3
    ORDER BY user_id, rn
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of the streaming tumbling-window aggregation."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


_EVENTS_HOURLY_SQL = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type
"""


def q_events_hourly_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window hourly rollup answered from the maintained
    grouped-counter view (``streaming/counts_index.py``): three
    decade-of-month ingest batches ARRIVE OUT OF TIME ORDER and fold
    into (type, hour) counters (values as exact integer cents); the
    dashboard relation is then READ from state — the textbook
    materialized view, proven against a rescan-everything oracle.  At
    100 TB the serve costs keys x calendar buckets rows, however many
    events the history holds."""
    import shutil
    import tempfile

    from nomenklatura_spark.streaming.counts_index import CountsIndexState

    events = (
        load_table(spark, sf_dir, "events")
        .withColumn("day", F.dayofmonth(F.to_date("ts")))
        .withColumn(
            "value_int", F.round(F.col("value") * 100).cast("bigint")
        )
    )
    root = tempfile.mkdtemp(prefix="nk_counts_idx_")
    try:
        state = CountsIndexState(spark, root, bucket="hour")
        prof = _fold_serve("events_hourly_served")
        for b, (lo, hi) in enumerate([(21, 31), (1, 10), (11, 20)]):
            with prof.fold():
                state.apply_batch(
                    events.where(F.col("day").between(lo, hi)),
                    value_col="value_int",
                    batch_id=b,
                )
        out = (
            state.counts()
            .select(
                F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                F.col("k").alias("event_type"),
                F.col("cnt").alias("n_events"),
                F.round(F.col("sv") / 100.0, 2).alias("sum_value"),
            )
            .orderBy("hour", "event_type")
        )
        # driver-materialize (view-grain rows) before dropping the
        # on-disk state — see events_hll_weekly_served
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_EVENTS_HOURLY_SERVED_SQL = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           count(*) AS n_events,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2)
               AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type
"""


def q_events_anomaly_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The robust-anomaly monitoring query answered from the SAME
    maintained counter view as ``events_hourly_served``
    (``operators/temporal.anomalies_from_counts``): median/MAD stats
    aggregate the state relation (keys x calendar buckets), the raw
    event history is never rescanned, and the oracle is the identical
    batch anomaly SQL over everything — one maintained view, two
    serving queries."""
    import shutil
    import tempfile

    from nomenklatura_spark.operators.temporal import anomalies_from_counts
    from nomenklatura_spark.streaming.counts_index import CountsIndexState

    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.dayofmonth(F.to_date("ts"))
    )
    root = tempfile.mkdtemp(prefix="nk_counts_idx_")
    try:
        state = CountsIndexState(spark, root, bucket="hour")
        prof = _fold_serve("events_anomaly_served")
        for b, (lo, hi) in enumerate([(11, 20), (21, 31), (1, 10)]):
            with prof.fold():
                state.apply_batch(
                    events.where(F.col("day").between(lo, hi)), batch_id=b
                )
        served = anomalies_from_counts(
            state.counts().select(
                F.col("k").alias("key"),
                F.col("b").alias("bucket_ts"),
                "cnt",
            ),
            key_col="event_type",
            z=3.0,
        )
        out = served.select(
            "event_type",
            F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            F.col("cnt").cast("long").alias("cnt"),
            F.round("med", 1).alias("med"),
            F.round("mad", 1).alias("mad"),
            "robust_z",
        ).orderBy("event_type", "hour")
        # driver-materialize (alert-sized) before dropping the state
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on per-type hourly activity
    (``operators/temporal.robust_anomalies``): median/MAD modified
    z-scores flag hours whose count deviates > 3 consistency-scaled
    MADs — the monitoring primitive mean/stddev rules get wrong because
    outliers corrupt their own baseline.  One event-stream shuffle; the
    stats aggregate the calendar-bounded counts relation."""
    from nomenklatura_spark.operators.temporal import robust_anomalies

    events = load_table(spark, sf_dir, "events")
    out = robust_anomalies(events, "event_type", "ts", bucket="hour", z=3.0)
    return out.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("cnt").cast("long").alias("cnt"),
        F.round("med", 1).alias("med"),
        F.round("mad", 1).alias("mad"),
        "robust_z",
    ).orderBy("event_type", "hour")


_EVENTS_ANOMALY_SQL = """
    WITH counts AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, quantile_cont(cnt, 0.5) AS med
        FROM counts GROUP BY 1
    ),
    dev AS (
        SELECT c.event_type, c.bucket_ts, c.cnt, m.med,
               abs(c.cnt - m.med) AS abs_dev
        FROM counts c JOIN med m USING (event_type)
    ),
    mads AS (
        SELECT event_type, quantile_cont(abs_dev, 0.5) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           strftime(d.bucket_ts, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(d.cnt AS BIGINT) AS cnt,
           round(d.med, 1) AS med,
           round(a.mad, 1) AS mad,
           round((d.cnt - d.med) / (1.4826 * GREATEST(a.mad, 0.5)), 4)
               AS robust_z
    FROM dev d JOIN mads a USING (event_type)
    WHERE (a.mad > 0 AND d.abs_dev > 3.0 * 1.4826 * a.mad)
       OR (a.mad = 0 AND d.abs_dev > 0)
    ORDER BY event_type, hour
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON props column."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


_EVENTS_JSON_SQL = """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""


def q_statements_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/F1 — the statement model itself: wide table → statement rows."""
    customer = load_table(spark, sf_dir, "customer")
    stmts = statements_from_wide_table(
        customer,
        "c_custkey",
        "Customer",
        {"c_name": "name", "c_mktsegment": "segment", "c_nationkey": "nation"},
        "testdata",
        prop_types={"name": "name", "segment": "string"},
        entity_props={"nation": "Nation"},
    )
    return stmts.select(
        "id", "entity_id", "canonical_id", "prop", "prop_type", "schema",
        "value", "dataset", "external",
    )


_STATEMENTS_SQL = """
    WITH raw AS (
        SELECT 'customer-' || c_custkey AS entity_id, 'name' AS prop,
               'name' AS prop_type, c_name AS value FROM customer
        UNION ALL
        SELECT 'customer-' || c_custkey, 'segment', 'string', c_mktsegment FROM customer
        UNION ALL
        SELECT 'customer-' || c_custkey, 'nation', 'entity',
               'nation-' || c_nationkey FROM customer
    )
    SELECT sha256(entity_id || chr(30) || prop || chr(30) || value) AS id,
           entity_id, entity_id AS canonical_id, prop, prop_type,
           'Customer' AS schema, value, 'testdata' AS dataset,
           FALSE AS external
    FROM raw
"""


def q_entity_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — entity assembly to (canonical_id, prop, values)."""
    stmts = er_statements(spark, sf_dir)
    props = assemble_properties(stmts)
    return props.select(
        "canonical_id",
        "schema",
        "prop",
        F.array_join("values", "|").alias("vals"),
    ).orderBy("canonical_id", "prop")


_ENTITY_PROPS_SQL = f"""
    WITH stmts AS (
        SELECT 'Part' AS schema, 'part-' || p_partkey AS id, 'name' AS prop, p_name AS value FROM part
        UNION ALL SELECT 'Part', 'part-' || p_partkey, 'brand', p_brand FROM part
        UNION ALL SELECT 'Part', 'part-' || p_partkey, 'typeText', p_type FROM part
        UNION ALL SELECT 'Customer', 'customer-' || c_custkey, 'name', c_name FROM customer
        UNION ALL SELECT 'Customer', 'customer-' || c_custkey, 'segment', c_mktsegment FROM customer
        UNION ALL SELECT 'Supplier', 'supplier-' || s_suppkey, 'name', s_name FROM supplier
    )
    SELECT id AS canonical_id, schema, prop,
           array_to_string(list_sort(list_distinct(list(value))), '|') AS vals
    FROM stmts
    GROUP BY id, schema, prop
    ORDER BY canonical_id, prop
"""


def q_adjacency_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — property-graph adjacency: orders →(customer)→ customer names."""
    stmts = er_statements(spark, sf_dir).unionByName(
        order_statements(spark, sf_dir)
    )
    adj = adjacency(stmts)
    return (
        adj.where((F.col("edge_prop") == "customer") & (F.col("dst_prop") == "name"))
        .groupBy(F.col("dst_id").alias("customer_id"), F.col("dst_value").alias("customer_name"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("customer_id")
    )


_ADJACENCY_SQL = """
    SELECT 'customer-' || c_custkey AS customer_id,
           c_name AS customer_name,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
    ORDER BY customer_id
"""


def q_blocker_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T2+A3+A4+J5 — tokenizer entries with boosted/IDF term weights.

    One row per (schema, id, field, token) carrying the truncated-token
    count (T2) and the boost·idf/dampening weight (A3/A4/J5) — the
    former ``blocker_term_frequencies`` query folded onto the entries
    grain, so one driver row oracle-checks the tokenizer AND the weight
    model (round-3 registry consolidation; the driver checks 50 rows).

    No presentation sort (here and on the other heavy per-row queries):
    a global orderBy makes Spark's range partitioner SAMPLE the child
    plan, executing the whole pipeline twice — measured 1.7-2.4x wall on
    these queries.  The driver's value-hash is order-insensitive, so the
    sort bought nothing.
    """
    return _er_tf_all_cached(spark, sf_dir).select(
        "schema",
        "id",
        "field",
        "token",
        "count",
        F.round("weight", 6).alias("weight"),
    )


@plan_cache(maxsize=8)
def _er_tf_all_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unfiltered (stopwords included) weighted TF relation — the
    other materialized index table, memoized like its filtered sibling."""
    return term_frequencies(
        er_entries(spark, sf_dir), boosts_df(spark)
    ).persist()


def q_blocker_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2 — doc frequencies and dynamic-stopword pair costs."""
    stats = build_token_stats(
        er_entries(spark, sf_dir), er_schemata(spark), MAX_PAIR_COST
    )
    return stats.select(
        "token",
        "field",
        F.col("freq").cast("long").alias("freq"),
        F.col("df").cast("long").alias("df"),
        F.col("compatible_pair_cost").cast("long").alias("compatible_pair_cost"),
        "stopword",
    ).orderBy("token")


_ENTRIES_TF_SQL = f"""
    SELECT schema, id, field, token, "count", round(weight, 6) AS weight
    FROM ({_TF_SQL})
    ORDER BY id, field, token
"""


@plan_cache(maxsize=8)
def _er_tf_filtered_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stopword-filtered, IDF-weighted TF relation, built once per
    (session, corpus) and persisted — the reference materializes the
    same relation as a DuckDB table during index build (index.py) and
    every pair/match query reads it; rebuilding (and re-persisting) it
    per call both leaked cache entries and re-paid the build."""
    entries = er_entries(spark, sf_dir)
    # With the folded stats path, token_schema_counts feeds exactly one
    # consumer (the stats map-agg), and stats feeds exactly one (the tf
    # IDF join) — a single linear chain, so nothing here needs a persist.
    stats = build_token_stats(
        entries, er_schemata(spark), MAX_PAIR_COST, schema_pairs=SCHEMATA_PAIRS
    )
    # The stopword anti-join folds into the IDF join (inner join on the
    # non-stopword stats rows both filters and attaches idf — one shuffle
    # of entries instead of two); IDF stays corpus-wide via stats.df.
    # Self-joined by candidate_pairs — materialize so both sides read
    # cached blocks, already hash-partitioned by token (no exchange in
    # the J1 join).
    return term_frequencies(
        entries, boosts_df(spark), token_stats=stats, drop_stopwords=True
    ).persist()


@plan_cache(maxsize=8)
def _er_tsc_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (token, schema) doc-frequency relation, built once per
    (session, corpus) and persisted (reference: the materialized
    ``token_schema_counts`` table, index.py:238-249)."""
    return token_schema_counts(er_entries(spark, sf_dir)).persist()


def q_blocker_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+A5+W2 — dedupe candidate pair generation (the flagship)."""
    return candidate_pairs(
        _er_tf_filtered_cached(spark, sf_dir),
        er_schemata(spark),
        max_pairs=MAX_PAIRS,
        score_decimals=6,
    )


@plan_cache(maxsize=8)
def _er_match_inputs_cached(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(matching_f, tf_all) for the supplier match path, built once per
    (session, corpus) — the reference builds the matching-side stopword
    table and weighted index once per match run, then queries it."""
    entries = er_entries(spark, sf_dir)
    schemata = er_schemata(spark)
    tsc = _er_tsc_cached(spark, sf_dir)
    matching = entries.where(F.col("schema") == "Supplier")
    m_stats = build_matching_token_stats(
        matching,
        entries,
        schemata,
        MAX_MATCH_PAIR_COST,
        indexed_tsc=tsc,
        schema_pairs=SCHEMATA_PAIRS,
        # the matching side is a schema slice of the indexed corpus, so
        # its (token, schema) counts are a FILTER of the persisted tsc —
        # no second entries-wide aggregation
        matching_tsc=tsc.where(F.col("schema") == "Supplier"),
    )
    # persisted like tf_all: the match query reads it per call (join +
    # the token_subset semi-join source), and its lineage re-runs the
    # matching-side stopword stats otherwise (~0.8s of the steady-state
    # match wall); released by plan_cache eviction with the tuple
    matching_f = apply_stopwords(
        matching, stopwords_from_stats(m_stats)
    ).persist()
    # The match join only ever reads index rows whose token appears on
    # the matching side — the IDF relation is restricted to the matching
    # token set and broadcast, so the index's heaviest filter is a
    # map-side join with no shuffle of the index relation (IDF /
    # name-count statistics stay corpus-wide via tsc, so weights are
    # identical to the full relation's).
    tf_all = term_frequencies(
        entries,
        boosts_df(spark),
        tsc=tsc,
        token_subset=matching_f.select("token"),
    ).persist()
    return matching_f, tf_all


def q_blocker_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+W1 — match suppliers (subjects) against the full index."""
    matching_f, tf_all = _er_match_inputs_cached(spark, sf_dir)
    return match_candidates(
        matching_f,
        tf_all,
        er_schemata(spark),
        max_candidates=MAX_CANDIDATES,
        min_score_ratio=MIN_SCORE_RATIO,
        score_decimals=6,
    )


def _pair_featured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocker pairs + SQL-expressible comparison features (shared by the
    X1 heuristic and X3 regression scoring queries)."""
    from nomenklatura_spark.functions import compare as Cmp

    assembled = _assembled_pairs(spark, sf_dir)
    return assembled.select(
        "lid",
        "rid",
        Cmp.name_literal_match(F.col("l_names"), F.col("r_names")).alias(
            "f_name_literal"
        ),
        F.round(
            Cmp.best_name_levenshtein(F.col("l_names"), F.col("r_names")), 6
        ).alias("f_name_levenshtein"),
        Cmp.numbers_mismatch(F.col("l_all_values"), F.col("r_all_values")).alias(
            "f_numbers_mismatch"
        ),
    )


def q_pair_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 + C2/C5/C15 + X1 — score blocker candidate pairs with matcher
    features (literal name match, strict Levenshtein, numbers qualifier)."""
    from nomenklatura_spark.functions.scoring import Feature, heuristic_score

    scored = heuristic_score(
        _pair_featured(spark, sf_dir),
        [
            Feature("f_name_literal", 1.0),
            Feature("f_name_levenshtein", 0.9),
            Feature("f_numbers_mismatch", -0.1, qualifier=True),
        ],
    )
    return scored.select(
        "lid",
        "rid",
        "f_name_literal",
        "f_name_levenshtein",
        "f_numbers_mismatch",
        F.round("score", 6).alias("score"),
    ).orderBy("lid", "rid")


# X3 — a trained logistic model's folded parameters, pinned so the query
# is deterministic and oracle-checkable (training itself is covered by
# matching/train + tests; scoring is pure column arithmetic).
REG_COEFS = {
    "f_name_literal": 4.0,
    "f_name_levenshtein": 3.5,
    "f_numbers_mismatch": -1.5,
}
REG_INTERCEPT = -3.0


def q_pair_scores_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — regression scoring as closed-form column arithmetic:
    ``sigmoid(w·x + b)`` with pinned coefficients (reference ships pickled
    sklearn pipelines, ``regression_v1/model.py:94-110``; folding the
    fitted model into expressions keeps scoring in whole-stage codegen)."""
    from nomenklatura_spark.functions.scoring import logistic_score

    scored = logistic_score(
        _pair_featured(spark, sf_dir), REG_COEFS, REG_INTERCEPT
    )
    return scored.select(
        "lid", "rid", F.round("score", 6).alias("score")
    ).orderBy("lid", "rid")


_PAIR_FEATURED_CTES = f"""
    WITH pairs AS ({_PAIRS_SQL}),
    feats AS (
        SELECT 'part-' || p_partkey AS id, [p_name] AS names,
               [p_name, p_brand, p_type] AS all_values FROM part
        UNION ALL
        SELECT 'customer-' || c_custkey, [c_name], [c_name, c_mktsegment] FROM customer
        UNION ALL
        SELECT 'supplier-' || s_suppkey, [s_name], [s_name] FROM supplier
    ),
    assembled AS (
        SELECT p.lid, p.rid,
               lf.names AS l_names, rf.names AS r_names,
               lf.all_values AS l_all, rf.all_values AS r_all
        FROM pairs p
        JOIN feats lf ON lf.id = p.lid
        JOIN feats rf ON rf.id = p.rid
    ),
    featured AS (
        SELECT lid, rid,
            CASE WHEN len(list_intersect(
                list_distinct(list_transform(l_names, n -> trim(regexp_replace(lower(n), '\\s+', ' ', 'g')))),
                list_distinct(list_transform(r_names, n -> trim(regexp_replace(lower(n), '\\s+', ' ', 'g'))))
            )) > 0 THEN 1.0 ELSE 0.0 END AS f_name_literal,
            round(ifnull(list_max(flatten(list_transform(l_names, ln ->
                list_transform(r_names, rn ->
                    CASE WHEN ln = rn THEN 1.0
                         WHEN floor(greatest(length(ln), length(rn)) / 4) < 1 THEN 0.0
                         WHEN levenshtein(ln, rn) > floor(greatest(length(ln), length(rn)) / 4) THEN 0.0
                         ELSE pow(1.0 - levenshtein(ln, rn) * 1.0 / greatest(length(ln), length(rn)),
                                  floor(greatest(length(ln), length(rn)) / 4))
                    END)))), 0.0), 6) AS f_name_levenshtein,
            CASE WHEN len(list_distinct(flatten(list_transform(l_all, v -> regexp_extract_all(v, '\\d+'))))) > 0
                  AND len(list_distinct(flatten(list_transform(r_all, v -> regexp_extract_all(v, '\\d+'))))) > 0
                  AND len(list_intersect(
                        list_distinct(flatten(list_transform(l_all, v -> regexp_extract_all(v, '\\d+')))),
                        list_distinct(flatten(list_transform(r_all, v -> regexp_extract_all(v, '\\d+'))))
                  )) = 0
            THEN 1.0 ELSE 0.0 END AS f_numbers_mismatch
        FROM assembled
    )
"""

_PAIR_SCORES_SQL = f"""{_PAIR_FEATURED_CTES}
    SELECT lid, rid, f_name_literal, f_name_levenshtein, f_numbers_mismatch,
        round(CASE
            WHEN greatest(f_name_literal * 1.0, f_name_levenshtein * 0.9) <= 0.0 THEN 0.0
            ELSE least(1.0, greatest(0.0,
                greatest(f_name_literal * 1.0, f_name_levenshtein * 0.9)
                + f_numbers_mismatch * -0.1))
        END, 6) AS score
    FROM featured
    ORDER BY lid, rid
"""

_PAIR_SCORES_REG_SQL = f"""{_PAIR_FEATURED_CTES}
    SELECT lid, rid,
        round(1.0 / (1.0 + exp(-({REG_INTERCEPT}
            + {REG_COEFS["f_name_literal"]} * f_name_literal
            + {REG_COEFS["f_name_levenshtein"]} * f_name_levenshtein
            + {REG_COEFS["f_numbers_mismatch"]} * f_numbers_mismatch))), 6) AS score
    FROM featured
    ORDER BY lid, rid
"""


# P1 thresholds (reference xref.py:131-154: score >= auto → decide
# POSITIVE, >= suggest threshold → candidate for human review).
XREF_AUTO_THRESHOLD = 0.9
XREF_REVIEW_THRESHOLD = 0.7


def q_xref_suggestions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — the xref decision split, end-to-end: blocker pairs → feature
    scoring → threshold split into auto-merges and review suggestions
    (the batch form of the reference's suggest/decide loop)."""
    scored = q_pair_scores(spark, sf_dir).select("lid", "rid", "score")
    decision = (
        F.when(F.col("score") >= XREF_AUTO_THRESHOLD, F.lit("auto_merge"))
        .when(F.col("score") >= XREF_REVIEW_THRESHOLD, F.lit("review"))
    )
    return (
        scored.withColumn("decision", decision)
        .where(F.col("decision").isNotNull())
        .orderBy("lid", "rid")
    )


_XREF_SUGGESTIONS_SQL = f"""
    SELECT lid, rid, score,
        CASE WHEN score >= {XREF_AUTO_THRESHOLD} THEN 'auto_merge'
             ELSE 'review' END AS decision
    FROM ({_PAIR_SCORES_SQL})
    WHERE score >= {XREF_REVIEW_THRESHOLD}
    ORDER BY lid, rid
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups by content hash (bag-of-words fingerprint so the
    synthetic corpus, which has no byte-exact dups, still exercises it)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", doc_fingerprint(F.col("text")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("canonical_id"))
        .orderBy("h")
    )


_DEDUP_EXACT_SQL = f"""
    SELECT md5(array_to_string(list_sort(list_distinct({_DOC_WORDS})), ' ')) AS h,
           count(*) AS n_dups,
           min(doc_id) AS canonical_id
    FROM documents
    GROUP BY 1
    ORDER BY h
"""


def q_dedup_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard near-duplicate pairs."""
    return _spark_ngram_pairs(spark, sf_dir).orderBy("lid", "rid")


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs containing >= 50% of a
    benchmark item's word 5-grams (benchmark set = doc_id % 50 == 0,
    standing in for an eval suite). Bench shingles broadcast — the corpus
    side never shuffles."""
    from nomenklatura_spark.dedup.ngram import ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    hits = ngram_containment_pairs(
        docs, bench, "doc_id", "text", k=5, threshold=0.5, mode="word"
    )
    return hits.select(
        "doc_id", "bench_id", F.round("containment", 6).alias("containment")
    ).orderBy("doc_id", "bench_id")


_DECONTAM_SQL = f"""
    WITH ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    grams AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(w) - 4, 0)),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS sh
        FROM ws
    ),
    bench AS (
        SELECT doc_id AS bench_id, sh FROM grams WHERE doc_id % 50 = 0
    ),
    bsizes AS (SELECT bench_id, count(*) AS n_bench FROM bench GROUP BY bench_id),
    hits AS (
        SELECT g.doc_id, b.bench_id, count(*) AS n_common
        FROM grams g JOIN bench b ON g.sh = b.sh
        WHERE g.doc_id != b.bench_id
        GROUP BY g.doc_id, b.bench_id
    )
    SELECT h.doc_id, h.bench_id,
           round(h.n_common * 1.0 / s.n_bench, 6) AS containment
    FROM hits h JOIN bsizes s USING (bench_id)
    WHERE h.n_common * 1.0 / s.n_bench >= 0.5
    ORDER BY doc_id, bench_id
"""


def q_doc_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side Bloom decontamination — the 100 TB scale path for
    `doc_decontaminate`.  Bench set = doc_id % 50 == 0 (standing in for
    an eval suite), corpus = the rest; the bench's word 5-grams are
    packed into a 2^17-bit / 3-hash Bloom filter broadcast as one
    array<bigint> row, and every corpus document's verdict is a single
    projection over the documents scan — no corpus-side join or
    shuffle.  The DuckDB oracle replays the bit positions relationally,
    so the filter's (deterministic) collision behavior is value-checked,
    and tests/test_bloom.py pins the no-false-negative guarantee against
    the exact broadcast-join operator."""
    from nomenklatura_spark.dedup.bloom import bench_bloom, bloom_contamination

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    bloom = bench_bloom(bench, "doc_id", "text", k=5, mode="word")
    out = bloom_contamination(corpus, bloom, "doc_id", "text", k=5, mode="word")
    return out.select(
        F.col("id").alias("doc_id"),
        "n_shingles",
        "n_hits",
        "hit_frac",
        "contaminated",
    ).orderBy("doc_id")


_DECONTAM_BLOOM_SQL = f"""
    WITH ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    grams AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(w) - 4, 0)),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS sh
        FROM ws
    ),
    seeds AS (SELECT unnest(generate_series(0, 2)) AS seed),
    bpos AS (
        SELECT DISTINCT
            CAST(('0x' || substr(md5(seed::VARCHAR || ':' || sh), 1, 15)) AS BIGINT)
                % 131072 AS pos
        FROM grams, seeds WHERE doc_id % 50 = 0
    ),
    probe AS (
        SELECT g.doc_id, g.sh,
            CAST(('0x' || substr(md5(s.seed::VARCHAR || ':' || g.sh), 1, 15)) AS BIGINT)
                % 131072 AS pos
        FROM grams g, seeds s WHERE g.doc_id % 50 != 0
    ),
    shhit AS (
        SELECT doc_id, sh, bool_and(b.pos IS NOT NULL) AS hit
        FROM probe p LEFT JOIN bpos b USING (pos)
        GROUP BY doc_id, sh
    ),
    per AS (
        SELECT doc_id, count(*) AS n_shingles,
               count(*) FILTER (WHERE hit) AS n_hits
        FROM shhit GROUP BY doc_id
    )
    SELECT d.doc_id,
        CAST(COALESCE(p.n_shingles, 0) AS INT) AS n_shingles,
        CAST(COALESCE(p.n_hits, 0) AS INT) AS n_hits,
        CASE WHEN COALESCE(p.n_shingles, 0) > 0
             THEN round(p.n_hits * 1.0 / p.n_shingles, 6) ELSE 0.0 END AS hit_frac,
        COALESCE(p.n_hits, 0) >= 1 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 50 != 0) d
    LEFT JOIN per p USING (doc_id)
    ORDER BY doc_id
"""


def q_doc_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negative sampling
    (``textops/contrastive.sample_negative_pairs``): 5 deterministic
    uniform negatives per anchor document from a 64-document broadcast
    candidate pool, excluding the anchor itself and same-``source``
    candidates (the false-negative guard) — the (anchor, negative)
    pair feed a bi-encoder trainer consumes.  Pool selection and
    per-(anchor, candidate) ranking both ride the engine-stable md5
    device, so the oracle replays the exact pair set; the broadcast
    join keeps each anchor's candidates in one task, WindowGroupLimit
    ships k rows per anchor, and the corpus is never shuffled."""
    from nomenklatura_spark.textops.contrastive import (
        sample_negative_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sample_negative_pairs(
        docs, k=5, pool_size=64, group_col="source"
    ).orderBy("anchor_id", "neg_rank")


_DOC_NEGATIVES_SQL = """
    WITH pool AS (
        SELECT doc_id AS neg_id, source AS neg_src
        FROM documents
        ORDER BY CAST(('0x' || substr(md5('negpair:pool:'
                   || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                 doc_id
        LIMIT 64
    ),
    ranked AS (
        SELECT d.doc_id AS anchor_id, p.neg_id AS negative_id,
               row_number() OVER (
                   PARTITION BY d.doc_id
                   ORDER BY CAST(('0x' || substr(md5('negpair:'
                       || CAST(d.doc_id AS VARCHAR) || '|'
                       || CAST(p.neg_id AS VARCHAR)), 1, 15)) AS BIGINT),
                       p.neg_id
               ) AS neg_rank
        FROM documents d
        JOIN pool p ON p.neg_id <> d.doc_id
                   AND p.neg_src IS DISTINCT FROM d.source
    )
    SELECT anchor_id, negative_id, neg_rank
    FROM ranked WHERE neg_rank <= 5
    ORDER BY anchor_id, neg_rank
"""


def q_doc_negatives_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sampling with the candidate POOL served from maintained
    state: the pool — the one corpus-derived artifact in negative
    sampling — is exactly a uniform min-k draw (k smallest
    ``md5('negpair:pool:'||id)`` keys), i.e. the maintained sample
    index (``streaming/sample_index.py``) at weight 1 with that salt.
    Documents fold into the pool index in three id-sliced batches; at
    serve time the 64-row pool reads from state (collected to a literal
    — it IS broadcast-sized), joins its ``source`` group tags, and the
    per-anchor md5 ranking runs as in ``doc_negatives``.  The oracle is
    the from-scratch pool + ranking, so hash-green proves the
    maintained pool is bit-identical to the batch draw.  Completes the
    at-rest contrastive feed beside ``doc_positives_served``."""
    import shutil
    import tempfile

    from nomenklatura_spark.streaming.sample_index import SampleIndexState
    from nomenklatura_spark.textops.contrastive import (
        sample_negative_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="nk_negpool_idx_")
    try:
        state = SampleIndexState(spark, root, k=64, salt="negpair:pool")
        prof = _fold_serve("doc_negatives_served")
        for b in range(3):
            with prof.fold():
                state.apply_batch(
                    docs.where(F.col("doc_id") % 3 == b), F.lit(1)
                )
        # "serve" here is only the state read of the pool — the
        # per-anchor ranking below runs lazily in the returned frame
        with prof.serve():
            pool_rows = (
                state.sample()
                .select(F.col("id").cast("bigint").alias("doc_id"))
                .collect()
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    pool = spark.createDataFrame(pool_rows, "doc_id bigint").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return sample_negative_pairs(
        docs, k=5, pool_size=64, group_col="source", pool=pool
    ).orderBy("anchor_id", "neg_rank")


# the pool CTE ties by the INDEX's string id (never fires on 60-bit md5
# keys, pinned for exactness-by-construction); ranking replays
# _DOC_NEGATIVES_SQL
_DOC_NEGATIVES_SERVED_SQL = """
    WITH pool AS (
        SELECT doc_id AS neg_id, source AS neg_src
        FROM documents
        ORDER BY CAST(('0x' || substr(md5('negpair:pool:'
                   || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                 CAST(doc_id AS VARCHAR)
        LIMIT 64
    ),
    ranked AS (
        SELECT d.doc_id AS anchor_id, p.neg_id AS negative_id,
               row_number() OVER (
                   PARTITION BY d.doc_id
                   ORDER BY CAST(('0x' || substr(md5('negpair:'
                       || CAST(d.doc_id AS VARCHAR) || '|'
                       || CAST(p.neg_id AS VARCHAR)), 1, 15)) AS BIGINT),
                       p.neg_id
               ) AS neg_rank
        FROM documents d
        JOIN pool p ON p.neg_id <> d.doc_id
                   AND p.neg_src IS DISTINCT FROM d.source
    )
    SELECT anchor_id, negative_id, neg_rank
    FROM ranked WHERE neg_rank <= 5
    ORDER BY anchor_id, neg_rank
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — connected components over the near-dup pair graph."""
    pairs = _spark_ngram_pairs(spark, sf_dir)
    comps = connected_components(pairs, src="lid", dst="rid")
    return comps.orderBy("node")


_DEDUP_COMPONENTS_SQL = f"""
    WITH RECURSIVE {_COMPONENT_WALK_SQL_BODY}
    SELECT node, min(reached) AS component
    FROM walk GROUP BY node ORDER BY node
"""


def q_doc_positives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive POSITIVE pairs
    (``textops/contrastive.build_positive_pairs``): up to 2 positives
    per anchor from its near-dup component — the transitive closure of
    the memoized pair graph, so quote-chains yield pairs no direct
    edge scored — ranked by the engine-stable md5 device.  Completes
    the contrastive feed beside ``doc_negatives`` (uniform pool) and
    ``doc_hard_negatives`` (ANN neighbors); the giant-component
    self-join bound is an executable ValueError contract.  The oracle
    replays the recursive-CTE closure, the same md5 ranking and the
    same cut."""
    from nomenklatura_spark.resolver.components import (
        connected_components,
    )
    from nomenklatura_spark.textops.contrastive import (
        build_positive_pairs,
    )

    pairs = _spark_ngram_pairs(spark, sf_dir)
    comps = connected_components(pairs, src="lid", dst="rid")
    return build_positive_pairs(comps, k=2).orderBy(
        "anchor_id", "pos_rank"
    )


_DOC_POSITIVES_SQL = f"""
    WITH RECURSIVE {_COMPONENT_WALK_SQL_BODY},
    comp AS (
        SELECT node, min(reached) AS component
        FROM walk GROUP BY node
    ),
    cand AS (
        SELECT a.node AS anchor_id, b.node AS positive_id,
               row_number() OVER (
                   PARTITION BY a.node
                   ORDER BY CAST(('0x' || substr(md5('pospair:'
                       || CAST(a.node AS VARCHAR) || '|'
                       || CAST(b.node AS VARCHAR)), 1, 15)) AS BIGINT),
                       b.node
               ) AS pos_rank
        FROM comp a
        JOIN comp b ON b.component = a.component
                   AND b.node <> a.node
    )
    SELECT anchor_id, positive_id, pos_rank
    FROM cand WHERE pos_rank <= 2
    ORDER BY anchor_id, pos_rank
"""


def q_doc_positives_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contrastive positive feed served from MAINTAINED near-dup
    components (``streaming/dedup_index.py``): documents fold into the
    incremental MinHash-LSH index in three id-sliced ingest batches,
    each fold merging the new pairs into the component mapping by
    star-compression (append-only pairs merge, never split — G10
    without the rebuild case, O(state + batch) per fold), and the
    (anchor, positive, rank) feed is answered from state alone.  The
    oracle replays the WHOLE chain from scratch — MinHash signatures,
    LSH bands, the est-jaccard threshold, the recursive-CTE transitive
    closure and the md5 positive ranking — so a hash-green row proves
    incremental == rescan-everything end-to-end.  Ids ride as strings
    in state (index contract) and cast back at the serving edge."""
    import shutil
    import tempfile

    from nomenklatura_spark.streaming.dedup_index import DedupIndexState

    docs = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="nk_dedup_idx_")
    try:
        state = DedupIndexState(spark, root)
        prof = _fold_serve("doc_positives_served")
        for b in range(3):
            with prof.fold():
                state.apply_batch(
                    docs.where(F.col("doc_id") % 3 == b), "doc_id", "text"
                )
        out = (
            state.serve_positive_pairs(k=2)
            .select(
                F.col("anchor_id").cast("bigint").alias("anchor_id"),
                F.col("positive_id").cast("bigint").alias("positive_id"),
                "pos_rank",
            )
            .orderBy("anchor_id", "pos_rank")
        )
        # driver-materialize (feed-grain rows) before dropping the
        # on-disk state — see events_hll_weekly_served
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keywords
    (``textops/analysis.doc_keywords``): each document's top-3 terms by
    ``tf * ln(1 + N/df)``, 6dp-rounded before the rank — the per-doc
    sibling of the c-TF-IDF cluster labels, i.e. the searchable topic
    tags a curated corpus ships per document."""
    from nomenklatura_spark.textops.analysis import doc_keywords

    docs = load_table(spark, sf_dir, "documents")
    return doc_keywords(docs, "doc_id", "text", top_k=3).orderBy(
        "doc_id", "rank"
    )


_DOC_KEYWORDS_SQL = f"""
    WITH tok AS (
        SELECT doc_id, unnest({_DOC_WORDS}) AS w FROM documents
    ),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
    scored AS (
        SELECT t.doc_id, t.w, t.tf,
               round(t.tf * ln(1 + n.n * 1.0 / d.df), 6) AS score
        FROM tf t JOIN dfreq d USING (w), n
    ),
    rk AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, w) AS rank
        FROM scored
    )
    SELECT doc_id, CAST(rank AS INT) AS rank, w AS word, tf, score
    FROM rk WHERE rank <= 3 ORDER BY doc_id, rank
"""


def q_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise clustering evaluation (``dedup/eval.py``): the near-dup
    components (predicted clustering, singletons = own doc) scored
    against the bag-of-words fingerprint groups (gold labeling) by
    pairwise precision / recall / F1 — the number a pipeline team
    actually reads when re-tuning an LSH threshold.  Counts come from
    cluster-size aggregates alone (sum of C(n,2) over gold / pred /
    contingency cells), so the quadratic pair space is never
    materialized; the oracle replays the identical identity in SQL."""
    from nomenklatura_spark.dedup.eval import pairwise_cluster_metrics
    from nomenklatura_spark.resolver.components import connected_components
    from nomenklatura_spark.textops.analysis import doc_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    comps = connected_components(
        _spark_ngram_pairs(spark, sf_dir), src="lid", dst="rid"
    ).withColumnRenamed("node", "doc_id")
    labels = (
        docs.select("doc_id", doc_fingerprint(F.col("text")).alias("gold"))
        .join(comps, "doc_id", "left")
        .select(
            "doc_id",
            "gold",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("pred"),
        )
    )
    return pairwise_cluster_metrics(labels)


# pairwise + BCubed metrics over a `lab(g, p)` CTE — shared by the text
# and media dedup-eval oracles (engine: dedup/eval.py)
_CLUSTER_METRICS_TAIL_SQL = """
    gs AS (SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT)
               AS gold_pairs
           FROM (SELECT count(*) AS n FROM lab GROUP BY g)),
    ps AS (SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT)
               AS pred_pairs
           FROM (SELECT count(*) AS n FROM lab GROUP BY p)),
    ts AS (SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT)
               AS tp_pairs
           FROM (SELECT count(*) AS n FROM lab GROUP BY g, p)),
    bq AS (
        SELECT sum((CAST(cell.n AS HUGEINT) * cell.n * 1000000000000)
                   // pp.pn) AS bpq,
               sum((CAST(cell.n AS HUGEINT) * cell.n * 1000000000000)
                   // gg.gn) AS brq,
               sum(cell.n) AS nn
        FROM (SELECT g, p, count(*) AS n FROM lab GROUP BY g, p) cell
        JOIN (SELECT g, count(*) AS gn FROM lab GROUP BY g) gg USING (g)
        JOIN (SELECT p, count(*) AS pn FROM lab GROUP BY p) pp USING (p)
    )
    SELECT tp_pairs, gold_pairs, pred_pairs,
           CASE WHEN pred_pairs > 0
                THEN round(tp_pairs * 1.0 / pred_pairs, 6)
                ELSE 0.0 END AS pair_precision,
           CASE WHEN gold_pairs > 0
                THEN round(tp_pairs * 1.0 / gold_pairs, 6)
                ELSE 0.0 END AS pair_recall,
           CASE WHEN gold_pairs + pred_pairs > 0
                THEN round(2.0 * tp_pairs / (gold_pairs + pred_pairs), 6)
                ELSE 0.0 END AS pair_f1,
           round(CAST(bpq AS DOUBLE) / (nn * 1e12), 6)
               AS bcubed_precision,
           round(CAST(brq AS DOUBLE) / (nn * 1e12), 6) AS bcubed_recall,
           CASE WHEN CAST(bpq AS DOUBLE) + CAST(brq AS DOUBLE) > 0
                THEN round(2 * (CAST(bpq AS DOUBLE) / (nn * 1e12))
                             * (CAST(brq AS DOUBLE) / (nn * 1e12))
                           / (CAST(bpq AS DOUBLE) / (nn * 1e12)
                              + CAST(brq AS DOUBLE) / (nn * 1e12)), 6)
                ELSE 0.0 END AS bcubed_f1
    FROM ts, gs, ps, bq
"""

_DEDUP_EVAL_SQL = f"""
    WITH RECURSIVE {_COMPONENT_WALK_SQL_BODY},
    comp AS (SELECT node, min(reached) AS component FROM walk GROUP BY node),
    lab AS (
        SELECT d.doc_id,
               md5(array_to_string(list_sort(list_distinct({_DOC_WORDS})),
                   ' ')) AS g,
               coalesce(c.component, d.doc_id) AS p
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    {_CLUSTER_METRICS_TAIL_SQL}
"""


def q_graph_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-mean feature smoothing
    (``operators/graph.neighbor_mean_features``): two rounds of
    integer-exact mean aggregation of account balances (cents) over
    the symmetrized customer↔supplier trade graph — the
    feature-propagation layer a graph-feature training pipeline runs
    before sampling rows (one round = a weightless mean-aggregator GNN
    layer).  Per round one src-keyed join + partial-agg sum; the
    up-front overflow contract bounds hub numerators; the oracle
    unrolls both rounds as CTEs on the same grid."""
    from nomenklatura_spark.operators.graph import neighbor_mean_features

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    trade = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edges = trade.union(
        trade.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    feats = customer.select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("node"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("value"),
    ).unionByName(
        supplier.select(
            F.concat(F.lit("s"), F.col("s_suppkey")).alias("node"),
            F.round(F.col("s_acctbal") * 100)
            .cast("bigint")
            .alias("value"),
        )
    )
    return neighbor_mean_features(edges, feats, n_rounds=2).orderBy(
        "node"
    )


_GRAPH_FEATURES_SQL = """
    WITH trade AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT src, dst FROM trade
        UNION ALL
        SELECT dst, src FROM trade
    ),
    f0 AS (
        SELECT 'c' || c_custkey AS node,
               CAST(round(c_acctbal * 100) AS BIGINT) AS v
        FROM customer
        UNION ALL
        SELECT 's' || s_suppkey,
               CAST(round(s_acctbal * 100) AS BIGINT)
        FROM supplier
    ),
    a1 AS (
        SELECT e.dst AS node, sum(f.v) AS s, count(*) AS c
        FROM edges e JOIN f0 f ON f.node = e.src GROUP BY e.dst
    ),
    f1 AS (
        SELECT f.node,
               CAST(CASE WHEN a.s IS NULL THEN f.v
                    ELSE (f.v + a.s) // (1 + a.c) END AS BIGINT) AS v
        FROM f0 f LEFT JOIN a1 a USING (node)
    ),
    a2 AS (
        SELECT e.dst AS node, sum(f.v) AS s, count(*) AS c
        FROM edges e JOIN f1 f ON f.node = e.src GROUP BY e.dst
    ),
    f2 AS (
        SELECT f.node,
               CAST(CASE WHEN a.s IS NULL THEN f.v
                    ELSE (f.v + a.s) // (1 + a.c) END AS BIGINT) AS v
        FROM f1 f LEFT JOIN a2 a USING (node)
    )
    SELECT node, CAST(v AS BIGINT) AS feat FROM f2 ORDER BY node
"""


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank over the customer↔supplier trade
    graph (distinct (customer, supplier) pairs from orders ⋈ lineitem,
    symmetrized) — the centrality prior a curation pipeline puts on a
    web/host graph, and the xref-queue importance ranking for the ER
    entity graph.  Exact BIGINT micro-unit arithmetic (operators/
    graph.py) lets DuckDB replay all 5 iterations as unrolled CTEs
    bit-identically."""
    from nomenklatura_spark.operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    trade = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
    )
    edges = trade.union(
        trade.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank(edges, n_iter=5).orderBy("node")


def _pagerank_sql(n_iter: int = 5, scale: int = 1_000_000_000) -> str:
    base = scale * 3 // 20
    ctes = [
        f"""trade AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (SELECT src, dst FROM trade UNION SELECT dst, src FROM trade),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rq FROM nodes)"""
    ]
    for t in range(1, n_iter + 1):
        ctes.append(
            f"""c{t} AS (
        SELECT e.dst AS node, sum(r.rq // d.odeg) AS inflow
        FROM r{t - 1} r JOIN edges e ON e.src = r.node JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ),
    dg{t} AS (
        SELECT COALESCE(sum(r.rq), 0) AS ds
        FROM r{t - 1} r LEFT JOIN deg d ON d.src = r.node WHERE d.src IS NULL
    ),
    r{t} AS (
        SELECT nd.node,
               CAST({base} + (17 * (COALESCE(c.inflow, 0)
                   + (SELECT ds FROM dg{t}) // (SELECT n FROM nn))) // 20
                   AS BIGINT) AS rq
        FROM nodes nd LEFT JOIN c{t} c USING (node)
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, rq AS rank_q, round(rq / {scale}.0, 6) AS rank
    FROM r{n_iter} ORDER BY node"""
    )


def q_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the trade graph: teleport mass pinned
    to a seed set (suppliers with suppkey % 20 == 0 — standing in for a
    sanctions list), so ranks measure graph proximity to the seeds —
    the ER lead-prioritization ranking.  Same exact-integer recurrence
    as `graph_pagerank`, replayed by unrolled DuckDB CTEs."""
    from nomenklatura_spark.operators.graph import personalized_pagerank

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    trade = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
    )
    edges = trade.union(
        trade.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        lineitem.where(F.col("l_suppkey") % 20 == 0)
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).alias("node"))
        .distinct()
    )
    return personalized_pagerank(edges, seeds).orderBy("node")


def _ppr_sql(n_iter: int = 5, scale: int = 1_000_000_000) -> str:
    ctes = [
        f"""trade AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (SELECT src, dst FROM trade UNION SELECT dst, src FROM trade),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
    seeds AS (
        SELECT DISTINCT 's' || l_suppkey AS node FROM lineitem
        WHERE l_suppkey % 20 = 0
    ),
    marked AS (
        SELECT n.node, s.node IS NOT NULL AS is_seed
        FROM nodes n LEFT JOIN seeds s USING (node)
    ),
    nn AS (SELECT count(*) AS n FROM nodes),
    ns AS (SELECT count(*) AS k FROM marked WHERE is_seed),
    sb AS (
        SELECT (({scale} * n * 3) // 20) // k AS v FROM nn, ns
    ),
    r0 AS (SELECT node, is_seed, CAST({scale} AS BIGINT) AS rq FROM marked)"""
    ]
    for t in range(1, n_iter + 1):
        ctes.append(
            f"""c{t} AS (
        SELECT e.dst AS node, sum(r.rq // d.odeg) AS inflow
        FROM r{t - 1} r JOIN edges e ON e.src = r.node JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ),
    dg{t} AS (
        SELECT COALESCE(sum(r.rq), 0) AS ds
        FROM r{t - 1} r LEFT JOIN deg d ON d.src = r.node WHERE d.src IS NULL
    ),
    r{t} AS (
        SELECT m.node, m.is_seed,
               CAST((CASE WHEN m.is_seed THEN (SELECT v FROM sb) ELSE 0 END)
                   + (17 * (COALESCE(c.inflow, 0)
                       + CASE WHEN m.is_seed
                         THEN (SELECT ds FROM dg{t}) // (SELECT k FROM ns)
                         ELSE 0 END)) // 20
                   AS BIGINT) AS rq
        FROM marked m LEFT JOIN c{t} c USING (node)
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, is_seed, rq AS rank_q, round(rq / {scale}.0, 6) AS rank
    FROM r{n_iter} ORDER BY node"""
    )


def q_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded label propagation over the trade graph: two competing
    seed sets ('flagged' suppliers at suppkey%20==0, 'vetted' at ==10)
    pull the unlabeled middle by 3 rounds of neighbor majority vote —
    the ER risk-propagation step (PPR ranks proximity to ONE seed set;
    this ASSIGNS the label of the winning set, with the vote count as
    confidence).  Deterministic: integer votes, ties by label; the
    oracle replays every round as materialized CTEs."""
    from nomenklatura_spark.operators.graph import label_propagation

    trade, seeds = _label_prop_inputs(spark, sf_dir)
    return label_propagation(trade, seeds, n_rounds=3).orderBy("node")


def _label_prop_inputs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The trade graph + competing seed sets shared by the
    ``graph_label_prop`` registry row and the bench scaling probe (the
    probe replicates both relations onto disjoint id spaces, so it
    measures the operator, not graph densification)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    trade = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
    )
    seeds = (
        lineitem.where((F.col("l_suppkey") % 20).isin(0, 10))
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("node"),
            F.when(F.col("l_suppkey") % 20 == 0, F.lit("flagged"))
            .otherwise(F.lit("vetted"))
            .alias("label"),
        )
        .distinct()
    )
    return trade, seeds


def _label_prop_sql(n_rounds: int = 3) -> str:
    ctes = [
        """trade AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    und AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM trade WHERE src <> dst
    ),
    sym AS MATERIALIZED (
        SELECT a AS s, b AS d FROM und UNION ALL SELECT b AS s, a AS d FROM und
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM sym),
    seeds0 AS (
        SELECT DISTINCT 's' || l_suppkey AS node,
            CASE WHEN l_suppkey % 20 = 0 THEN 'flagged'
                 ELSE 'vetted' END AS label
        FROM lineitem WHERE l_suppkey % 20 IN (0, 10)
    ),
    seeds AS MATERIALIZED (
        SELECT s.node, s.label FROM seeds0 s JOIN nodes n USING (node)
    ),
    lab0 AS MATERIALIZED (SELECT node, label FROM seeds)"""
    ]
    for t in range(1, n_rounds + 1):
        ctes.append(
            f"""v{t} AS MATERIALIZED (
        SELECT e.s AS node, l.label, COUNT(*) AS c
        FROM sym e JOIN lab{t - 1} l ON l.node = e.d
        GROUP BY 1, 2
    ),
    w{t} AS MATERIALIZED (
        SELECT node, label, c FROM (
            SELECT *, row_number() OVER (
                PARTITION BY node ORDER BY c DESC, label) AS rn
            FROM v{t}
        ) WHERE rn = 1
    ),
    lab{t} AS MATERIALIZED (
        SELECT node, label FROM seeds
        UNION ALL
        SELECT w.node, w.label FROM w{t} w
        WHERE w.node NOT IN (SELECT node FROM seeds)
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT n.node,
        COALESCE(l.label, '(none)') AS label,
        CAST(CASE WHEN sd.node IS NOT NULL OR l.label IS NULL THEN 0
             ELSE COALESCE(w.c, 0) END AS BIGINT) AS votes,
        (sd.node IS NOT NULL) AS is_seed
    FROM nodes n
    LEFT JOIN lab{n_rounds} l USING (node)
    LEFT JOIN seeds sd ON sd.node = n.node
    LEFT JOIN w{n_rounds} w ON w.node = n.node
    ORDER BY n.node"""
    )


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    part co-occurrence graph (parts sharing an order) — the transitivity
    diagnostic for any candidate-pair graph: coherent duplicate clusters
    have high clustering, stopword-like hubs bridge unrelated nodes at
    clustering ~0.  Degree-ordered wedge algorithm, pure equi-joins
    (operators/graph.triangle_counts); the oracle replays the same
    orientation relationally."""
    from nomenklatura_spark.operators.graph import triangle_counts

    # deterministic 20% order slice (_tri_part_pairs): the wedge volume
    # of a co-occurrence graph grows with degree^2, so the diagnostic
    # row bounds its INPUT (a fixed orderkey slice), not the algorithm —
    # the operator itself is the full degree-ordered plan at any density
    return triangle_counts(_tri_part_pairs(spark, sf_dir)).orderBy("node")


_GRAPH_TRIANGLES_SQL = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                WHERE l_orderkey % 5 = 0),
    und AS (
        SELECT DISTINCT
            least(x.l_partkey, y.l_partkey) AS a,
            greatest(x.l_partkey, y.l_partkey) AS b
        FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
        WHERE x.l_partkey < y.l_partkey
    ),
    deg AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
        ) GROUP BY node
    ),
    ori AS (
        SELECT CASE WHEN fwd THEN a ELSE b END AS u,
               CASE WHEN fwd THEN b ELSE a END AS v,
               CASE WHEN fwd THEN db ELSE da END AS dv
        FROM (
            SELECT u2.a, u2.b, da.degree AS da, db.degree AS db,
                   (da.degree < db.degree
                    OR (da.degree = db.degree AND u2.a < u2.b)) AS fwd
            FROM und u2
            JOIN deg da ON da.node = u2.a
            JOIN deg db ON db.node = u2.b
        )
    ),
    wedges AS (
        SELECT e1.u, e1.v AS x, e2.v AS y
        FROM ori e1 JOIN ori e2 ON e1.u = e2.u
        WHERE e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v)
    ),
    tri AS (
        SELECT w.u, w.x, w.y
        FROM wedges w JOIN ori c ON c.u = w.x AND c.v = w.y
    ),
    corners AS (
        SELECT node, COUNT(*) AS triangles FROM (
            SELECT u AS node FROM tri
            UNION ALL SELECT x AS node FROM tri
            UNION ALL SELECT y AS node FROM tri
        ) GROUP BY node
    )
    SELECT d.node, d.degree,
           CAST(COALESCE(c.triangles, 0) AS BIGINT) AS triangles,
           CASE WHEN d.degree >= 2
                THEN round(2.0 * COALESCE(c.triangles, 0)
                           / (d.degree * (d.degree - 1)), 4)
                ELSE 0.0 END AS clustering
    FROM deg d LEFT JOIN corners c USING (node)
    ORDER BY node
"""


def _tri_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded part co-occurrence graph shared by the triangle and
    k-core diagnostics: distinct (part, part) pairs within a
    deterministic 20% order slice."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    return (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("src"),
            F.col("y.l_partkey").alias("dst"),
        )
    )


def q_graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact strongly connected components
    (``operators/graph.strongly_connected_components``) over a directed
    supplier hand-off graph: within each order, supplier of line n
    points at supplier of line n+1; edges are md5-sparsified to 2% so
    the condensation has real structure (sf0.01: ~99 nodes, ~37 SCCs).
    The condensation pass a link graph needs before PageRank — crawler
    traps and link farms ARE the big SCCs — and the ownership-cycle
    detector for the ER relationship graph.  The DuckDB oracle computes
    the recursive-CTE reachability closure and labels each node with
    ``max({v} ∪ {u : v ->* u AND u ->* v})``, which the coloring
    algorithm provably matches (max-member labeling invariant)."""
    from nomenklatura_spark.operators.graph import (
        strongly_connected_components,
    )
    from nomenklatura_spark.functions.hashing import md5_bucket

    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_linenumber", F.col("l_suppkey").alias("s"))
    l2 = li.select(
        "l_orderkey",
        (F.col("l_linenumber") - 1).alias("l_linenumber"),
        F.col("l_suppkey").alias("d"),
    )
    chain = l1.join(l2, ["l_orderkey", "l_linenumber"]).where(
        F.col("s") != F.col("d")
    )
    key = F.concat(
        F.col("s").cast("string"), F.lit(">"), F.col("d").cast("string")
    )
    edges = chain.where(md5_bucket("scc", key, 100) < 2).select(
        F.col("s").alias("src"), F.col("d").alias("dst")
    )
    return strongly_connected_components(edges).orderBy("node")


def q_graph_condense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The condensation DAG over the same sparsified supplier hand-off
    graph as ``graph_scc`` (``operators/graph.condense_graph``): every
    SCC contracted to its max-member label, distinct inter-SCC edges
    kept — acyclic by construction, the graph a topological pass
    actually runs on.  The oracle contracts through the same
    recursive-closure SCC labels."""
    from nomenklatura_spark.operators.graph import (
        condense_graph,
        strongly_connected_components,
    )
    from nomenklatura_spark.functions.hashing import md5_bucket

    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_linenumber", F.col("l_suppkey").alias("s"))
    l2 = li.select(
        "l_orderkey",
        (F.col("l_linenumber") - 1).alias("l_linenumber"),
        F.col("l_suppkey").alias("d"),
    )
    chain = l1.join(l2, ["l_orderkey", "l_linenumber"]).where(
        F.col("s") != F.col("d")
    )
    key = F.concat(
        F.col("s").cast("string"), F.lit(">"), F.col("d").cast("string")
    )
    edges = chain.where(md5_bucket("scc", key, 100) < 2).select(
        F.col("s").alias("src"), F.col("d").alias("dst")
    )
    scc = strongly_connected_components(edges).localCheckpoint(eager=True)
    return condense_graph(edges, scc).orderBy("scc_src", "scc_dst")


_GRAPH_CONDENSE_SQL = """
    WITH RECURSIVE chain AS (
        SELECT l1.l_suppkey AS s, l2.l_suppkey AS d
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l2.l_linenumber = l1.l_linenumber + 1
        WHERE l1.l_suppkey <> l2.l_suppkey
    ),
    e AS (
        SELECT DISTINCT s, d FROM chain
        WHERE CAST(('0x' || substr(md5('scc:' || s || '>' || d), 1, 15))
            AS BIGINT) % 100 < 2
    ),
    reach(a, b) AS (
        SELECT s, d FROM e
        UNION
        SELECT r.a, e2.d FROM reach r JOIN e e2 ON e2.s = r.b
    ),
    nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
    mutual AS (
        SELECT r1.a AS v, r1.b AS u
        FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
    ),
    scc AS (
        SELECT n.node,
               GREATEST(n.node, COALESCE(MAX(m.u), n.node)) AS scc_id
        FROM nodes n LEFT JOIN mutual m ON m.v = n.node
        GROUP BY n.node
    )
    SELECT DISTINCT sa.scc_id AS scc_src, sb.scc_id AS scc_dst
    FROM e
    JOIN scc sa ON sa.node = e.s
    JOIN scc sb ON sb.node = e.d
    WHERE sa.scc_id <> sb.scc_id
    ORDER BY scc_src, scc_dst
"""


_GRAPH_SCC_SQL = """
    WITH RECURSIVE chain AS (
        SELECT l1.l_suppkey AS s, l2.l_suppkey AS d
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l2.l_linenumber = l1.l_linenumber + 1
        WHERE l1.l_suppkey <> l2.l_suppkey
    ),
    e AS (
        SELECT DISTINCT s, d FROM chain
        WHERE CAST(('0x' || substr(md5('scc:' || s || '>' || d), 1, 15))
            AS BIGINT) % 100 < 2
    ),
    reach(a, b) AS (
        SELECT s, d FROM e
        UNION
        SELECT r.a, e2.d FROM reach r JOIN e e2 ON e2.s = r.b
    ),
    nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
    mutual AS (
        SELECT r1.a AS v, r1.b AS u
        FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
    )
    SELECT n.node,
           GREATEST(n.node, COALESCE(MAX(m.u), n.node)) AS scc_id
    FROM nodes n LEFT JOIN mutual m ON m.v = n.node
    GROUP BY n.node
    ORDER BY n.node
"""


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark shortest-path distances (``operators/graph.bfs_distances``)
    over the same sparsified supplier hand-off digraph as ``graph_scc``:
    every supplier whose key is a multiple of 10 is a seed, and the
    output is the exact minimum hop count from each seed to every node
    it reaches — the "hops from the seed list" column a crawl-frontier
    curation pass attaches to every page, and the investigator's
    "distance from a sanctioned entity" query over the ER relationship
    graph.  The DuckDB oracle replays the closure as a depth-bounded
    recursive CTE (paths with dist < 30, MIN per (seed, node)); the
    bound is safe because the operator PROVES convergence below it
    (sf0.01 diameter from the seeds: 15) and raises if not."""
    from nomenklatura_spark.operators.graph import bfs_distances
    from nomenklatura_spark.functions.hashing import md5_bucket

    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_linenumber", F.col("l_suppkey").alias("s"))
    l2 = li.select(
        "l_orderkey",
        (F.col("l_linenumber") - 1).alias("l_linenumber"),
        F.col("l_suppkey").alias("d"),
    )
    chain = l1.join(l2, ["l_orderkey", "l_linenumber"]).where(
        F.col("s") != F.col("d")
    )
    key = F.concat(
        F.col("s").cast("string"), F.lit(">"), F.col("d").cast("string")
    )
    edges = chain.where(md5_bucket("scc", key, 100) < 2).select(
        F.col("s").alias("src"), F.col("d").alias("dst")
    )
    seeds = (
        edges.select(F.col("src").alias("seed"))
        .where(F.col("seed") % 10 == 0)
        .distinct()
    )
    return bfs_distances(edges, seeds).orderBy("seed", "node")


_GRAPH_BFS_SQL = """
    WITH RECURSIVE chain AS (
        SELECT l1.l_suppkey AS s, l2.l_suppkey AS d
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l2.l_linenumber = l1.l_linenumber + 1
        WHERE l1.l_suppkey <> l2.l_suppkey
    ),
    e AS (
        SELECT DISTINCT s, d FROM chain
        WHERE CAST(('0x' || substr(md5('scc:' || s || '>' || d), 1, 15))
            AS BIGINT) % 100 < 2
    ),
    seeds AS (SELECT DISTINCT s AS seed FROM e WHERE s % 10 = 0),
    walk(seed, node, dist) AS (
        SELECT seed, seed, 0 FROM seeds
        UNION
        SELECT w.seed, e2.d, w.dist + 1 FROM walk w JOIN e e2 ON e2.s = w.node
        WHERE w.dist + 1 < 30
    )
    SELECT seed, node, MIN(dist) AS dist FROM walk GROUP BY seed, node
    ORDER BY seed, node
"""


def q_graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality of the landmark seeds
    (``operators/graph.harmonic_centrality``) over the same sparsified
    supplier hand-off digraph as ``graph_bfs``: sum of 1/dist to every
    reachable node, on the exact 1e12 integer grid so the float sum
    can't depend on partition order.  The outgoing-reach ranking beside
    PageRank's incoming-endorsement ranking."""
    from nomenklatura_spark.operators.graph import harmonic_centrality
    from nomenklatura_spark.functions.hashing import md5_bucket

    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_linenumber", F.col("l_suppkey").alias("s"))
    l2 = li.select(
        "l_orderkey",
        (F.col("l_linenumber") - 1).alias("l_linenumber"),
        F.col("l_suppkey").alias("d"),
    )
    chain = l1.join(l2, ["l_orderkey", "l_linenumber"]).where(
        F.col("s") != F.col("d")
    )
    key = F.concat(
        F.col("s").cast("string"), F.lit(">"), F.col("d").cast("string")
    )
    edges = chain.where(md5_bucket("scc", key, 100) < 2).select(
        F.col("s").alias("src"), F.col("d").alias("dst")
    )
    seeds = (
        edges.select(F.col("src").alias("seed"))
        .where(F.col("seed") % 10 == 0)
        .distinct()
    )
    return harmonic_centrality(edges, seeds).orderBy("seed")


_GRAPH_CLOSENESS_SQL = """
    WITH RECURSIVE chain AS (
        SELECT l1.l_suppkey AS s, l2.l_suppkey AS d
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l2.l_linenumber = l1.l_linenumber + 1
        WHERE l1.l_suppkey <> l2.l_suppkey
    ),
    e AS (
        SELECT DISTINCT s, d FROM chain
        WHERE CAST(('0x' || substr(md5('scc:' || s || '>' || d), 1, 15))
            AS BIGINT) % 100 < 2
    ),
    seeds AS (SELECT DISTINCT s AS seed FROM e WHERE s % 10 = 0),
    walk(seed, node, dist) AS (
        SELECT seed, seed, 0 FROM seeds
        UNION
        SELECT w.seed, e2.d, w.dist + 1 FROM walk w JOIN e e2 ON e2.s = w.node
        WHERE w.dist + 1 < 30
    ),
    dists AS (
        SELECT seed, node, MIN(dist) AS dist FROM walk GROUP BY seed, node
    ),
    agg AS (
        SELECT seed, count(*) AS n_reached,
               sum(1000000000000 // dist) AS hq
        FROM dists WHERE dist > 0 GROUP BY seed
    )
    SELECT s.seed,
           CAST(coalesce(a.n_reached, 0) AS BIGINT) AS n_reached,
           round(coalesce(CAST(a.hq AS DOUBLE), 0.0) / 1e12, 6)
               AS harmonic
    FROM seeds s LEFT JOIN agg a USING (seed)
    ORDER BY s.seed
"""


def q_graph_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction
    (``operators/graph.link_prediction``) over the part co-occurrence
    graph shared with ``graph_triangles``: non-adjacent part pairs
    sharing >= 3 co-occurrence partners, scored by common-neighbor
    count and neighborhood Jaccard — the structural analog of the
    reference's token-blocking xref suggestions (two entities sharing
    many relationship partners but no direct edge are the pairs worth a
    human look).  Exact on this graph (no hub cap); the
    ``max_center_degree`` knob documented in the operator is the
    100 TB hub bound."""
    from nomenklatura_spark.operators.graph import link_prediction

    return link_prediction(
        _tri_part_pairs(spark, sf_dir), min_common=3
    ).orderBy("a", "b")


_GRAPH_LINKS_SQL = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                WHERE l_orderkey % 5 = 0),
    und AS (
        SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
                        greatest(x.l_partkey, y.l_partkey) AS b
        FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
        WHERE x.l_partkey < y.l_partkey
    ),
    adj AS (SELECT a AS s, b AS d FROM und UNION ALL SELECT b, a FROM und),
    deg AS (SELECT d AS node, COUNT(*) AS degree FROM adj GROUP BY d),
    wedges AS (
        SELECT x.d AS a, y.d AS b FROM adj x JOIN adj y ON x.s = y.s
        WHERE x.d < y.d
    ),
    counts AS (SELECT a, b, COUNT(*) AS common FROM wedges GROUP BY a, b),
    missing AS (
        SELECT c.* FROM counts c LEFT JOIN und u ON u.a = c.a AND u.b = c.b
        WHERE u.a IS NULL AND c.common >= 3
    )
    SELECT m.a, m.b, m.common, da.degree AS deg_a, db.degree AS deg_b,
           round(m.common * 1.0 / (da.degree + db.degree - m.common), 4)
               AS jaccard
    FROM missing m
    JOIN deg da ON da.node = m.a
    JOIN deg db ON db.node = m.b
    ORDER BY a, b
"""


def q_graph_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-path layering (``operators/graph.dag_layers``) of the
    condensation DAG from ``graph_condense``: every SCC gets its
    topological level (layer L depends only on layers < L), turning the
    SCC pipeline into an executable schedule — the layered rebuild
    order for dataset-dependency DAGs and the depth column for
    ownership-chain analysis.  The oracle replays the exact same
    relaxation as MAX(path length) per node over depth-bounded path
    enumeration on the contracted edges."""
    from nomenklatura_spark.operators.graph import (
        condense_graph,
        dag_layers,
        strongly_connected_components,
    )
    from nomenklatura_spark.functions.hashing import md5_bucket

    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_linenumber", F.col("l_suppkey").alias("s"))
    l2 = li.select(
        "l_orderkey",
        (F.col("l_linenumber") - 1).alias("l_linenumber"),
        F.col("l_suppkey").alias("d"),
    )
    chain = l1.join(l2, ["l_orderkey", "l_linenumber"]).where(
        F.col("s") != F.col("d")
    )
    key = F.concat(
        F.col("s").cast("string"), F.lit(">"), F.col("d").cast("string")
    )
    edges = chain.where(md5_bucket("scc", key, 100) < 2).select(
        F.col("s").alias("src"), F.col("d").alias("dst")
    )
    scc = strongly_connected_components(edges).localCheckpoint(eager=True)
    dag = condense_graph(edges, scc)
    return dag_layers(dag, src="scc_src", dst="scc_dst").orderBy("node")


_GRAPH_LAYERS_SQL = """
    WITH RECURSIVE chain AS (
        SELECT l1.l_suppkey AS s, l2.l_suppkey AS d
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l2.l_linenumber = l1.l_linenumber + 1
        WHERE l1.l_suppkey <> l2.l_suppkey
    ),
    e AS (
        SELECT DISTINCT s, d FROM chain
        WHERE CAST(('0x' || substr(md5('scc:' || s || '>' || d), 1, 15))
            AS BIGINT) % 100 < 2
    ),
    reach(a, b) AS (
        SELECT s, d FROM e
        UNION
        SELECT r.a, e2.d FROM reach r JOIN e e2 ON e2.s = r.b
    ),
    nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
    mutual AS (
        SELECT r1.a AS v, r1.b AS u
        FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
    ),
    scc AS (
        SELECT n.node,
               GREATEST(n.node, COALESCE(MAX(m.u), n.node)) AS scc_id
        FROM nodes n LEFT JOIN mutual m ON m.v = n.node
        GROUP BY n.node
    ),
    ce AS (
        SELECT DISTINCT sa.scc_id AS s, sb.scc_id AS d
        FROM e
        JOIN scc sa ON sa.node = e.s
        JOIN scc sb ON sb.node = e.d
        WHERE sa.scc_id <> sb.scc_id
    ),
    cnodes AS (SELECT s AS node FROM ce UNION SELECT d FROM ce),
    walk(node, len) AS (
        SELECT node, 0 FROM cnodes
        UNION
        SELECT c.d, w.len + 1 FROM walk w JOIN ce c ON c.s = w.node
        WHERE w.len + 1 < 30
    )
    SELECT node, CAST(MAX(len) AS INT) AS layer
    FROM walk GROUP BY node ORDER BY node
"""


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling over the part co-occurrence graph — the
    density diagnostic after triangles: survivors of 5 peel rounds at
    k = ceil(p75 of initial degree) are the dense blobs worth batch
    review; ``peel_round`` says how quickly each straggler fell off.
    k derives from a degree percentile so the cut sits at the knee at
    every SF; the DuckDB oracle replays all rounds as unrolled CTEs
    with k as a scalar subquery (``quantile_cont`` and Spark's
    ``percentile`` share the interpolation definition — the
    events_quantiles device)."""
    import math

    from nomenklatura_spark.operators.graph import kcore_peel

    # one materialization feeds BOTH the k-derivation and the operator
    # (which re-derives its own canonical form from it)
    pairs = _tri_part_pairs(spark, sf_dir).localCheckpoint(eager=True)
    und = (
        pairs.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    k = math.ceil(deg.agg(F.percentile("degree", 0.75)).first()[0])
    return kcore_peel(pairs, k=k).orderBy("node")


def _kcore_sql(n_rounds: int = 5) -> str:
    ctes = [
        """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
              WHERE l_orderkey % 5 = 0),
    und AS (
        SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
                        greatest(x.l_partkey, y.l_partkey) AS b
        FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
        WHERE x.l_partkey < y.l_partkey
    ),
    s0 AS MATERIALIZED (SELECT a AS s, b AS d FROM und
           UNION ALL SELECT b AS s, a AS d FROM und),
    deg AS MATERIALIZED (SELECT s AS node, count(*) AS degree FROM s0 GROUP BY s),
    kk AS (SELECT CAST(ceil(quantile_cont(degree, 0.75)) AS INT) AS k
           FROM deg),
    a0 AS (SELECT node FROM deg)"""
    ]
    # AS MATERIALIZED everywhere: each round references the previous
    # round several times, and DuckDB's default CTE inlining would make
    # the unrolled expression tree grow exponentially with the rounds
    # (observed: round 5 planning never returns without the hint)
    for t in range(1, n_rounds + 1):
        ctes.append(
            f"""d{t} AS MATERIALIZED (
        SELECT s AS node, count(*) AS d FROM s{t - 1} GROUP BY s),
    rm{t} AS MATERIALIZED (
        SELECT a.node FROM a{t - 1} a LEFT JOIN d{t} d USING (node)
        WHERE COALESCE(d.d, 0) < (SELECT k FROM kk)
    ),
    a{t} AS MATERIALIZED (SELECT node FROM a{t - 1}
             WHERE node NOT IN (SELECT node FROM rm{t})),
    s{t} AS MATERIALIZED (SELECT s, d FROM s{t - 1}
             WHERE s IN (SELECT node FROM a{t})
               AND d IN (SELECT node FROM a{t}))"""
        )
    peel = "CASE "
    for t in range(1, n_rounds + 1):
        peel += f"WHEN node IN (SELECT node FROM rm{t}) THEN {t} "
    peel += "ELSE 0 END"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, degree, CAST({peel} AS INT) AS peel_round,
           ({peel}) = 0 AS in_core
    FROM deg ORDER BY node"""
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user (30-min gap) — Spark's session_window vs
    the classic gaps-and-islands SQL as oracle."""
    from nomenklatura_spark.streaming.events import sessionize

    events = load_table(spark, sf_dir, "events")
    sess = sessionize(events, gap="30 minutes")
    return sess.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    ).orderBy("user_id", "session_start")


_SESSIONIZE_SQL = """
    WITH o AS (
        SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events
    ),
    m AS (
        SELECT *, CASE WHEN prev IS NULL
                         OR ts - prev >= INTERVAL '30 minutes' THEN 1
                       ELSE 0 END AS new_sess
        FROM o
    ),
    s AS (
        SELECT *, sum(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM m
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM s
    GROUP BY user_id, sess_id
    ORDER BY user_id, session_start
"""


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (``operators/temporal.asof_join``): every purchase
    event attached to the user's most recent view at-or-before it —
    the point-in-time join Spark lacks as a built-in, reduced to one
    union-sort window (no per-key theta join).  The oracle replays the
    same union + last(ignore nulls) formulation."""
    from nomenklatura_spark.operators.temporal import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        views,
        ["user_id"],
        ts_col="ts",
        value_cols=("event_id",),
        tiebreak_col="event_id",
    )
    # no-match rows report -1, not NULL: the driver compares through
    # pandas, where a nullable BIGINT silently becomes float64 and
    # hash-mismatches the other engine's ints
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.coalesce(F.col("asof_event_id"), F.lit(-1)).alias("asof_view_id"),
        F.coalesce(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_ts")),
            F.lit(-1),
        ).alias("gap_us"),
    ).orderBy("event_id")


_EVENTS_ASOF_SQL = """
    WITH v AS (
        SELECT user_id, ts, max(event_id) AS r_id
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    u AS (
        SELECT user_id, ts, 1 AS side, event_id AS l_id,
               CAST(NULL AS BIGINT) AS r_id, CAST(NULL AS TIMESTAMP) AS r_ts
        FROM p
        UNION ALL
        SELECT user_id, ts, 0, NULL, r_id, ts FROM v
    ),
    c AS (
        SELECT *,
            last_value(r_id IGNORE NULLS) OVER w AS a_id,
            last_value(r_ts IGNORE NULLS) OVER w AS a_ts
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT l_id AS event_id, user_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        COALESCE(a_id, -1) AS asof_view_id,
        COALESCE(epoch_us(ts) - epoch_us(a_ts), -1) AS gap_us
    FROM c WHERE side = 1
    ORDER BY event_id
"""


def q_events_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range self-join (``operators/temporal.band_join_binned``):
    same-user event pairs within one hour of each other.  The Spark
    side runs the bin-bucketed equi-join reduction; the oracle is the
    plain theta join — passing means the reduction finds EXACTLY the
    naive join's pairs."""
    from nomenklatura_spark.operators.temporal import band_join_binned

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    pairs = band_join_binned(
        events, events, ["user_id"], ts_col="ts", band_seconds=3600
    )
    return (
        pairs.where(F.col("l.event_id") < F.col("r.event_id"))
        .select(
            F.col("l.event_id").alias("lid"),
            F.col("r.event_id").alias("rid"),
            "dt_us",
        )
        .orderBy("lid", "rid")
    )


_EVENTS_BAND_SQL = """
    SELECT l.event_id AS lid, r.event_id AS rid,
        epoch_us(r.ts) - epoch_us(l.ts) AS dt_us
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND l.event_id < r.event_id
     AND abs(epoch_us(r.ts) - epoch_us(l.ts)) <= CAST(3600 AS BIGINT) * 1000000
    ORDER BY lid, rid
"""


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregate — the window family member the
    tumbling (`events_hourly`) and session (`events_sessionize`) rows
    don't cover: 6-hour windows hopping hourly, per event type.  Uses
    Spark's native ``window(ts, '6 hours', '1 hour')``, which assigns
    each event to its 6 covering hops map-side (an explode, no
    self-join); the oracle replays the hop assignment relationally."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "6 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("win_start", "event_type")
    )


_EVENTS_SLIDING_SQL = """
    WITH hops AS (
        SELECT event_type, value,
            date_trunc('hour', ts) - (k * INTERVAL '1 hour') AS win_start
        FROM events, LATERAL (SELECT unnest(generate_series(0, 5)) AS k)
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        event_type,
        count(*) AS n_events,
        round(sum(value), 2) AS sum_value
    FROM hops
    GROUP BY win_start, event_type
    ORDER BY win_start, event_type
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the classic events-analytics rollup: users
    cohorted by the day of their first event; for each (cohort_day,
    day_offset), how many of the cohort's users were active.  One
    window (first event per user) + one distinct aggregation; at scale
    both are partial-agg shuffles on user_id / (cohort, offset)."""
    events = load_table(spark, sf_dir, "events")
    first_day = (
        events.groupBy("user_id")
        .agg(F.date_trunc("DAY", F.min("ts")).alias("cohort_day"))
    )
    return (
        events.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("DAY", F.col("ts")), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


_EVENTS_RETENTION_SQL = """
    WITH first_day AS (
        SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
        datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset,
        count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first_day f USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def q_events_retention_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention answered from maintained state
    (``streaming/retention_index.py``): raw events are folded into the
    distinct (user, day) presence relation by three decade-of-month
    ingest batches ARRIVING OUT OF TIME ORDER (decades 2, 3, then 1 —
    the cohort-shifting late-data path executes for every early-decade
    user), and the cohort table is served from state alone.  The oracle
    is the batch retention SQL over the full history, so a hash-green
    row proves presence is the sufficient statistic: fold-in-any-order
    == rescan-everything.  At 100 TB the serving cost is
    O(users x active-days) however many events accumulate."""
    import shutil
    import tempfile

    from nomenklatura_spark.streaming.retention_index import (
        RetentionIndexState,
    )

    events = load_table(spark, sf_dir, "events").withColumn(
        "day_of_month", F.dayofmonth(F.to_date("ts"))
    )
    root = tempfile.mkdtemp(prefix="nk_ret_idx_")
    try:
        state = RetentionIndexState(spark, root)
        prof = _fold_serve("events_retention_served")
        for b, (lo, hi) in enumerate([(11, 20), (21, 31), (1, 10)]):
            with prof.fold():
                state.apply_batch(
                    events.where(F.col("day_of_month").between(lo, hi)),
                    batch_id=b,
                )
        out = state.retention().orderBy("cohort_day", "day_offset")
        # driver-materialize (cohort-grain rows) before dropping the
        # on-disk state — see events_hll_weekly_served
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type paths (``operators/temporal.event_paths``): the 20
    most frequent length-3 consecutive event sequences — the
    path-discovery reduction beside the funnel (the funnel counts a
    DECLARED sequence; this finds the frequent ones).  One user-keyed
    shuffle (sorted per-user array, k-grams sliced map-side) versus the
    oracle's (k-1)-fold row_number self-join — same answer, one shuffle
    instead of k."""
    from nomenklatura_spark.operators.temporal import event_paths

    return event_paths(load_table(spark, sf_dir, "events"), k=3, top_n=20)


_EVENTS_PATHS_SQL = """
    WITH o AS (
        SELECT user_id, coalesce(event_type, '(null)') AS et,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
        WHERE ts IS NOT NULL
    ),
    tri AS (
        SELECT a.et || '>' || b.et || '>' || c.et AS path
        FROM o a
        JOIN o b ON b.user_id = a.user_id AND b.rn = a.rn + 1
        JOIN o c ON c.user_id = a.user_id AND c.rn = a.rn + 2
    )
    SELECT path, count(*) AS n FROM tri GROUP BY path
    ORDER BY n DESC, path LIMIT 20
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch ordered funnel view → click → purchase within 7
    days (``operators/temporal.funnel_steps``): per user, each step's
    first occurrence strictly after the previous step's, all inside the
    horizon opened at the first view.  The product-analytics reduction
    Spark lacks as a built-in, shaped as one user-keyed shuffle + k
    conditional aggregations (never a self-join of the event stream);
    the oracle replays the same step chain as CTEs."""
    from nomenklatura_spark.operators.temporal import funnel_steps

    events = load_table(spark, sf_dir, "events")
    return funnel_steps(
        events, ["view", "click", "purchase"], within="7 DAYS"
    )


_EVENTS_FUNNEL_SQL = """
    WITH ev AS (
        SELECT user_id AS u, ts AS t, event_type AS et FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (SELECT u, min(t) AS t1 FROM ev WHERE et = 'view' GROUP BY u),
    s2 AS (
        SELECT e.u, s.t1, min(e.t) AS t2
        FROM ev e JOIN s1 s USING (u)
        WHERE e.et = 'click' AND e.t > s.t1
          AND e.t <= s.t1 + INTERVAL 7 DAY
        GROUP BY e.u, s.t1
    ),
    s3 AS (
        SELECT e.u, s.t1, s.t2, min(e.t) AS t3
        FROM ev e JOIN s2 s USING (u)
        WHERE e.et = 'purchase' AND e.t > s.t2
          AND e.t <= s.t1 + INTERVAL 7 DAY
        GROUP BY e.u, s.t1, s.t2
    ),
    c AS (
        SELECT 1 AS step, 'view' AS event_type, count(*) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'click', count(*) FROM s2
        UNION ALL
        SELECT 3, 'purchase', count(*) FROM s3
    )
    SELECT CAST(step AS INT) AS step, event_type,
           CAST(n_users AS BIGINT) AS n_users,
           round(CASE WHEN (SELECT count(*) FROM s1) > 0
                 THEN CAST(n_users AS DOUBLE)
                      / CAST((SELECT count(*) FROM s1) AS DOUBLE)
                 ELSE 0.0 END, 6) AS conversion
    FROM c ORDER BY step
"""


def q_events_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog distinct-user sketches per event type.

    The Spark side deliberately takes the INCREMENTAL path: registers
    are built per (event_type, day) — the shape an ingest pipeline
    stores, one tiny sketch per partition-of-arrival — then max-merged
    down to per-type estimates.  The oracle computes the DIRECT sketch
    over all events, so a hash-green row proves the HLL merge identity
    (merge-of-parts == sketch-of-whole) cross-engine, bit-for-bit: the
    register path is exact integer arithmetic end-to-end
    (operators/sketch.py), and ``harmonic_q``/``zeros`` are the
    engine-exact audit columns next to the one rounded double.
    ``n_exact`` rides along to expose the estimation error."""
    from nomenklatura_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    events = load_table(spark, sf_dir, "events")
    daily = hll_registers(
        events.withColumn("day", F.to_date("ts")),
        ["event_type", "day"],
        "user_id",
        p=8,
    )
    merged = hll_merge(daily.drop("day"))
    est = hll_estimate(merged, ["event_type"], p=8)
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return exact.join(est, "event_type").orderBy("event_type")


def q_events_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-algebra set overlap: estimated shared users between every
    pair of event types via inclusion–exclusion over HLL sketches
    (|A∩B| ≈ est(A) + est(B) − est(A∪B), union = register max) — the
    corpus-overlap question answered from stored kilobyte sketches with
    NO join of the raw event streams.  The exact intersection rides
    along to expose the estimation error; the oracle replays the full
    register algebra."""
    from nomenklatura_spark.operators.sketch import (
        hll_estimate,
        hll_pairwise_union,
        hll_registers,
    )

    events = load_table(spark, sf_dir, "events")
    regs = hll_registers(events, ["event_type"], "user_id")
    singles = hll_estimate(regs, ["event_type"]).select(
        "event_type", "n_hll"
    )
    unions = hll_estimate(
        hll_pairwise_union(regs, "event_type"), ["key_a", "key_b"]
    ).select("key_a", "key_b", F.col("n_hll").alias("n_union_hll"))
    users = events.select("event_type", "user_id").distinct()
    exact = (
        users.alias("x")
        .join(users.alias("y"), "user_id")
        .where(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("key_a"),
            F.col("y.event_type").alias("key_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    sa = singles.select(
        F.col("event_type").alias("key_a"), F.col("n_hll").alias("_na")
    )
    sb = singles.select(
        F.col("event_type").alias("key_b"), F.col("n_hll").alias("_nb")
    )
    return (
        unions.join(sa, "key_a")
        .join(sb, "key_b")
        .join(exact, ["key_a", "key_b"], "left")
        .select(
            "key_a",
            "key_b",
            F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
            "n_union_hll",
            F.round(
                F.col("_na") + F.col("_nb") - F.col("n_union_hll"), 4
            ).alias("n_intersect_hll"),
        )
        .orderBy("key_a", "key_b")
    )


def _overlap_sql() -> str:
    est = (
        "round(CASE WHEN ((0.7213 / (1 + 1.079 / 256)) * 65536.0"
        " * 9007199254740992.0 / {r}.harmonic_q) <= 640.0"
        " AND {r}.zeros > 0"
        " THEN 256.0 * ln(256.0 / {r}.zeros)"
        " ELSE (0.7213 / (1 + 1.079 / 256)) * 65536.0"
        " * 9007199254740992.0 / {r}.harmonic_q END, 4)"
    )

    def agg_est(keys: str, rel: str, name: str) -> str:
        return f"""{name} AS (
        SELECT {keys},
            CAST(present + (256 - nonempty) * (1::BIGINT << 53) AS BIGINT)
                AS harmonic_q,
            CAST(256 - nonempty AS BIGINT) AS zeros
        FROM (
            SELECT {keys},
                SUM(1::BIGINT << CAST(53 - reg AS INT)) AS present,
                COUNT(*) AS nonempty
            FROM {rel} GROUP BY {keys}
        )
    )"""

    return f"""
    WITH h AS (
        SELECT event_type,
            CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))
                 AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    regs AS MATERIALIZED (
        SELECT event_type, h % 256 AS bucket,
            MAX(CASE WHEN h // 256 = 0 THEN 53
                ELSE 53 - length(bin(h // 256)) END) AS reg
        FROM h GROUP BY 1, 2
    ),
    {agg_est("event_type", "regs", "se")},
    tp AS (SELECT DISTINCT event_type FROM regs),
    prs AS (
        SELECT x.event_type AS key_a, y.event_type AS key_b
        FROM tp x JOIN tp y ON x.event_type < y.event_type
    ),
    uregs AS (
        SELECT p.key_a, p.key_b, r.bucket, MAX(r.reg) AS reg
        FROM prs p JOIN regs r
            ON r.event_type = p.key_a OR r.event_type = p.key_b
        GROUP BY 1, 2, 3
    ),
    {agg_est("key_a, key_b", "uregs", "ue")},
    du AS (SELECT DISTINCT event_type, user_id FROM events),
    exact AS (
        SELECT x.event_type AS key_a, y.event_type AS key_b,
            COUNT(*) AS n_exact
        FROM du x JOIN du y ON x.user_id = y.user_id
            AND x.event_type < y.event_type
        GROUP BY 1, 2
    )
    SELECT u.key_a, u.key_b,
        CAST(COALESCE(e.n_exact, 0) AS BIGINT) AS n_exact,
        {est.format(r="u")} AS n_union_hll,
        round({est.format(r="a")} + {est.format(r="b")}
              - {est.format(r="u")}, 4) AS n_intersect_hll
    FROM ue u
    JOIN se a ON a.event_type = u.key_a
    JOIN se b ON b.event_type = u.key_b
    LEFT JOIN exact e ON e.key_a = u.key_a AND e.key_b = u.key_b
    ORDER BY u.key_a, u.key_b
"""


# Direct-sketch replay of the Spark side's daily-merge path: identical
# output is the HLL merge identity.  Constants: p=8 -> m=256 registers,
# 60-bit md5 hash -> rank width 52, harmonic units 2^-53; alpha_256
# spelled as the same IEEE expression Spark inlines.
_EVENTS_HLL_SQL = """
    WITH h AS (
        SELECT event_type,
            CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))
                 AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    regs AS (
        SELECT event_type, h % 256 AS bucket,
            MAX(CASE WHEN h // 256 = 0 THEN 53
                ELSE 53 - length(bin(h // 256)) END) AS reg
        FROM h GROUP BY 1, 2
    ),
    agg AS (
        SELECT event_type,
            SUM(1::BIGINT << CAST(53 - reg AS INT)) AS present,
            COUNT(*) AS nonempty
        FROM regs GROUP BY 1
    ),
    est AS (
        SELECT event_type,
            CAST(present + (256 - nonempty) * (1::BIGINT << 53) AS BIGINT)
                AS harmonic_q,
            CAST(256 - nonempty AS BIGINT) AS zeros
        FROM agg
    ),
    ex AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1
    )
    SELECT x.event_type, x.n_exact, e.harmonic_q, e.zeros,
        round(CASE WHEN ((0.7213 / (1 + 1.079 / 256)) * 65536.0
                         * 9007199254740992.0 / e.harmonic_q) <= 640.0
                    AND e.zeros > 0
              THEN 256.0 * ln(256.0 / e.zeros)
              ELSE (0.7213 / (1 + 1.079 / 256)) * 65536.0
                   * 9007199254740992.0 / e.harmonic_q END, 4) AS n_hll
    FROM est e JOIN ex x USING (event_type)
    ORDER BY event_type
"""


def q_events_funnel_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordered funnel answered from maintained state
    (``streaming/funnel_index.py``): raw events are folded into the
    per-user candidate-time index by three decade-of-month ingest
    batches ARRIVING OUT OF TIME ORDER (decades 2, 3, then 1 — every
    chain-lowering late-data path executes), and the funnel counts are
    served from state alone.  The oracle is the batch funnel SQL over
    the full history, so a hash-green row proves the pruned incremental
    state is SUFFICIENT: fold-in-any-order == rescan-everything.  At
    100 TB the serving cost is O(users x steps), however long the event
    history grows."""
    import shutil
    import tempfile

    from nomenklatura_spark.streaming.funnel_index import FunnelIndexState

    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.dayofmonth(F.to_date("ts"))
    )
    root = tempfile.mkdtemp(prefix="nk_funnel_idx_")
    try:
        state = FunnelIndexState(
            spark, root, ["view", "click", "purchase"], within="7 DAYS"
        )
        prof = _fold_serve("events_funnel_served")
        for b, (lo, hi) in enumerate([(11, 20), (21, 31), (1, 10)]):
            with prof.fold():
                state.apply_batch(
                    events.where(F.col("day").between(lo, hi)), batch_id=b
                )
        out = state.counts()
        # driver-materialize (k rows) — see events_hll_weekly_served
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_events_sessions_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session table answered from maintained interval state
    (``streaming/session_index.py``): raw events are folded into
    per-user session intervals by three decade-of-month ingest batches
    ARRIVING OUT OF TIME ORDER (decades 3, 1, then 2 — the middle
    decade lands last, so late events bridge established intervals,
    fall inside them, and open new ones), and the sessions are served
    from state alone.  The oracle is the classic gaps-and-islands SQL
    over the full history, so a hash-green row proves the
    interior-irrelevance lemma end-to-end: per-session (start, end,
    count, value) from O(sessions) state == rescan-everything.  Values
    ride as exact integer cents (house integer-arithmetic rule) and are
    divided back only at the serving edge."""
    import shutil
    import tempfile

    from nomenklatura_spark.streaming.session_index import SessionIndexState

    events = (
        load_table(spark, sf_dir, "events")
        .withColumn("day", F.dayofmonth(F.to_date("ts")))
        .withColumn(
            "value_int", F.round(F.col("value") * 100).cast("bigint")
        )
    )
    root = tempfile.mkdtemp(prefix="nk_sess_idx_")
    try:
        state = SessionIndexState(spark, root, gap_seconds=1800)
        prof = _fold_serve("events_sessions_served")
        for b, (lo, hi) in enumerate([(21, 31), (1, 10), (11, 20)]):
            with prof.fold():
                state.apply_batch(
                    events.where(F.col("day").between(lo, hi)), batch_id=b
                )
        out = (
            state.sessions()
            .select(
                F.col("u").cast("bigint").alias("user_id"),
                F.date_format("s", "yyyy-MM-dd HH:mm:ss").alias(
                    "session_start"
                ),
                F.date_format("e", "yyyy-MM-dd HH:mm:ss").alias(
                    "session_end"
                ),
                F.col("n").alias("n_events"),
                F.round(F.col("sv") / 100.0, 2).alias("sum_value"),
            )
            .orderBy("user_id", "session_start")
        )
        # driver-materialize (session-grain rows) before dropping the
        # on-disk state — see events_hll_weekly_served
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SESSIONS_SERVED_SQL = """
    WITH o AS (
        SELECT user_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events
    ),
    m AS (
        SELECT *, CASE WHEN prev IS NULL
                         OR ts - prev >= INTERVAL '30 minutes' THEN 1
                       ELSE 0 END AS new_sess
        FROM o
    ),
    s AS (
        SELECT *, sum(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM m
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           round(sum(cents) / 100.0, 2) AS sum_value
    FROM s
    GROUP BY user_id, sess_id
    ORDER BY user_id, session_start
"""


def q_events_hll_weekly_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed-sketch SERVING, end to end at rest: per-(type, day) HLL
    registers are folded into the ``streaming/hll_index.py`` snapshot
    layout by three decade-of-month ingest batches, then a week query
    (2024-01-08..14, the data spans January) is answered by READING the
    stored registers for those seven day-keys and max-merging — the raw
    event history is never rescanned on the serving path (only the
    ``n_exact`` audit column touches it, to expose estimation error).

    The oracle computes the DIRECT sketch over the week's raw events,
    so a hash-green row proves the full at-rest chain — fold to disk
    across arbitrary ingest slicing, read back, merge at read —
    reproduces sketch-of-whole bit-for-bit (register algebra is exact
    BIGINT throughout).  This is the serving story `bm25_topk_indexed`
    and `ivfpq_topk_indexed` establish for retrieval/ANN, applied to the
    sketch tier: at 100 TB the week answer costs 7 day-keys x 2^p rows
    per event type, however large the history grows.
    """
    import shutil
    import tempfile

    from nomenklatura_spark.operators.sketch import hll_estimate, hll_merge
    from nomenklatura_spark.streaming.hll_index import HllIndexState

    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    keyed = events.select(
        F.concat_ws(
            "|", "event_type", F.date_format("day", "yyyy-MM-dd")
        ).alias("k"),
        "user_id",
        "day",
    )
    root = tempfile.mkdtemp(prefix="nk_hll_weekly_")
    try:
        state = HllIndexState(spark, root, p=8)
        prof = _fold_serve("events_hll_weekly_served")
        # ingest arrival slicing is deliberately NOT the query window:
        # the week answer must assemble from increments that straddle it
        for b, (lo, hi) in enumerate([(1, 10), (11, 20), (21, 31)]):
            with prof.fold():
                state.apply_batch(
                    keyed.where(
                        F.dayofmonth("day").between(lo, hi)
                    ).select("k", "user_id"),
                    "k",
                    "user_id",
                    batch_id=b,
                )
        week_lo, week_hi = "2024-01-08", "2024-01-14"
        parsed = state.registers().select(
            F.split("key", "[|]").getItem(0).alias("event_type"),
            F.split("key", "[|]").getItem(1).alias("day"),
            "bucket",
            "reg",
        )
        merged = hll_merge(
            parsed.where(F.col("day").between(week_lo, week_hi)).drop("day")
        )
        est = hll_estimate(merged, ["event_type"], p=8)
        exact = (
            events.where(
                F.col("day").between(
                    F.to_date(F.lit(week_lo)), F.to_date(F.lit(week_hi))
                )
            )
            .groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n_exact"))
        )
        out = exact.join(est, "event_type").orderBy("event_type")
        # driver-materialize (a handful of rows) before dropping the
        # on-disk state: a localCheckpoint would truncate lineage onto
        # executor blocks that cannot be recomputed once the temp index
        # is deleted — an executor loss on a real cluster would then
        # kill the frame; rows held by the driver have no such
        # dependency
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_events_topk_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter SERVING from maintained state
    (``streaming/sketch_index.HeavyHittersIndexState``): CMS counters
    plus the pigeonhole candidate set are folded by three
    decade-of-month ingest batches fed OUT OF ORDER, then "top-20 users
    by activity" is answered from the stored relations alone — point
    estimates over stored candidates, history never rescanned (only the
    ``n_true`` audit column touches it, to expose the one-sided CMS
    overcount).  Any user with global count >= 3x the per-batch
    threshold is provably in the candidate set; the oracle replays the
    same batch slicing, candidate rule and exact-BIGINT sketch, so a
    hash-green row proves the fold-across-arbitrary-slicing chain, not
    just the final arithmetic."""
    import shutil
    import tempfile

    from nomenklatura_spark.streaming.sketch_index import (
        HeavyHittersIndexState,
    )

    events = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="nk_hh_served_")
    try:
        state = HeavyHittersIndexState(spark, root, local_threshold=15)
        prof = _fold_serve("events_topk_served")
        slices = [(21, 31), (1, 10), (11, 20)]
        # batch ids are monotone (the additive replay guard's contract);
        # the DATA slices arrive out of time order
        for b, (lo, hi) in enumerate(slices):
            with prof.fold():
                state.apply_batch(
                    events.where(F.dayofmonth("ts").between(lo, hi)),
                    "user_id",
                    batch_id=b,
                    scope="hh",
                )
        top = state.serve_topk(20)
        exact = events.groupBy(
            F.col("user_id").cast("string").alias("value")
        ).agg(F.count(F.lit(1)).alias("n_true"))
        out = (
            top.join(exact, "value")
            .select(
                F.col("value").alias("user_id"),
                "n_cms",
                F.col("n_true").cast("long").alias("n_true"),
            )
            .orderBy(F.desc("n_cms"), "user_id")
        )
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_EVENTS_TOPK_SERVED_SQL = """
    WITH vals AS (
        SELECT CAST(user_id AS VARCHAR) AS value,
               CASE WHEN day(ts) <= 10 THEN 0
                    WHEN day(ts) <= 20 THEN 1
                    ELSE 2 END AS b
        FROM events
    ),
    cand AS (
        SELECT DISTINCT value FROM (
            SELECT value, b, count(*) AS c FROM vals GROUP BY value, b
        ) WHERE c >= 15
    ),
    cnts AS (
        SELECT dd.d,
            CAST(('0x' || substr(md5('cms' || CAST(dd.d AS VARCHAR)
                 || ':' || value), 1, 15)) AS BIGINT) % 1024 AS bucket,
            count(*) AS cnt
        FROM vals, (SELECT unnest([0, 1, 2, 3]) AS d) dd
        GROUP BY 1, 2
    ),
    probes AS (
        SELECT c.value, dd.d,
            CAST(('0x' || substr(md5('cms' || CAST(dd.d AS VARCHAR)
                 || ':' || c.value), 1, 15)) AS BIGINT) % 1024 AS bucket
        FROM cand c, (SELECT unnest([0, 1, 2, 3]) AS d) dd
    ),
    est AS (
        SELECT p.value, CAST(MIN(COALESCE(n.cnt, 0)) AS BIGINT) AS n_cms
        FROM probes p LEFT JOIN cnts n ON n.d = p.d AND n.bucket = p.bucket
        GROUP BY p.value
    ),
    top AS (
        SELECT value, n_cms FROM est ORDER BY n_cms DESC, value LIMIT 20
    )
    SELECT t.value AS user_id, t.n_cms,
           CAST(x.n_true AS BIGINT) AS n_true
    FROM top t JOIN (
        SELECT CAST(user_id AS VARCHAR) AS value, count(*) AS n_true
        FROM events GROUP BY 1
    ) x USING (value)
    ORDER BY t.n_cms DESC, t.value
"""


_EVENTS_HLL_WEEKLY_SQL = """
    WITH ev AS (
        SELECT event_type, user_id FROM events
        WHERE CAST(ts AS DATE)
              BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
    ),
    h AS (
        SELECT event_type,
            CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))
                 AS BIGINT) AS h
        FROM ev WHERE user_id IS NOT NULL
    ),
    regs AS (
        SELECT event_type, h % 256 AS bucket,
            MAX(CASE WHEN h // 256 = 0 THEN 53
                ELSE 53 - length(bin(h // 256)) END) AS reg
        FROM h GROUP BY 1, 2
    ),
    agg AS (
        SELECT event_type,
            SUM(1::BIGINT << CAST(53 - reg AS INT)) AS present,
            COUNT(*) AS nonempty
        FROM regs GROUP BY 1
    ),
    est AS (
        SELECT event_type,
            CAST(present + (256 - nonempty) * (1::BIGINT << 53) AS BIGINT)
                AS harmonic_q,
            CAST(256 - nonempty AS BIGINT) AS zeros
        FROM agg
    ),
    ex AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
        FROM ev GROUP BY 1
    )
    SELECT x.event_type, x.n_exact, e.harmonic_q, e.zeros,
        round(CASE WHEN ((0.7213 / (1 + 1.079 / 256)) * 65536.0
                         * 9007199254740992.0 / e.harmonic_q) <= 640.0
                    AND e.zeros > 0
              THEN 256.0 * ln(256.0 / e.zeros)
              ELSE (0.7213 / (1 + 1.079 / 256)) * 65536.0
                   * 9007199254740992.0 / e.harmonic_q END, 4) AS n_hll
    FROM est e JOIN ex x USING (event_type)
    ORDER BY event_type
"""


def q_events_value_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles per event type — the third sketch
    next to HLL (distinct) and CMS (heavy hitters): 32 fixed bins over
    the global value range, built per (type, day) and bin-wise SUMMED
    to per-type sketches (the ingest-increment shape), then p50/p95 by
    cumulative-bin interpolation.  Bin counters are exact BIGINTs and
    the bounds frame is shared, so the merged estimate replays
    engine-identically; `events_quantiles` holds the exact percentiles
    this approximates (sort-free here vs sort-based there)."""
    from nomenklatura_spark.operators.sketch import (
        hist_bounds,
        hist_merge,
        hist_quantile,
        hist_sketch,
    )

    events = load_table(spark, sf_dir, "events")
    bounds = hist_bounds(events, "value")
    daily = hist_sketch(
        events.withColumn("day", F.to_date("ts")),
        ["event_type", "day"],
        "value",
        bounds,
    )
    sk = hist_merge(daily.drop("day"))
    p50 = hist_quantile(sk, bounds, ["event_type"], 0.5)
    p95 = hist_quantile(sk, bounds, ["event_type"], 0.95)
    return p50.join(p95.drop("n"), "event_type").orderBy("event_type")


_EVENTS_VALUE_HIST_SQL = """
    WITH b AS (
        SELECT min(CAST(value AS DOUBLE)) AS lo,
               max(CAST(value AS DOUBLE)) AS hi
        FROM events
    ),
    bins AS (
        SELECT event_type,
            CASE WHEN b.hi <= b.lo THEN 0
                 ELSE least(greatest(CAST(floor(
                        (CAST(value AS DOUBLE) - b.lo)
                        / ((b.hi - b.lo) / 32.0)) AS INT), 0), 31)
            END AS bin,
            COUNT(*) AS cnt
        FROM events, b WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, bin, cnt,
            SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
            SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM bins
    ),
    pick50 AS (
        SELECT event_type, n, bin, cnt, cum FROM (
            SELECT *, row_number() OVER (
                PARTITION BY event_type ORDER BY bin DESC) AS rn
            FROM cum WHERE cum - cnt < CAST(0.5 AS DOUBLE) * n
        ) WHERE rn = 1
    ),
    pick95 AS (
        SELECT event_type, bin, cnt, cum, n FROM (
            SELECT *, row_number() OVER (
                PARTITION BY event_type ORDER BY bin DESC) AS rn
            FROM cum WHERE cum - cnt < CAST(0.95 AS DOUBLE) * n
        ) WHERE rn = 1
    )
    SELECT p.event_type, CAST(p.n AS BIGINT) AS n,
        round(b.lo + ((b.hi - b.lo) / 32.0)
              * (p.bin + least((CAST(0.5 AS DOUBLE) * p.n - (p.cum - p.cnt))
                             / p.cnt, CAST(1.0 AS DOUBLE))),
              6) AS q50,
        round(b.lo + ((b.hi - b.lo) / 32.0)
              * (x.bin + least((CAST(0.95 AS DOUBLE) * x.n - (x.cum - x.cnt))
                             / x.cnt, CAST(1.0 AS DOUBLE))),
              6) AS q95
    FROM pick50 p JOIN pick95 x USING (event_type), b
    ORDER BY p.event_type
"""


def q_events_quantiles_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile SERVING from maintained state — the third and last
    sketch family gets its at-rest row (HLL: `events_hll_weekly_served`,
    CMS: `events_topk_served`): per-(type) histogram bins are folded
    into the ``streaming/sketch_index.HistIndexState`` snapshot by three
    decade-of-month ingest batches arriving out of time order, then
    p50/p95 per event type are answered by cumulative-bin interpolation
    over the STORED bins — raw history never rescanned at question time.
    Bounds are the index-creation contract (fixed before the first
    batch; a deployment sets them from domain knowledge or a planning
    pass).  The oracle computes the direct whole-history sketch, so
    hash-green proves fold-to-disk across arbitrary slicing + read-back
    + bin-wise-sum merge reproduces sketch-of-whole exactly (bin
    counters are exact BIGINT)."""
    import shutil
    import tempfile

    from nomenklatura_spark.operators.sketch import hist_bounds
    from nomenklatura_spark.streaming.sketch_index import HistIndexState

    events = load_table(spark, sf_dir, "events")
    b = hist_bounds(events, "value").first()
    root = tempfile.mkdtemp(prefix="nk_hist_served_")
    try:
        state = HistIndexState(spark, root, n_bins=32)
        state.set_bounds(b["lo"], b["hi"])
        prof = _fold_serve("events_quantiles_served")
        slices = [(11, 20), (21, 31), (1, 10)]  # out of time order
        for n, (lo, hi) in enumerate(slices):
            with prof.fold():
                state.apply_batch(
                    events.where(F.dayofmonth("ts").between(lo, hi)),
                    "event_type",
                    "value",
                    batch_id=n,
                    scope="hq",
                )
        p50 = state.quantile(0.5)
        p95 = state.quantile(0.95)
        out = (
            p50.join(p95.drop("n"), "key")
            .select(F.col("key").alias("event_type"), "n", "q50", "q95")
            .orderBy("event_type")
        )
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-statistics rollup per event type: exact interpolated
    p50/p95 of ``value``, exact distinct users, stddev.  Covers the
    aggregate family the other event queries don't (percentiles are the
    workhorse of latency/value analytics); Spark's exact ``percentile``
    and DuckDB's ``quantile_cont`` share the p·(n−1) linear-interpolation
    definition, so the oracle is a direct replay.  At scale the exact
    percentile is a sort-based agg — the documented trade; the
    approximate path (``approx_percentile``) shares the plan shape and
    is pinned against this row's values in tests."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.percentile("value", 0.5), 6).alias("p50"),
            F.round(F.percentile("value", 0.95), 6).alias("p95"),
            F.round(F.stddev_samp("value"), 4).alias("sd"),
        )
        .orderBy("event_type")
    )


_EVENTS_QUANTILES_SQL = """
    SELECT event_type,
        count(*) AS n,
        count(DISTINCT user_id) AS n_users,
        round(quantile_cont(value, 0.5), 6) AS p50,
        round(quantile_cont(value, 0.95), 6) AS p95,
        round(stddev_samp(value), 4) AS sd
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH near-dup pairs with estimated jaccard."""
    from nomenklatura_spark.dedup.minhash import minhash_dedup_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(
        docs, "doc_id", "text", k=3, mode="word", n_hashes=32, band_size=4,
        threshold=0.5,
    )
    return pairs.select(
        "lid", "rid", F.round("est_jaccard", 6).alias("est_jaccard")
    ).orderBy("lid", "rid")


_MINHASH_SQL_BODY = f"""ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    tri AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(w) - 2, 0)),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM ws
    ),
    seeds AS (SELECT unnest(generate_series(0, 31)) AS seed),
    hashes AS (
        SELECT doc_id, seed,
               CAST(('0x' || substr(md5(seed::VARCHAR || ':' || sh), 1, 15)) AS BIGINT) AS h
        FROM tri, seeds
    ),
    sigs AS (SELECT doc_id, seed, min(h) AS minhash FROM hashes GROUP BY 1, 2),
    bands AS (
        SELECT doc_id, seed // 4 AS band,
               string_agg(minhash::VARCHAR, ',' ORDER BY seed) AS band_key
        FROM sigs GROUP BY 1, 2
    ),
    cands AS (
        SELECT DISTINCT l.doc_id AS lid, r.doc_id AS rid
        FROM bands l JOIN bands r ON l.band = r.band AND l.band_key = r.band_key
        WHERE l.doc_id < r.doc_id
    ),
    sim AS (
        SELECT lid, rid,
               sum(CASE WHEN ls.minhash = rs.minhash THEN 1 ELSE 0 END) * 1.0
                   / count(*) AS est_jaccard
        FROM cands
        JOIN sigs ls ON ls.doc_id = lid
        JOIN sigs rs ON rs.doc_id = rid AND rs.seed = ls.seed
        GROUP BY lid, rid
    )"""

_MINHASH_SQL = f"""
    WITH {_MINHASH_SQL_BODY}
    SELECT lid, rid, round(est_jaccard, 6) AS est_jaccard
    FROM sim WHERE est_jaccard >= 0.5
    ORDER BY lid, rid
"""

# doc_positives_served oracle: the from-scratch replay of the whole
# maintained chain — minhash pairs → recursive-CTE closure → md5-ranked
# positives (engine: streaming/dedup_index.serve_positive_pairs).
_DOC_POSITIVES_SERVED_SQL = f"""
    WITH RECURSIVE {_MINHASH_SQL_BODY},
    mpairs AS (SELECT lid, rid FROM sim WHERE est_jaccard >= 0.5),
    medges AS (
        SELECT lid AS a, rid AS b FROM mpairs
        UNION SELECT rid, lid FROM mpairs
    ),
    mnodes AS (SELECT DISTINCT a AS node FROM medges),
    mwalk(node, reached) AS (
        SELECT node, node FROM mnodes
        UNION
        SELECT w.node, e.b FROM mwalk w JOIN medges e ON e.a = w.reached
    ),
    mcomp AS (
        SELECT node, min(reached) AS component FROM mwalk GROUP BY node
    ),
    mcand AS (
        SELECT a.node AS anchor_id, b.node AS positive_id,
               row_number() OVER (
                   PARTITION BY a.node
                   ORDER BY CAST(('0x' || substr(md5('pospair:'
                       || CAST(a.node AS VARCHAR) || '|'
                       || CAST(b.node AS VARCHAR)), 1, 15)) AS BIGINT),
                       CAST(b.node AS VARCHAR)
               ) AS pos_rank
        FROM mcomp a
        JOIN mcomp b ON b.component = a.component AND b.node <> a.node
    )
    SELECT anchor_id, positive_id, pos_rank
    FROM mcand WHERE pos_rank <= 2
    ORDER BY anchor_id, pos_rank
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints per document."""
    from nomenklatura_spark.dedup.simhash import simhash

    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text").orderBy("id")


def _simhash_sql() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN cnt ELSE -cnt END) AS v{b}"
        for b in range(32)
    )
    fp = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END"
        for b in range(32)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, tok, count(*) AS cnt
            FROM (SELECT doc_id, unnest({_DOC_WORDS}) AS tok FROM documents)
            GROUP BY doc_id, tok
        ),
        h AS (
            SELECT doc_id, cnt,
                   CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h
            FROM toks
        ),
        votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
        SELECT doc_id AS id, {fp} AS simhash
        FROM votes ORDER BY id
    """


def q_linker_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/J7 — canonicalize statements through an id mapping (broadcast)."""
    supplier = load_table(spark, sf_dir, "supplier")
    mapping = supplier.select(
        F.concat(F.lit("customer-"), F.col("s_suppkey").cast("string")).alias("node"),
        F.concat(F.lit("supplier-"), F.col("s_suppkey").cast("string")).alias(
            "canonical_id"
        ),
    )
    stmts = order_statements(spark, sf_dir)
    out = apply_linker(stmts, mapping)
    return out.select(
        "entity_id", "canonical_id", "prop", "value", "original_value"
    ).orderBy("entity_id", "prop")


_LINKER_SQL = """
    WITH stmts AS (
        SELECT 'order-' || o_orderkey AS entity_id, 'customer' AS prop,
               'entity' AS prop_type, 'customer-' || o_custkey AS value FROM orders
        UNION ALL
        SELECT 'order-' || o_orderkey, 'date', 'date', CAST(o_orderdate AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'order-' || o_orderkey, 'status', 'string', o_orderstatus FROM orders
    ),
    mapping AS (
        SELECT 'customer-' || s_suppkey AS node,
               'supplier-' || s_suppkey AS canonical_id
        FROM supplier
    )
    SELECT s.entity_id,
           s.entity_id AS canonical_id,
           s.prop,
           CASE WHEN s.prop_type = 'entity' AND m.canonical_id IS NOT NULL
                THEN m.canonical_id ELSE s.value END AS value,
           CASE WHEN s.prop_type = 'entity' AND m.canonical_id IS NOT NULL
                     AND m.canonical_id != s.value
                THEN s.value ELSE NULL END AS original_value
    FROM stmts s
    LEFT JOIN mapping m ON m.node = s.value
    ORDER BY entity_id, prop
"""


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + document fingerprinting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
    ).orderBy("doc_id")


_DOC_STATS_SQL = f"""
    SELECT doc_id,
        len(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS n_tokens,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]{{1,3}}|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
        md5(array_to_string(list_sort(list_distinct(
            list_filter(string_split_regex(lower(text), '[^\\p{{L}}\\p{{N}}'']+'), x -> x != '')
        )), ' ')) AS fingerprint
    FROM documents
    ORDER BY doc_id
"""


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (dup-word fraction, top word /
    bigram share, longest same-word run) per document.

    Spark side is one whole-stage-codegen projection (mode = longest
    equal run over the sorted word/bigram array — no explode, no
    per-gram shuffle; see ``textops.analysis.repetition_features``).
    The DuckDB oracle recomputes the same values relationally
    (unnest → group-by → max), which is exactly the cross-check we
    want: two different algorithms, one answer."""
    from nomenklatura_spark.textops.analysis import repetition_features

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        repetition_features(docs, "text")
        .drop("text")
        .orderBy("doc_id")
    )


_DOC_REPETITION_SQL = """
    WITH base AS (
        SELECT doc_id,
            list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'),
                        x -> x != '') AS ws
        FROM documents
    ),
    w AS (
        SELECT doc_id, ws[i] AS w, i
        FROM base, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
    ),
    wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
    topw AS (
        SELECT doc_id, max(c) AS top_c, sum(c) AS n, count(*) AS n_distinct
        FROM wc GROUP BY doc_id
    ),
    bi AS (
        SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g
        FROM base, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
    ),
    bic AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g),
    topb AS (SELECT doc_id, max(c) AS top_bc, sum(c) AS n_bi FROM bic GROUP BY doc_id),
    runs AS (
        SELECT doc_id, w, i - row_number() OVER (PARTITION BY doc_id, w ORDER BY i) AS grp
        FROM w
    ),
    run_len AS (SELECT doc_id, count(*) AS rl FROM runs GROUP BY doc_id, w, grp),
    mx AS (SELECT doc_id, max(rl) AS max_run FROM run_len GROUP BY doc_id)
    SELECT b.doc_id,
        CAST(COALESCE(t.n, 0) AS BIGINT) AS r_n_words,
        round(CASE WHEN COALESCE(t.n, 0) > 0
              THEN 1.0 - t.n_distinct * 1.0 / t.n ELSE 0.0 END, 4) AS r_dup_word_frac,
        round(CASE WHEN COALESCE(t.n, 0) > 0
              THEN t.top_c * 1.0 / t.n ELSE 0.0 END, 4) AS r_top_word_share,
        round(CASE WHEN COALESCE(tb.n_bi, 0) > 0
              THEN tb.top_bc * 1.0 / tb.n_bi ELSE 0.0 END, 4) AS r_top_bigram_share,
        CAST(COALESCE(m.max_run, 0) AS INT) AS r_max_run
    FROM base b
    LEFT JOIN topw t USING (doc_id)
    LEFT JOIN topb tb USING (doc_id)
    LEFT JOIN mx m USING (doc_id)
    ORDER BY doc_id
"""


def q_doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID distribution."""
    docs = load_table(spark, sf_dir, "documents")
    from nomenklatura_spark.textops.analysis import words

    staged = docs.withColumn("_ws", words(F.col("text")))
    return (
        staged.select(
            lang_id(F.col("text"), ws=F.col("_ws")).alias("lang_pred")
        )
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_pred")
    )


def _langid_pred_ctes() -> str:
    """CTE chain ending in ``pred(doc_id, lang_pred)`` — shared by the
    langid rollup and the sample-mix oracle."""
    words = (
        "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'),"
        " x -> x != '')"
    )
    score_cols = []
    for lang in sorted(LANG_MARKERS):
        markers = _sql_list(LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(ws, w -> w IN {markers})) * 1.0"
            f" / greatest(len(ws), 1) AS s_{lang}"
        )
    # Tie-break must match Spark's greatest-of-(score, lang)-structs:
    # highest score wins; on ties the lexicographically greatest lang.
    return f"""
        scored AS (
            SELECT doc_id, {', '.join(score_cols)}
            FROM (SELECT doc_id, {words} AS ws FROM documents)
        ),
        best AS (
            SELECT doc_id, greatest(s_de, s_en, s_es, s_fr) AS m,
                   s_de, s_en, s_es, s_fr
            FROM scored
        ),
        pred AS (
            SELECT doc_id,
                CASE WHEN m < 0.02 THEN 'und'
                     WHEN s_fr = m THEN 'fr'
                     WHEN s_es = m THEN 'es'
                     WHEN s_en = m THEN 'en'
                     ELSE 'de' END AS lang_pred
            FROM best
        )"""


def _langid_sql() -> str:
    return f"""
        WITH {_langid_pred_ctes()}
        SELECT lang_pred, count(*) AS n_docs
        FROM pred GROUP BY lang_pred ORDER BY lang_pred
    """


# Training-data mixing: per-language keep rates in permille.  The synthetic
# corpus is English-heavy; a mixing pass downsamples the dominant language
# and keeps the rest — rates are pinned for oracle determinism.
MIX_PERMILLE = {"en": 300, "de": 800, "es": 800, "fr": 800, "und": 1000}


def q_doc_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-data mixing.

    Language-stratified downsampling with a content-hash bucket instead
    of seeded RNG: keep a doc iff ``md5("mix:"+doc_id) % 1000 <
    permille(lang)``.  Hash-based sampling is reproducible under any
    partitioning/retry (RNG sampling is not), co-partitions with nothing
    (map-only — the only shuffle is the tiny broadcast of rates), and the
    same rule runs anywhere — the DuckDB oracle replays it exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    rates = F.broadcast(
        spark.createDataFrame(
            list(MIX_PERMILLE.items()), "lang_pred string, permille int"
        )
    )
    from nomenklatura_spark.functions.hashing import md5_bucket

    from nomenklatura_spark.textops.analysis import words

    bucket = md5_bucket("mix", F.col("doc_id"), 1000)
    pred = docs.withColumn("_ws", words(F.col("text"))).select(
        "doc_id",
        lang_id(F.col("text"), ws=F.col("_ws")).alias("lang_pred"),
        bucket.alias("bucket"),
    )
    return (
        pred.join(rates, "lang_pred")
        .where(F.col("bucket") < F.col("permille"))
        .select("doc_id", "lang_pred", "bucket")
        .orderBy("doc_id")
    )


def _doc_sample_mix_sql() -> str:
    rates = ", ".join(
        f"('{lang}', {pm})" for lang, pm in sorted(MIX_PERMILLE.items())
    )
    return f"""
        WITH {_langid_pred_ctes()},
        rates(lang_pred, permille) AS (VALUES {rates}),
        keyed AS (
            SELECT p.doc_id, p.lang_pred,
                CAST(('0x' || substr(md5('mix:' || CAST(p.doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 1000 AS bucket
            FROM pred p
        )
        SELECT k.doc_id, k.lang_pred, k.bucket
        FROM keyed k JOIN rates r ON r.lang_pred = k.lang_pred
        WHERE k.bucket < r.permille
        ORDER BY k.doc_id
    """


def q_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column table profile (``operators/profile.py``):
    null counts, exact distinct cardinality, formatted min/max for every
    ``orders`` column — the pre-flight a pipeline runs before training
    on an unfamiliar table.  The exact form (count DISTINCT per column)
    is the oracle-parity path; ``exact=False`` swaps in HLL++ and drops
    the Expand for the 100 TB plan."""
    from nomenklatura_spark.operators.profile import profile_table

    orders = load_table(spark, sf_dir, "orders")
    return profile_table(orders).orderBy("col_name")


def _orders_profile_sql() -> str:
    specs = [
        ("o_orderkey", "CAST({m} AS VARCHAR)"),
        ("o_custkey", "CAST({m} AS VARCHAR)"),
        ("o_orderstatus", "{m}"),
        ("o_totalprice", "CAST(CAST(round({m}, 2) AS DECIMAL(18,2)) AS VARCHAR)"),
        ("o_orderdate", "strftime({m}, '%Y-%m-%d %H:%M:%S')"),
        ("o_orderpriority", "{m}"),
    ]
    parts = []
    for c, fmt in specs:
        parts.append(
            f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
                CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
                count(DISTINCT {c}) AS n_distinct,
                {fmt.format(m=f'min({c})')} AS min_value,
                {fmt.format(m=f'max({c})')} AS max_value
            FROM orders"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


PSAMPLE_K = 200


def q_doc_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k weight-proportional corpus sample
    (``textops.analysis.priority_sample``): priority sampling with
    token-count weights — longer documents proportionally likelier, but
    nothing censored — under integer-exact md5 priorities that the
    oracle replays bit-for-bit.  The winner cut is a
    TakeOrderedAndProject (per-task top-k, no corpus shuffle)."""
    from nomenklatura_spark.textops.analysis import (
        priority_sample,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = priority_sample(docs, token_count(F.col("text")), PSAMPLE_K)
    return out.select("doc_id", "weight", "priority_key").orderBy(
        "priority_key", "doc_id"
    )


def _doc_sample_weighted_sql() -> str:
    wc = "len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))"
    return f"""
        WITH feat AS (
            SELECT doc_id,
                GREATEST(CAST({wc} AS BIGINT), 1) AS weight,
                CAST(('0x' || substr(md5('psample:' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
            FROM documents
        )
        SELECT doc_id, weight, (h + 1) // weight AS priority_key
        FROM feat
        ORDER BY priority_key, doc_id
        LIMIT {PSAMPLE_K}
    """


def q_doc_sample_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded weight-proportional corpus sample served from
    MAINTAINED min-k state (``streaming/sample_index.py``): documents
    fold into the k-row priority-sample index in three id-sliced
    ingest batches (min-k is a monoid — min-k(A∪B) = min-k(min-k(A)∪B)
    — so each fold is a TakeOrdered over batch + k rows and the corpus
    is never rescanned), and the sample is answered from state alone.
    The oracle is the from-scratch priority sample over the full
    corpus (same salt, same integer-exact (h+1) DIV weight keys, ties
    by the index's string id), so a hash-green row proves maintained
    == rescan-everything.  Ids ride as strings in state (index
    contract) and cast back at the serving edge."""
    import shutil
    import tempfile

    from nomenklatura_spark.streaming.sample_index import SampleIndexState
    from nomenklatura_spark.textops.analysis import token_count

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="nk_sample_idx_")
    try:
        state = SampleIndexState(spark, root, k=PSAMPLE_K)
        prof = _fold_serve("doc_sample_served")
        for b in range(3):
            with prof.fold():
                state.apply_batch(
                    docs.where(F.col("doc_id") % 3 == b),
                    token_count(F.col("text")),
                )
        out = state.serve_sample().select(
            F.col("id").cast("bigint").alias("doc_id"),
            "weight",
            "priority_key",
        )
        # driver-materialize (k rows) before dropping the on-disk state
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _doc_sample_served_sql() -> str:
    wc = "len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))"
    return f"""
        WITH feat AS (
            SELECT doc_id,
                GREATEST(CAST({wc} AS BIGINT), 1) AS weight,
                CAST(('0x' || substr(md5('psample:' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
            FROM documents
        )
        SELECT doc_id, weight, (h + 1) // weight AS priority_key
        FROM feat
        ORDER BY priority_key, CAST(doc_id AS VARCHAR)
        LIMIT {PSAMPLE_K}
    """


def q_doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k weighted sample PER SOURCE (``priority_sample`` with
    ``strata_col``): the per-domain variant a mixing stage runs so no
    source exceeds its row budget while within-source selection stays
    weight-proportional.  The rank rides the window, so WindowGroupLimit
    bounds each map task to k rows per stratum (plan-asserted)."""
    from nomenklatura_spark.textops.analysis import (
        priority_sample,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    out = priority_sample(
        docs, token_count(F.col("text")), 20, strata_col="source"
    )
    return out.select("doc_id", "source", "weight", "priority_key").orderBy(
        "source", "priority_key", "doc_id"
    )


def _doc_sample_stratified_sql() -> str:
    wc = "len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))"
    return f"""
        WITH feat AS (
            SELECT doc_id, source,
                GREATEST(CAST({wc} AS BIGINT), 1) AS weight,
                CAST(('0x' || substr(md5('psample:' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, source, weight, (h + 1) // weight AS priority_key,
                row_number() OVER (
                    PARTITION BY source
                    ORDER BY (h + 1) // weight, doc_id
                ) AS rk
            FROM feat
        )
        SELECT doc_id, source, weight, priority_key
        FROM ranked WHERE rk <= 20
        ORDER BY source, priority_key, doc_id
    """


# Sequence packing budget (tokens per shard).
PACK_MAX_TOKENS = 2048


def q_doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing for training shards.

    Docs are budgeted into ``PACK_MAX_TOKENS`` shards greedily in
    deterministic ``doc_id`` order: a doc's shard is the number of full
    budgets its stratum's preceding docs consumed (running-sum window).
    Stratified by predicted language so the window is partitioned —
    packing is sequential *within* a stratum but strata pack in parallel,
    which is how this scales: at 100 TB the strata (language × source
    shard) bound every window to one partition's worth of rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    from nomenklatura_spark.textops.analysis import words

    base = docs.withColumn("_ws", words(F.col("text"))).select(
        "doc_id",
        lang_id(F.col("text"), ws=F.col("_ws")).alias("lang_pred"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang_pred")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shard = F.floor(
        (F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_MAX_TOKENS
    )
    return base.select(
        "doc_id",
        "lang_pred",
        "n_tokens",
        shard.cast("int").alias("shard"),
    ).orderBy("doc_id")


def _doc_pack_sql() -> str:
    return f"""
        WITH {_langid_pred_ctes()},
        toks AS (
            SELECT doc_id,
                len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))
                    AS n_tokens
            FROM documents
        ),
        j AS (
            SELECT p.doc_id, p.lang_pred, t.n_tokens
            FROM pred p JOIN toks t USING (doc_id)
        )
        SELECT doc_id, lang_pred, n_tokens,
            CAST(floor((sum(n_tokens) OVER (
                PARTITION BY lang_pred ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) - n_tokens) / {PACK_MAX_TOKENS}) AS INT) AS shard
        FROM j
        ORDER BY doc_id
    """


def q_doc_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing on REAL tokenizer counts: the same stratified
    running-sum shard assignment as ``doc_pack``, but the budget unit
    is the BPE token count under the pinned merge table
    (``textops/bpe.bpe_token_counts`` — the tokenizer-apply kernel) —
    the encode stage feeding the packing pipeline end-to-end, instead
    of the whitespace estimate."""
    from nomenklatura_spark.textops.analysis import words
    from nomenklatura_spark.textops.bpe import bpe_token_counts

    docs = load_table(spark, sf_dir, "documents")
    counts = bpe_token_counts(docs, _BPE_MERGES)
    base = (
        docs.withColumn("_ws", words(F.col("text")))
        .select(
            "doc_id",
            lang_id(F.col("text"), ws=F.col("_ws")).alias("lang_pred"),
        )
        .join(counts, "doc_id")
    )
    w = (
        Window.partitionBy("lang_pred")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shard = F.floor(
        (F.sum("n_bpe_tokens").over(w) - F.col("n_bpe_tokens"))
        / PACK_MAX_TOKENS
    )
    return base.select(
        "doc_id",
        "lang_pred",
        "n_bpe_tokens",
        shard.cast("int").alias("shard"),
    ).orderBy("doc_id")


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + Gopher repetition signals per document.

    Both feature families are pure map-side projections over one
    documents scan, so they chain into a single whole-stage-codegen
    stage — the former ``doc_repetition`` driver row folded in
    (round-3 registry consolidation; the driver checks 50 rows).
    """
    from nomenklatura_spark.textops.analysis import repetition_features

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feats = repetition_features(quality_features(docs, "text"), "text")
    return feats.select(
        "doc_id",
        "q_n_chars",
        "q_n_words",
        "q_mean_word_len",
        "q_punct_ratio",
        "q_stop_ratio",
        "q_keep",
        "r_n_words",
        "r_dup_word_frac",
        "r_top_word_share",
        "r_top_bigram_share",
        "r_max_run",
    )


def _quality_sql() -> str:
    words = (
        "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'),"
        " x -> x != '')"
    )
    en = _sql_list(LANG_MARKERS["en"])
    return f"""
        WITH base AS (
            SELECT doc_id, text, {words} AS ws, length(text) AS n_chars
            FROM documents
        ),
        feats AS (
            SELECT doc_id, n_chars, len(ws) AS n_words,
                CASE WHEN len(ws) > 0
                    THEN list_sum(list_transform(ws, w -> length(w))) * 1.0 / len(ws)
                    ELSE 0.0 END AS mean_word_len,
                CASE WHEN n_chars > 0
                    THEN len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / n_chars
                    ELSE 0.0 END AS punct_ratio,
                CASE WHEN len(ws) > 0
                    THEN len(list_filter(ws, w -> w IN {en})) * 1.0 / len(ws)
                    ELSE 0.0 END AS stop_ratio
            FROM base
        )
        SELECT doc_id,
            n_chars AS q_n_chars,
            n_words AS q_n_words,
            round(mean_word_len, 4) AS q_mean_word_len,
            round(punct_ratio, 4) AS q_punct_ratio,
            round(stop_ratio, 4) AS q_stop_ratio,
            (n_words >= 5 AND mean_word_len >= 2 AND mean_word_len <= 12
             AND punct_ratio <= 0.3) AS q_keep
        FROM feats
    """


def _quality_repetition_sql() -> str:
    """Quality + repetition features joined on the doc grain — the
    combined oracle for the folded ``doc_quality`` driver row."""
    return f"""
        SELECT q.*, r.r_n_words, r.r_dup_word_frac, r.r_top_word_share,
               r.r_top_bigram_share, r.r_max_run
        FROM ({_quality_sql()}) q
        JOIN ({_DOC_REPETITION_SQL}) r USING (doc_id)
        ORDER BY doc_id
    """


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over the embeddings table."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return cosine_topk(emb, queries, "vec_id", "embedding", k=5, score_decimals=6)


_ANN_SQL = """
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            round(list_cosine_similarity(
                CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])
            ), 6) AS cosine_sim,
            row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY round(list_cosine_similarity(
                    CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])
                ), 6) DESC, c.vec_id
            ) AS rank
        FROM embeddings q
        JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id % 50 = 0
    )
    WHERE rank <= 5
    ORDER BY query_id, rank
"""


@plan_cache(maxsize=8)
def _assembled_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocker pairs with both sides' feature arrays attached, built once
    per (session, corpus) and persisted — four pair_scores* queries (and
    the bench matcher loop) read the identical frame."""
    from nomenklatura_spark.operators.pairs import assemble_pairs, entity_features

    pairs = q_blocker_pairs(spark, sf_dir).select("lid", "rid")
    feats = entity_features(er_statements(spark, sf_dir))
    return assemble_pairs(pairs, feats).persist()


def q_pair_scores_ofac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8/X2 — OFAC Sanctions-List-Search score emulation on blocker pairs.

    Oracled: the Jaro kernel is the canonical (integer-transposition)
    definition, which is exactly what DuckDB's ``jaro_similarity`` /
    ``jaro_winkler_similarity`` compute, so the whole pipeline — token
    cleanup, short-token drop, first-letter-gated whole-string SimMetrics
    JW, per-token 0.5-floor mean, max of the two techniques, max over the
    name product — replays as pure SQL (``_PAIR_OFAC_SQL``).  Kernel
    fixture parity vs the reference's 164-row OFAC corpus is pinned by
    tests/test_parity_corpora.py.
    """
    from nomenklatura_spark.matching.ofac import score_pairs_ofac

    assembled = _assembled_pairs(spark, sf_dir)
    missing = [
        c for c in ("l_birth_dates", "l_genders")
        if c not in assembled.columns
    ]
    assert not missing, f"pair frame lacks {missing}"
    return (
        score_pairs_ofac(assembled)
        .select("lid", "rid", F.round("score", 6).alias("score"))
        .orderBy("lid", "rid")
    )


def _ofac_sql() -> str:
    """DuckDB replay of the OFAC name score (matching/ofac.py).

    The qualifier features (country/dob/gender/orgid) are structurally
    empty on this corpus (the statement model carries no such props for
    part/customer/supplier), so the weighted sum reduces to the clamped
    name score — asserted empty in tests/test_entry_contract semantics by
    the hash itself.
    """
    toks = (
        "list_filter(string_split_regex(upper(regexp_replace({x}, "
        "'[''`.,]', '', 'g')), '[^0-9A-Za-zÀ-ɏЀ-ӿ]+'), t -> t != '')"
    )
    # DuckDB lambdas cannot carry subqueries, so qn/cn/q2 are textually
    # inlined into the technique expressions.
    qn = "array_to_string(qtl, ' ')"
    cn = "array_to_string(ctl, ' ')"
    q2 = (
        "CASE WHEN len(list_filter(qtl, t -> length(t) > 2)) > 0 "
        "THEN list_filter(qtl, t -> length(t) > 2) ELSE qtl END"
    )
    # whole-string technique: first-letter gate + SimMetrics JW (prefix
    # bonus applied unconditionally)
    ws = f"""
        CASE WHEN {qn} != '' AND {cn} != ''
                  AND substr({qn}, 1, 1) = substr({cn}, 1, 1)
                  AND jaro_similarity({qn}, {cn}) > 0
             THEN jaro_similarity({qn}, {cn})
                  + list_sum(list_transform([1, 2, 3, 4], i ->
                        CASE WHEN i <= least(length({qn}), length({cn}))
                                  AND substr({qn}, 1, i) = substr({cn}, 1, i)
                             THEN 1 ELSE 0 END))
                    * 0.1 * (1 - jaro_similarity({qn}, {cn}))
             ELSE 0.0 END
    """
    # per-token technique: drop tokens of len <= 2 (never emptying), best
    # JW per query token with the 0.5 floor, mean
    pt = f"""
        CASE WHEN len({q2}) = 0 OR len(ctl) = 0 THEN 0.0 ELSE
            list_sum(list_transform({q2}, qt ->
                CASE WHEN ifnull(list_max(list_transform(ctl, ct ->
                              jaro_winkler_similarity(qt, ct))), 0.0) >= 0.5
                     THEN list_max(list_transform(ctl, ct ->
                              jaro_winkler_similarity(qt, ct)))
                     ELSE 0.0 END)) / len({q2})
        END
    """
    name_pair = f"greatest({ws}, {pt})"
    return f"""
    WITH pairs AS ({_PAIRS_SQL}),
    feats AS (
        SELECT 'part-' || p_partkey AS id, [p_name] AS names FROM part
        UNION ALL
        SELECT 'customer-' || c_custkey, [c_name] FROM customer
        UNION ALL
        SELECT 'supplier-' || s_suppkey, [s_name] FROM supplier
    ),
    toks AS (
        SELECT id, list_transform(names, n -> {toks.format(x='n')})
            AS tok_lists
        FROM feats
    )
    SELECT p.lid, p.rid,
        round(least(1.0, greatest(0.0, ifnull(list_max(flatten(
            list_transform(lt.tok_lists, qtl ->
                list_transform(rt.tok_lists, ctl -> {name_pair}))
        )), 0.0))), 6) AS score
    FROM pairs p
    JOIN toks lt ON lt.id = p.lid
    JOIN toks rt ON rt.id = p.rid
    ORDER BY lid, rid
    """


def q_pair_scores_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C14/X1 — LogicV2 scoring (symbolic name alignment, address
    blend, identifier formats) on blocker pairs.

    No SQL oracle: the cost-folded alignment DP inside ``name_match`` is
    a dynamic program over part sequences, not expressible as a SQL
    scalar.  It is instead held to measured parity with the reference's
    own frozen per-case output on the reference's 812-case benchmark
    (tests/test_parity_corpora.py: F1 0.801 vs the reference's 0.790,
    mean per-case |Δ| 0.038, the single STRONG failure being the one the
    reference fails at the same score), plus the OFAC/entity_bench/putin
    corpora and DP-optimality property tests.

    Driver-visible regression pin: the full sf0.001/sf0.01 outputs are
    hash-pinned with the driver's own normalization in
    ``tests/test_entry_contract.py::test_pair_scores_v2_engine_pin`` —
    any scoring drift fails a hard check even without a SQL oracle.
    """
    from nomenklatura_spark.matching.names_v2 import score_pairs_logic_v2

    return (
        score_pairs_logic_v2(_assembled_pairs(spark, sf_dir))
        .select("lid", "rid", F.round("score", 6).alias("score"))
        .orderBy("lid", "rid")
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN: hyperplane-LSH bucket join + exact re-rank.

    Oracled: the md5-derived planes are deterministic constants, so the
    DuckDB oracle replays signature → bucket join → re-rank in pure SQL
    with the same plane literals (``_ANN_LSH_SQL``).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return lsh_topk(emb, queries, k=5, n_planes=16, band_bits=2)


def _ann_lsh_sql() -> str:
    """DuckDB replay of the LSH pipeline (same plane constants the Spark
    side embeds as literals — ann/lsh.py:_plane_coeffs)."""
    from nomenklatura_spark.ann.lsh import _plane_coeffs

    rows = ", ".join(
        "({}, [{}])".format(
            p, ", ".join("1.0" if c > 0 else "-1.0" for c in cs)
        )
        for p, cs in _plane_coeffs(16, 64)
    )
    return f"""
        WITH planes(p, coeffs) AS (VALUES {rows}),
        vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        bits AS (
            SELECT vec_id, p,
                CASE WHEN list_dot_product(v, coeffs) >= 0
                     THEN '1' ELSE '0' END AS b
            FROM vecs, planes
        ),
        sigs AS (
            SELECT vec_id, CAST(p // 2 AS INT) AS band,
                   string_agg(b, '' ORDER BY p) AS key
            FROM bits GROUP BY vec_id, p // 2
        ),
        cands AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM sigs q JOIN sigs c USING (band, key)
            WHERE q.vec_id % 50 = 0 AND c.vec_id != q.vec_id
        ),
        scored AS (
            SELECT query_id, neighbor_id,
                round(list_cosine_similarity(qv.v, cv.v), 6) AS cosine_sim
            FROM cands
            JOIN vecs qv ON qv.vec_id = query_id
            JOIN vecs cv ON cv.vec_id = neighbor_id
        )
        SELECT query_id, neighbor_id, cosine_sim, rank
        FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id
            ) AS INT) AS rank
            FROM scored
        )
        WHERE rank <= 5
        ORDER BY query_id, rank
    """



@plan_cache(maxsize=8)
def _ann_codebooks_cached(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(ivf_centroids_16, pq_books, semantic_sqrtN_centroids) — the
    deterministic codebooks the ANN/SemDeDup registry rows train, built
    once per (session, corpus) and persisted.  Training is hash-seeded
    and round(9)-pinned, so the memoized codebook is byte-identical to
    an in-query retrain — the oracle replay is unaffected; what changes
    is that repeated queries pay the (index-build) training once, the
    steady state a serving deployment sees (write_ivfpq_index persists
    the same frames)."""
    import math as _math

    from nomenklatura_spark.ann.ivf import train_centroids
    from nomenklatura_spark.ann.pq import train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    ivf16 = train_centroids(emb, n_centroids=16, n_iter=2, dim=64).persist()
    books = train_pq_codebooks(emb, m=16, k=16, n_iter=2, dim=64).persist()
    k = max(1, _math.ceil(_math.sqrt(emb.count())))
    sem = train_centroids(emb, n_centroids=k, n_iter=2, dim=64).persist()
    return ivf16, books, sem


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN: IVF inverted-list probe + exact re-rank.

    Oracled: the codebook is hash-seeded and trains a FIXED 2 Lloyd
    rounds with round(9) pinning on sims and centroid components, so the
    DuckDB oracle unrolls the training as two CTE stages
    (``_ANN_IVF_SQL``).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    centroids, _, _ = _ann_codebooks_cached(spark, sf_dir)
    return ivf_topk(
        emb, queries, k=5, n_probe=6, centroids=centroids, dim=64
    )


def q_ann_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF index against brute-force ground truth
    (``ann/eval.recall_at_k``) — the measured-not-guessed tuning loop
    for the ANN tier's n_probe knob, pairing with ``dedup_eval`` on the
    dedup side.  Both operands are the engine's own rows (`ann_topk`,
    `ann_ivf_topk`); the oracle composes their existing SQL bodies and
    replays the identical intersection."""
    from nomenklatura_spark.ann.eval import recall_at_k

    return recall_at_k(
        q_ann_topk(spark, sf_dir), q_ann_ivf_topk(spark, sf_dir), k=5
    ).orderBy("query_id")


def _ann_eval_sql() -> str:
    return f"""
        WITH exact AS (
            SELECT query_id, neighbor_id FROM ({_ANN_SQL})
        ),
        approx AS (
            SELECT query_id, neighbor_id FROM ({_ann_ivf_sql()})
        )
        SELECT e.query_id,
               CAST(count(a.neighbor_id) AS BIGINT) AS hits,
               round(count(a.neighbor_id) / 5.0, 6) AS recall_at_5
        FROM exact e
        LEFT JOIN approx a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
        ORDER BY e.query_id
    """


def _ivf_assign_sql(vec_rel: str, cent_rel: str) -> str:
    return f"""
            SELECT id, vec, centroid FROM (
                SELECT v.id, v.vec, s.centroid,
                    row_number() OVER (
                        PARTITION BY v.id
                        ORDER BY round(list_dot_product(v.vec, s.c_vec), 9)
                                 DESC, s.centroid
                    ) AS rn
                FROM {vec_rel} v, {cent_rel} s
            ) WHERE rn = 1
    """


def _ivf_update_sql(assign_rel: str) -> str:
    return f"""
            SELECT centroid,
                list_transform(raw, x -> round(x / greatest(nrm, 1e-12), 9))
                    AS c_vec
            FROM (
                SELECT centroid, list(m ORDER BY pos) AS raw,
                    sqrt(list_dot_product(
                        list(m ORDER BY pos), list(m ORDER BY pos)
                    )) AS nrm
                FROM (
                    SELECT centroid, pos, avg(x) AS m
                    FROM (
                        SELECT centroid, unnest(vec) AS x,
                            unnest(generate_series(1, len(vec))) AS pos
                        FROM {assign_rel}
                    ) GROUP BY centroid, pos
                ) GROUP BY centroid
            )
    """


def _ivf_inv_ctes(n_cells: int | str = 16) -> str:
    """Shared CTE chain: normalize → hash-seed → 2 unrolled Lloyd
    rounds → final assignment ``inv(centroid, id, vec)``.  Used by the
    IVF ANN / IVFADC oracles (fixed 16 cells) and the SemDeDup oracle
    (``n_cells`` as a scalar subquery deriving ceil(sqrt(N)) — the
    SemDeDup operating discipline, mirrored by the Spark default)."""
    return f"""
        vecs AS (
            SELECT vec_id AS id,
                list_transform(
                    CAST(embedding AS DOUBLE[]),
                    x -> x / sqrt(list_dot_product(
                        CAST(embedding AS DOUBLE[]),
                        CAST(embedding AS DOUBLE[])
                    ))
                ) AS vec
            FROM embeddings
        ),
        seeds AS (
            SELECT CAST(rk - 1 AS INT) AS centroid, vec AS c_vec FROM (
                SELECT vec, row_number() OVER (
                    ORDER BY md5(CAST(id AS VARCHAR)), id
                ) AS rk
                FROM vecs
            ) WHERE rk <= {n_cells}
        ),
        a1 AS ({_ivf_assign_sql("vecs", "seeds")}),
        c1 AS ({_ivf_update_sql("a1")}),
        a2 AS ({_ivf_assign_sql("vecs", "c1")}),
        c2 AS ({_ivf_update_sql("a2")}),
        inv AS ({_ivf_assign_sql("vecs", "c2")})
    """


def _ann_ivf_sql() -> str:
    """DuckDB replay of IVF-Flat: seed → 2 unrolled Lloyd rounds →
    inverted list → probe → exact re-rank (ann/ivf.py)."""
    return f"""
        WITH {_ivf_inv_ctes()},
        probes AS (
            SELECT query_id, centroid FROM (
                SELECT q.id AS query_id, s.centroid,
                    row_number() OVER (
                        PARTITION BY q.id
                        ORDER BY round(list_dot_product(q.vec, s.c_vec), 9)
                                 DESC, s.centroid
                    ) AS pr
                FROM vecs q, c2 s WHERE q.id % 50 = 0
            ) WHERE pr <= 6
        ),
        scored AS (
            SELECT p.query_id, i.id AS neighbor_id,
                round(list_dot_product(qv.vec, i.vec), 6) AS cosine_sim
            FROM probes p
            JOIN inv i USING (centroid)
            JOIN vecs qv ON qv.id = p.query_id
            WHERE i.id != p.query_id
        )
        SELECT query_id, neighbor_id, cosine_sim, rank
        FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id
            ) AS INT) AS rank
            FROM scored
        )
        WHERE rank <= 5
        ORDER BY query_id, rank
    """


def q_doc_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training
    (``textops/contrastive.mine_hard_negatives``): each anchor's IVF
    neighbors at ranks 3..7 — near the anchor in embedding space (the
    fine distinctions a bi-encoder must learn; the complement of
    ``doc_negatives``' uniform pool draw) but past the head ranks where
    true positives concentrate.  Pure composition: candidate generation
    IS the ``ann_ivf_topk`` machinery at k=7 with the same cached
    codebook, so scale shape and determinism are inherited and the
    oracle replays the identical selection with the rank slice."""
    from nomenklatura_spark.textops.contrastive import mine_hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    centroids, _, _ = _ann_codebooks_cached(spark, sf_dir)
    return mine_hard_negatives(
        emb,
        queries,
        k=5,
        skip_top=2,
        n_probe=6,
        centroids=centroids,
        dim=64,
    ).orderBy("anchor_id", "neg_rank")


def _doc_hard_negatives_sql() -> str:
    """The IVF replay (`_ann_ivf_sql`) with the rank slice 3..7
    re-ranked to neg_rank 1..5."""
    return f"""
        WITH {_ivf_inv_ctes()},
        probes AS (
            SELECT query_id, centroid FROM (
                SELECT q.id AS query_id, s.centroid,
                    row_number() OVER (
                        PARTITION BY q.id
                        ORDER BY round(list_dot_product(q.vec, s.c_vec), 9)
                                 DESC, s.centroid
                    ) AS pr
                FROM vecs q, c2 s WHERE q.id % 50 = 0
            ) WHERE pr <= 6
        ),
        scored AS (
            SELECT p.query_id, i.id AS neighbor_id,
                round(list_dot_product(qv.vec, i.vec), 6) AS cosine_sim
            FROM probes p
            JOIN inv i USING (centroid)
            JOIN vecs qv ON qv.id = p.query_id
            WHERE i.id != p.query_id
        ),
        ranked AS (
            SELECT query_id AS anchor_id, neighbor_id AS negative_id,
                   cosine_sim,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine_sim DESC, neighbor_id
                   ) AS rank
            FROM scored
        )
        SELECT anchor_id, negative_id,
               CAST(rank - 2 AS INT) AS neg_rank, cosine_sim
        FROM ranked WHERE rank > 2 AND rank <= 7
        ORDER BY anchor_id, neg_rank
    """


def q_doc_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words document embeddings (``textops/embed.py``),
    exploded to (doc_id, pos, val) rows for the value-hash compare.
    Feature hashing is md5-derived, so the DuckDB oracle rebuilds the
    same vectors relationally."""
    from nomenklatura_spark.textops.embed import hashed_embeddings

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = hashed_embeddings(docs, "doc_id", "text", dim=64)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("pos", "val")
    )


_DOC_EMBED_SQL = """
    WITH w AS (
        SELECT doc_id,
            unnest(list_filter(string_split_regex(lower(text),
                   '[^\\p{L}\\p{N}'']+'), x -> x != '')) AS w
        FROM documents
    ),
    h AS (
        SELECT doc_id,
            CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 64 AS b,
            CASE WHEN CAST(('0x' || substr(md5('sgn:' || w), 1, 2)) AS INT)
                      % 2 = 0
                 THEN 1.0 ELSE -1.0 END AS s
        FROM w
    ),
    hist AS (SELECT doc_id, b, sum(s) AS v FROM h GROUP BY doc_id, b),
    nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS n FROM hist GROUP BY doc_id),
    grid AS (
        SELECT d.doc_id, k AS pos
        FROM (SELECT DISTINCT doc_id FROM documents) d,
            LATERAL (SELECT unnest(generate_series(0, 63)) AS k)
    )
    SELECT g.doc_id, CAST(g.pos AS INT) AS pos,
        round(COALESCE(h.v, 0.0) / greatest(COALESCE(n.n, 0.0), 1e-12), 6)
            AS val
    FROM grid g
    LEFT JOIN hist h ON h.doc_id = g.doc_id AND h.b = g.pos
    LEFT JOIN nrm n ON n.doc_id = g.doc_id
    ORDER BY g.doc_id, pos
"""


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (``ann/pq.py``): per-subspace L2 k-means
    codebooks, 16-byte corpus codes, asymmetric-dot LUT scoring, exact
    re-rank of the top-50 PQ candidates (IVFADC+R; recall@5 0.94 vs
    brute on this corpus).  Fully deterministic (hash seeds,
    round(9)/round(6) pinning) so the oracle unrolls the whole pipeline
    per subspace."""
    from nomenklatura_spark.ann.pq import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    _, books, _ = _ann_codebooks_cached(spark, sf_dir)
    return pq_topk(
        emb, queries, k=5, m=16, dim=64, rerank=50, codebooks=books
    )


def _pq_assign_sql(vrel: str, brel: str) -> str:
    d2 = (
        "round(list_dot_product(v.sv, v.sv)"
        " - 2 * list_dot_product(v.sv, b.c_vec)"
        " + list_dot_product(b.c_vec, b.c_vec), 9)"
    )
    return f"""
            SELECT id, sv, centroid FROM (
                SELECT v.id, v.sv, b.centroid,
                    row_number() OVER (
                        PARTITION BY v.id
                        ORDER BY {d2} ASC, b.centroid
                    ) AS rn
                FROM {vrel} v, {brel} b
            ) WHERE rn = 1
    """


def _pq_update_sql(arel: str) -> str:
    return f"""
            SELECT centroid,
                list_transform(list(mval ORDER BY pos), x -> round(x, 9))
                    AS c_vec
            FROM (
                SELECT centroid, pos, avg(x) AS mval
                FROM (
                    SELECT centroid, unnest(sv) AS x,
                        unnest(generate_series(1, len(sv))) AS pos
                    FROM {arel}
                ) GROUP BY centroid, pos
            ) GROUP BY centroid
    """


_VECS_CTE = """vecs AS (
            SELECT vec_id AS id,
                list_transform(
                    CAST(embedding AS DOUBLE[]),
                    x -> x / sqrt(list_dot_product(
                        CAST(embedding AS DOUBLE[]),
                        CAST(embedding AS DOUBLE[])
                    ))
                ) AS vec
            FROM embeddings
        )"""


def _pq_ctes(m: int, sub_dim: int) -> list[str]:
    """Per-subspace PQ CTE chain over the normalized ``vecs`` relation:
    slice → hash-seed → 2 Lloyd rounds → ``codes``/``lut`` unions.
    Shared by the flat-PQ oracle and the IVFADC composition."""
    ctes: list[str] = []
    code_rels = []
    lut_rels = []
    for s in range(m):
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        ctes.append(
            f"vs{s} AS (SELECT id, list_slice(vec, {lo}, {hi}) AS sv FROM vecs)"
        )
        ctes.append(
            f"""sd{s} AS (
                SELECT CAST(rk - 1 AS INT) AS centroid, sv AS c_vec FROM (
                    SELECT sv, row_number() OVER (
                        ORDER BY md5(CAST(id AS VARCHAR)), id
                    ) AS rk FROM vs{s}
                ) WHERE rk <= 16
            )"""
        )
        ctes.append(f"a{s}_1 AS ({_pq_assign_sql(f'vs{s}', f'sd{s}')})")
        ctes.append(f"c{s}_1 AS ({_pq_update_sql(f'a{s}_1')})")
        ctes.append(f"a{s}_2 AS ({_pq_assign_sql(f'vs{s}', f'c{s}_1')})")
        ctes.append(f"c{s}_2 AS ({_pq_update_sql(f'a{s}_2')})")
        ctes.append(
            f"""codes{s} AS (
                SELECT id, {s} AS sub, centroid AS code
                FROM ({_pq_assign_sql(f'vs{s}', f'c{s}_2')})
            )"""
        )
        ctes.append(
            f"""lut{s} AS (
                SELECT q.id AS query_id, {s} AS sub, b.centroid AS code,
                    round(list_dot_product(q.sv, b.c_vec), 9) AS val
                FROM vs{s} q, c{s}_2 b WHERE q.id % 50 = 0
            )"""
        )
        code_rels.append(f"SELECT * FROM codes{s}")
        lut_rels.append(f"SELECT * FROM lut{s}")
    ctes.append("codes AS (" + " UNION ALL ".join(code_rels) + ")")
    ctes.append("lut AS (" + " UNION ALL ".join(lut_rels) + ")")
    return ctes


def _ann_pq_sql(m: int = 16, sub_dim: int = 4, rerank: int = 50) -> str:
    """DuckDB replay of PQ: per-subspace seed → 2 Lloyd rounds → encode,
    then LUT scoring, top-``rerank`` candidates, exact re-rank, top-k."""
    ctes = [_VECS_CTE, *_pq_ctes(m, sub_dim)]
    return f"""
        WITH {', '.join(ctes)},
        scored AS (
            SELECT l.query_id, c.id, round(sum(l.val), 6) AS pq_score
            FROM codes c
            JOIN lut l ON c.sub = l.sub AND c.code = l.code
            WHERE c.id != l.query_id
            GROUP BY l.query_id, c.id
        ),
        cand AS (
            SELECT query_id, id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY pq_score DESC, id
                ) AS pr FROM scored
            ) WHERE pr <= {rerank}
        ),
        exact AS (
            SELECT c.query_id, c.id,
                round(list_dot_product(qv.vec, v.vec), 6) AS cosine_sim
            FROM cand c
            JOIN vecs v ON v.id = c.id
            JOIN vecs qv ON qv.id = c.query_id
        )
        SELECT query_id, id AS neighbor_id, cosine_sim, rank FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cosine_sim DESC, id
            ) AS INT) AS rank
            FROM exact
        )
        WHERE rank <= 5
        ORDER BY query_id, rank
    """


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the production ANN serving layout (``ann/pq.py:
    ivfpq_topk``): coarse IVF cells prune WHICH vectors are scored
    (top-``n_probe`` of 16 inverted lists per query), PQ codes decide
    HOW (16-byte asymmetric-dot LUT, no vectors read), exact re-rank of
    the top-50 bounds the lossiness.  Both halves are the already
    oracle-checked ``ann_ivf_topk`` / ``ann_pq_topk`` pipelines; this
    row oracle-checks their composition."""
    from nomenklatura_spark.ann.pq import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    centroids, books, _ = _ann_codebooks_cached(spark, sf_dir)
    return ivfpq_topk(
        emb,
        queries,
        k=5,
        n_probe=6,
        m=16,
        dim=64,
        rerank=50,
        centroids=centroids,
        books=books,
    )


def _ann_ivfpq_sql(m: int = 16, sub_dim: int = 4, rerank: int = 50) -> str:
    """DuckDB replay of IVFADC: the IVF codebook CTEs (coarse cells +
    inverted lists) composed with the per-subspace PQ CTEs; LUT scoring
    runs only over candidates from the probed cells."""
    return f"""
        WITH {_ivf_inv_ctes()},
        {', '.join(_pq_ctes(m, sub_dim))},
        probes AS (
            SELECT query_id, centroid FROM (
                SELECT q.id AS query_id, s.centroid,
                    row_number() OVER (
                        PARTITION BY q.id
                        ORDER BY round(list_dot_product(q.vec, s.c_vec), 9)
                                 DESC, s.centroid
                    ) AS pr
                FROM vecs q, c2 s WHERE q.id % 50 = 0
            ) WHERE pr <= 6
        ),
        cand0 AS (
            SELECT p.query_id, i.id
            FROM probes p JOIN inv i USING (centroid)
            WHERE i.id != p.query_id
        ),
        scored AS (
            SELECT c0.query_id, c0.id, round(sum(l.val), 6) AS pq_score
            FROM cand0 c0
            JOIN codes c ON c.id = c0.id
            JOIN lut l ON l.query_id = c0.query_id
                      AND l.sub = c.sub AND l.code = c.code
            GROUP BY c0.query_id, c0.id
        ),
        cand AS (
            SELECT query_id, id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY pq_score DESC, id
                ) AS pr FROM scored
            ) WHERE pr <= {rerank}
        ),
        exact AS (
            SELECT c.query_id, c.id,
                round(list_dot_product(qv.vec, v.vec), 6) AS cosine_sim
            FROM cand c
            JOIN vecs v ON v.id = c.id
            JOIN vecs qv ON qv.id = c.query_id
        )
        SELECT query_id, id AS neighbor_id, cosine_sim, rank FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cosine_sim DESC, id
            ) AS INT) AS rank
            FROM exact
        )
        WHERE rank <= 5
        ORDER BY query_id, rank
    """


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact baseline, oracle-checked).

    The driver's synthetic embeddings are near-orthogonal (max cosine
    ~0.51 at sf0.01) so the threshold sits at 0.35 to produce a real
    result set; ``embedding_dup_pairs_lsh`` is the scale path.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dup_pairs(emb, threshold=0.35)


_DEDUP_EMB_SQL = """
    SELECT a.vec_id AS lid, b.vec_id AS rid,
        round(list_cosine_similarity(
            CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
        ), 6) AS cosine_sim
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(
        CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
    ), 6) >= 0.35
    ORDER BY lid, rid
"""


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via the hyperplane-LSH bucket join — the
    100 TB scale path (``dedup/embedding.py:embedding_dup_pairs_lsh``):
    candidates come from a banded signature equi-join (no all-pairs
    product, no broadcast-side corpus), then exact cosine verification
    runs on the bucketed pairs only.  Recall is probabilistic in the
    band structure (16 planes / 4-bit bands here); the oracle replays
    the identical signature pipeline, so the check is exact."""
    from nomenklatura_spark.dedup.embedding import embedding_dup_pairs_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dup_pairs_lsh(
        emb, threshold=0.35, n_planes=16, band_bits=4, dim=64
    )


def q_doc_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: corpus vectors within cosine 0.25 of a
    benchmark vector (bench set = vec_id % 997 == 0, the ANN probe
    convention), candidates from the LSH bucket join with the bench side
    broadcast — catches paraphrased eval items the n-gram check misses
    (``dedup/embedding.py:embedding_containment_pairs``)."""
    from nomenklatura_spark.dedup.embedding import embedding_containment_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") % 997 == 0)
    corpus = emb.where(F.col("vec_id") % 997 != 0)
    pairs = embedding_containment_pairs(
        corpus, bench, threshold=0.25, n_planes=16, band_bits=4, dim=64
    )
    return pairs.select(
        F.col("lid").alias("doc_vec_id"),
        F.col("rid").alias("bench_vec_id"),
        "cosine_sim",
    ).orderBy("doc_vec_id", "bench_vec_id")


def _decontam_semantic_sql(n_planes: int = 16, band_bits: int = 4) -> str:
    """DuckDB replay of the directional LSH decontamination (same plane
    constants and banding as _dedup_emb_lsh_sql, doc/bench split on
    vec_id % 997)."""
    from nomenklatura_spark.ann.lsh import _plane_coeffs

    rows = ", ".join(
        "({}, [{}])".format(
            p, ", ".join("1.0" if c > 0 else "-1.0" for c in cs)
        )
        for p, cs in _plane_coeffs(n_planes, 64)
    )
    return f"""
        WITH planes(p, coeffs) AS (VALUES {rows}),
        vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        bits AS (
            SELECT vec_id, p,
                CASE WHEN list_dot_product(v, coeffs) >= 0
                     THEN '1' ELSE '0' END AS b
            FROM vecs, planes
        ),
        sigs AS (
            SELECT vec_id, CAST(p // {band_bits} AS INT) AS band,
                   string_agg(b, '' ORDER BY p) AS key
            FROM bits GROUP BY vec_id, p // {band_bits}
        ),
        cands AS (
            SELECT DISTINCT a.vec_id AS lid, b.vec_id AS rid
            FROM sigs a JOIN sigs b USING (band, key)
            WHERE a.vec_id % 997 != 0 AND b.vec_id % 997 = 0
        )
        SELECT lid AS doc_vec_id, rid AS bench_vec_id,
            round(list_cosine_similarity(lv.v, rv.v), 6) AS cosine_sim
        FROM cands
        JOIN vecs lv ON lv.vec_id = lid
        JOIN vecs rv ON rv.vec_id = rid
        WHERE round(list_cosine_similarity(lv.v, rv.v), 6) >= 0.25
        ORDER BY doc_vec_id, bench_vec_id
    """


def _dedup_emb_lsh_sql(n_planes: int = 16, band_bits: int = 4) -> str:
    """DuckDB replay of the LSH-bucketed dedup (same plane constants as
    the Spark side — ann/lsh.py:_plane_coeffs; same banding)."""
    from nomenklatura_spark.ann.lsh import _plane_coeffs

    rows = ", ".join(
        "({}, [{}])".format(
            p, ", ".join("1.0" if c > 0 else "-1.0" for c in cs)
        )
        for p, cs in _plane_coeffs(n_planes, 64)
    )
    return f"""
        WITH planes(p, coeffs) AS (VALUES {rows}),
        vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        bits AS (
            SELECT vec_id, p,
                CASE WHEN list_dot_product(v, coeffs) >= 0
                     THEN '1' ELSE '0' END AS b
            FROM vecs, planes
        ),
        sigs AS (
            SELECT vec_id, CAST(p // {band_bits} AS INT) AS band,
                   string_agg(b, '' ORDER BY p) AS key
            FROM bits GROUP BY vec_id, p // {band_bits}
        ),
        cands AS (
            SELECT DISTINCT a.vec_id AS lid, b.vec_id AS rid
            FROM sigs a JOIN sigs b USING (band, key)
            WHERE a.vec_id < b.vec_id
        )
        SELECT lid, rid,
            round(list_cosine_similarity(lv.v, rv.v), 6) AS cosine_sim
        FROM cands
        JOIN vecs lv ON lv.vec_id = lid
        JOIN vecs rv ON rv.vec_id = rid
        WHERE round(list_cosine_similarity(lv.v, rv.v), 6) >= 0.35
        ORDER BY lid, rid
    """


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-bucketed embedding near-dup pairs
    (``dedup/semantic.py``).  The within-cell self-join is the scale
    path's bounded candidate generator; the deterministic codebook
    (hash-seeded, round(9)-pinned) is what makes it oracle-able.

    ``n_centroids`` is left at the module default, which derives
    ceil(sqrt(N)) from the corpus — the SemDeDup operating discipline
    (cells ∝ corpus so per-cell pair volume stays bounded); the oracle
    derives the same bound as a scalar subquery."""
    from nomenklatura_spark.dedup.semantic import semantic_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    _, _, sem_centroids = _ann_codebooks_cached(spark, sf_dir)
    return semantic_dup_pairs(
        emb, threshold=0.35, centroids=sem_centroids, dim=64
    )


_SQRT_N_CELLS = "(SELECT CAST(ceil(sqrt(count(*))) AS INT) FROM vecs)"


def _dedup_semantic_sql() -> str:
    """DuckDB replay of SemDeDup: the IVF codebook CTEs (√N cells, same
    rule as the Spark default), then the within-cell self-join at the
    same threshold."""
    return f"""
        WITH {_ivf_inv_ctes(n_cells=_SQRT_N_CELLS)}
        SELECT a.centroid, a.id AS lid, b.id AS rid,
            round(list_dot_product(a.vec, b.vec), 6) AS cosine_sim
        FROM inv a
        JOIN inv b ON a.centroid = b.centroid AND a.id < b.id
        WHERE round(list_dot_product(a.vec, b.vec), 6) >= 0.35
        ORDER BY lid, rid
    """


def q_doc_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage statistics (``dedup/substring.py``): fraction
    of each document's 8-word windows that occur more than once in the
    corpus — the bounded-window approximation of exact-substring dedup
    (Lee et al. 2022)."""
    from nomenklatura_spark.dedup.substring import duplicated_passages

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return duplicated_passages(docs, "doc_id", "text", k=8).orderBy("doc_id")


_DOC_DUP_PASSAGES_SQL = """
    WITH base AS (
        SELECT doc_id,
            list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'),
                        x -> x != '') AS ws
        FROM documents
    ),
    wins AS (
        SELECT doc_id,
            array_to_string(list_slice(ws, i, i + 7), ' ') AS w
        FROM base,
            LATERAL (SELECT unnest(generate_series(1, len(ws) - 7)) AS i)
    ),
    cnt AS (SELECT w, count(*) AS c FROM wins GROUP BY w),
    per AS (
        SELECT doc_id, count(*) AS n_windows,
            sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS dup_windows
        FROM wins JOIN cnt USING (w) GROUP BY doc_id
    )
    SELECT b.doc_id,
        CAST(COALESCE(p.n_windows, 0) AS INT) AS n_windows,
        CAST(COALESCE(p.dup_windows, 0) AS INT) AS dup_windows,
        round(CASE WHEN COALESCE(p.n_windows, 0) > 0
              THEN p.dup_windows * 1.0 / p.n_windows ELSE 0.0 END, 4)
            AS dup_frac
    FROM base b
    LEFT JOIN per p USING (doc_id)
    ORDER BY doc_id
"""


def q_doc_dup_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage REMOVAL (``dedup/substring.py``): every word
    covered by a corpus-duplicated 8-word window is dropped and the
    survivors re-joined — the action half of exact-substring dedup
    (`doc_dup_passages` is the audit half).  The oracle replays the
    window counting and the coverage filter relationally (NOT EXISTS
    over window starts)."""
    from nomenklatura_spark.dedup.substring import trim_duplicated_passages

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return trim_duplicated_passages(docs).orderBy("doc_id")


_DOC_DUP_TRIM_SQL = """
    WITH base AS (
        SELECT doc_id,
            list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'),
                        x -> x != '') AS ws
        FROM documents
    ),
    wins AS (
        SELECT doc_id, i,
            array_to_string(list_slice(ws, i, i + 7), ' ') AS w
        FROM base,
            LATERAL (SELECT unnest(generate_series(1, len(ws) - 7)) AS i)
    ),
    cnt AS (SELECT w, count(*) AS c FROM wins GROUP BY w),
    dup AS (
        SELECT wins.doc_id, wins.i FROM wins JOIN cnt USING (w) WHERE c >= 2
    ),
    tok AS (
        SELECT doc_id, unnest(ws) AS w,
            unnest(generate_series(1, len(ws))) AS p
        FROM base
    ),
    kept AS (
        SELECT t.doc_id, t.p, t.w
        FROM tok t
        WHERE NOT EXISTS (
            SELECT 1 FROM dup d
            WHERE d.doc_id = t.doc_id AND d.i <= t.p AND d.i >= t.p - 7
        )
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_kept,
            string_agg(w, ' ' ORDER BY p) AS trimmed
        FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id,
        CAST(len(b.ws) AS INT) AS n_words,
        CAST(len(b.ws) - COALESCE(a.n_kept, 0) AS INT) AS words_removed,
        COALESCE(a.trimmed, '') AS trimmed_text
    FROM base b LEFT JOIN agg a USING (doc_id)
    ORDER BY b.doc_id
"""


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image + audio decode, oracle-checked (the former
    ``media_pixels`` and ``media_audio`` driver rows unioned onto one
    grain — round-3 registry consolidation; the driver checks 50 rows).

    Per-document deterministic BMPs (pixel bytes = md5 stream) and WAV
    PCM16 payloads (samples = md5 stream) are ENCODED, round-tripped
    through the pure-numpy BMP decoder / RIFF chunk walker
    (``multimodal/decode.py``) and reduced to pixel / sample statistics.
    The DuckDB oracle reproduces the same statistics from hex arithmetic
    alone — it never parses BMP or RIFF — so a hash match proves both
    codec paths compute real pixel/sample math.  Image rows carry NULL
    audio columns and vice versa; the union is two independent
    mapInPandas decode stages, no join."""
    from nomenklatura_spark.multimodal.decode import (
        audio_stats,
        image_stats,
        synthetic_bmp_assets,
        synthetic_wav_assets,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # Every stat column rides as DOUBLE with NaN padding (not NULL int):
    # both the driver and DuckDB fetch through pandas, where a nullable
    # int column degrades to float64 with NaN — emitting NaN doubles on
    # both sides keeps the value-hash representation identical.
    nan = F.lit(float("nan")).cast("double")
    img = image_stats(synthetic_bmp_assets(docs)).select(
        F.col("asset_id").alias("doc_id"),
        "codec",
        F.col("width").cast("double").alias("width"),
        F.col("height").cast("double").alias("height"),
        "mean_r",
        "mean_g",
        "mean_b",
        F.col("min_px").cast("double").alias("min_px"),
        F.col("max_px").cast("double").alias("max_px"),
        nan.alias("sample_rate"),
        nan.alias("n_samples"),
        nan.alias("duration_ms"),
        nan.alias("rms"),
        nan.alias("peak"),
    )
    wav = audio_stats(synthetic_wav_assets(docs)).select(
        F.col("asset_id").alias("doc_id"),
        F.lit("wav").alias("codec"),
        nan.alias("width"),
        nan.alias("height"),
        nan.alias("mean_r"),
        nan.alias("mean_g"),
        nan.alias("mean_b"),
        nan.alias("min_px"),
        nan.alias("max_px"),
        F.col("sample_rate").cast("double").alias("sample_rate"),
        F.col("n_samples").cast("double").alias("n_samples"),
        F.col("duration_ms").cast("double").alias("duration_ms"),
        "rms",
        F.col("peak").cast("double").alias("peak"),
    )
    return img.unionByName(wav)


# 18x6 RGB = 324 pixel bytes = 21 md5 chunks of 16 bytes (trimmed).
# Byte k of the stream is hex pair (k%16) of md5('<doc_id>:px:<k//16>');
# channel = k%3 (R,G,B interleave), matching the numpy reshape.
_MEDIA_PIXELS_SQL = """
    WITH px AS (
        SELECT doc_id, k,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':px:' ||
                                     CAST(k // 16 AS VARCHAR)),
                                 (k % 16) * 2 + 1, 2)) AS INT) AS b
        FROM documents,
            LATERAL (SELECT unnest(generate_series(0, 323)) AS k)
    )
    SELECT doc_id,
        'bmp' AS codec,
        18 AS width,
        6 AS height,
        round(avg(CASE WHEN k % 3 = 0 THEN b END), 4) AS mean_r,
        round(avg(CASE WHEN k % 3 = 1 THEN b END), 4) AS mean_g,
        round(avg(CASE WHEN k % 3 = 2 THEN b END), 4) AS mean_b,
        CAST(min(b) AS INT) AS min_px,
        CAST(max(b) AS INT) AS max_px
    FROM px
    GROUP BY doc_id
    ORDER BY doc_id
"""


_MEDIA_DECODE_SQL = """
    SELECT doc_id, codec,
           CAST(width AS DOUBLE) AS width,
           CAST(height AS DOUBLE) AS height,
           mean_r, mean_g, mean_b,
           CAST(min_px AS DOUBLE) AS min_px,
           CAST(max_px AS DOUBLE) AS max_px,
           CAST(NULL AS DOUBLE) AS sample_rate,
           CAST(NULL AS DOUBLE) AS n_samples,
           CAST(NULL AS DOUBLE) AS duration_ms,
           CAST(NULL AS DOUBLE) AS rms,
           CAST(NULL AS DOUBLE) AS peak
    FROM ({pixels})
    UNION ALL
    SELECT doc_id, 'wav' AS codec,
           CAST(NULL AS DOUBLE) AS width,
           CAST(NULL AS DOUBLE) AS height,
           CAST(NULL AS DOUBLE) AS mean_r,
           CAST(NULL AS DOUBLE) AS mean_g,
           CAST(NULL AS DOUBLE) AS mean_b,
           CAST(NULL AS DOUBLE) AS min_px,
           CAST(NULL AS DOUBLE) AS max_px,
           CAST(sample_rate AS DOUBLE) AS sample_rate,
           CAST(n_samples AS DOUBLE) AS n_samples,
           CAST(duration_ms AS DOUBLE) AS duration_ms,
           rms,
           CAST(peak AS DOUBLE) AS peak
    FROM ({audio})
    ORDER BY doc_id, codec
"""


# 200 samples = 400 little-endian int16 bytes = 25 md5 chunks.  Sample k
# is bytes 2k (lo) and 2k+1 (hi): v = lo + 256*hi - 65536*(hi >= 128).
_MEDIA_AUDIO_SQL = """
    WITH smp AS (
        SELECT doc_id,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':au:' ||
                                     CAST((2 * k) // 16 AS VARCHAR)),
                                 ((2 * k) % 16) * 2 + 1, 2)) AS INT)
            + 256 * CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':au:' ||
                                     CAST((2 * k + 1) // 16 AS VARCHAR)),
                                 ((2 * k + 1) % 16) * 2 + 1, 2)) AS INT)
                AS raw
        FROM documents,
            LATERAL (SELECT unnest(generate_series(0, 199)) AS k)
    ),
    vals AS (
        SELECT doc_id,
            CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
        FROM smp
    )
    SELECT doc_id,
        8000 AS sample_rate,
        200 AS n_samples,
        25 AS duration_ms,
        round(sqrt(avg(CAST(v AS DOUBLE) * v)), 4) AS rms,
        CAST(max(abs(v)) AS INT) AS peak
    FROM vals
    GROUP BY doc_id
    ORDER BY doc_id
"""


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup dedup (``multimodal/dhash.py``): per document a
    BMP and a PPM re-encode of the SAME md5-stream pixels (every 5th
    doc's PPM copy carries a one-channel +128 edit), pushed through the
    real pure-numpy decoders → integer-luma dHash (8×8 row-byte
    signature) → SimHash-style banded Hamming join (8 one-byte bands
    catch every pair within distance 7 by pigeonhole) → exact
    popcount-of-XOR filter at <= 6.  Cross-FORMAT duplicates: the BMP
    and PPM container bytes share nothing, so only a pipeline that
    actually decodes pixels can pair them — the DuckDB oracle replays
    the pixels, the perturbation, the nearest-neighbor resample, the
    luma comparisons and the banding from hex arithmetic alone, never
    parsing either container.  Signatures are one Arrow-batched
    map-only pass; the band join shuffles 10-byte signature rows,
    never pixels."""
    return _media_pairs_cached(spark, sf_dir).orderBy("lid", "rid")


# Pixel bytes replay _MEDIA_PIXELS_SQL's device: byte k of doc d is hex
# pair (k%16) of md5('<d>:px:<k//16>'); the 18x6 source resamples to the
# 8-row x 9-col dHash grid via the integer (i*src)//dst map, luma is the
# exact 299/587/114 integer grid, and asset 2d+1 (the PPM re-encode)
# flips byte 0 by +128 mod 256 when d%5=0.
_MEDIA_DEDUP_SQL_BODY = """px AS (
        SELECT d.doc_id, a.a, r.r, c.c, ch.ch,
               ((((r.r * 6) // 8) * 18 + ((c.c * 18) // 9)) * 3 + ch.ch)
                   AS k
        FROM documents d,
             (VALUES (0), (1)) a(a),
             range(0, 8) AS r(r),
             range(0, 9) AS c(c),
             range(0, 3) AS ch(ch)
    ),
    pv AS (
        SELECT doc_id, a, r, c, ch,
            CASE WHEN a = 1 AND doc_id % 5 = 0 AND k = 0
                 THEN (v + 128) % 256 ELSE v END AS v
        FROM (
            SELECT *,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':px:'
                        || CAST(k // 16 AS VARCHAR)),
                      (k % 16) * 2 + 1, 2)) AS INT) AS v
            FROM px
        )
    ),
    luma AS (
        SELECT doc_id, a, r, c,
            sum(CASE ch WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END * v)
                AS l
        FROM pv GROUP BY doc_id, a, r, c
    ),
    blocks AS (
        SELECT l.doc_id * 2 + l.a AS id, l.r AS block_no,
            sum(CASE WHEN l.l > l2.l THEN (1 << l.c) ELSE 0 END)
                AS block_val
        FROM luma l
        JOIN luma l2 ON l2.doc_id = l.doc_id AND l2.a = l.a
                    AND l2.r = l.r AND l2.c = l.c + 1
        WHERE l.c < 8
        GROUP BY l.doc_id, l.a, l.r
    ),
    cand AS (
        SELECT DISTINCT lb.id AS lid, rb.id AS rid
        FROM blocks lb
        JOIN blocks rb ON lb.block_no = rb.block_no
                      AND lb.block_val = rb.block_val
                      AND lb.id < rb.id
    ),
    ham AS (
        SELECT c.lid, c.rid,
            CAST(sum(bit_count(xor(lb.block_val, rb.block_val))) AS INT)
                AS hamming
        FROM cand c
        JOIN blocks lb ON lb.id = c.lid
        JOIN blocks rb ON rb.id = c.rid AND rb.block_no = lb.block_no
        GROUP BY c.lid, c.rid
    )"""


def q_media_dedup_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup dedup — the ``media_dedup`` construction over the
    WAV tier (``multimodal/dhash.audio_dhash_signatures``): per
    document the md5 sample stream encoded twice (verbatim, and at a
    doubled sample-rate header — same samples, different container
    metadata, so only the RIFF chunk walker can pair them; every 5th
    copy also bumps sample 0 by +1 with exact int16 wraparound),
    decoded for real, resampled to 65 frames by the integer index map,
    sign-of-delta bits packed to 8 row-bytes, then the SAME banded
    Hamming join as the image tier.  The oracle replays samples,
    wraparound, frames and banding from hex arithmetic alone."""
    from nomenklatura_spark.multimodal.decode import (
        synthetic_wav_pair_assets,
    )
    from nomenklatura_spark.multimodal.dhash import (
        audio_dhash_signatures,
        dhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assets = synthetic_wav_pair_assets(docs)
    sigs = audio_dhash_signatures(assets).localCheckpoint(eager=False)
    return dhash_pairs(sigs, max_hamming=6).orderBy("lid", "rid")


# Sample k of doc d replays _MEDIA_AUDIO_SQL's device (little-endian
# int16 from the md5 byte stream); asset 2d+1 bumps sample 0 by +1 with
# exact int16 wraparound when d%5=0; frame i picks sample (i*200)//65.
_MEDIA_DEDUP_AUDIO_SQL = """
    WITH fr AS (
        SELECT d.doc_id, a.a, i.i, ((i.i * 200) // 65) AS k
        FROM documents d,
             (VALUES (0), (1)) a(a),
             range(0, 65) AS i(i)
    ),
    raw AS (
        SELECT doc_id, a, i, k,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':au:'
                    || CAST((2 * k) // 16 AS VARCHAR)),
                  ((2 * k) % 16) * 2 + 1, 2)) AS INT)
            + 256 * CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    || ':au:' || CAST((2 * k + 1) // 16 AS VARCHAR)),
                  ((2 * k + 1) % 16) * 2 + 1, 2)) AS INT) AS r
        FROM fr
    ),
    vals AS (
        SELECT doc_id, a, i,
            CASE WHEN a = 1 AND doc_id % 5 = 0 AND k = 0
                 THEN ((CASE WHEN r >= 32768 THEN r - 65536 ELSE r END
                        + 1 + 32768) % 65536) - 32768
                 ELSE CASE WHEN r >= 32768 THEN r - 65536 ELSE r END
            END AS v
        FROM raw
    ),
    blocks AS (
        SELECT v1.doc_id * 2 + v1.a AS id, (v1.i // 8) AS block_no,
            sum(CASE WHEN v1.v > v2.v THEN (1 << (v1.i % 8)) ELSE 0 END)
                AS block_val
        FROM vals v1
        JOIN vals v2 ON v2.doc_id = v1.doc_id AND v2.a = v1.a
                    AND v2.i = v1.i + 1
        WHERE v1.i < 64
        GROUP BY v1.doc_id, v1.a, (v1.i // 8)
    ),
    cand AS (
        SELECT DISTINCT lb.id AS lid, rb.id AS rid
        FROM blocks lb
        JOIN blocks rb ON lb.block_no = rb.block_no
                      AND lb.block_val = rb.block_val
                      AND lb.id < rb.id
    ),
    ham AS (
        SELECT c.lid, c.rid,
            CAST(sum(bit_count(xor(lb.block_val, rb.block_val))) AS INT)
                AS hamming
        FROM cand c
        JOIN blocks lb ON lb.id = c.lid
        JOIN blocks rb ON rb.id = c.rid AND rb.block_no = lb.block_no
        GROUP BY c.lid, c.rid
    )
    SELECT lid, rid, hamming FROM ham
    WHERE hamming <= 6
    ORDER BY lid, rid
"""

_MEDIA_DEDUP_SQL = f"""
    WITH {_MEDIA_DEDUP_SQL_BODY}
    SELECT lid, rid, hamming FROM ham
    WHERE hamming <= 6
    ORDER BY lid, rid
"""


def q_media_dedup_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media KEEP-LIST served from maintained state
    (``streaming/media_index.py``): the synthetic BMP/PPM near-dup
    assets fold into the incremental dHash index in three id-sliced
    ingest batches — each pair's two formats land in DIFFERENT batches,
    so the cross-batch probe join (batch bands × state bands, state
    never re-self-joins) is what finds them — components merge by the
    star-compression fold, and the keep-list (one deterministic min-id
    survivor per near-dup cluster) is answered from state alone.  The
    oracle replays the whole chain from scratch: pixels, dHash, banding,
    Hamming filter, then the recursive-CTE closure and the min-id keep
    rule."""
    import shutil
    import tempfile

    from nomenklatura_spark.multimodal.decode import (
        synthetic_media_pair_assets,
    )
    from nomenklatura_spark.streaming.media_index import (
        MediaDedupIndexState,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assets = synthetic_media_pair_assets(docs)
    root = tempfile.mkdtemp(prefix="nk_media_idx_")
    try:
        state = MediaDedupIndexState(spark, root)
        prof = _fold_serve("media_dedup_served")
        for b in range(3):
            with prof.fold():
                state.apply_batch(
                    assets.where(F.col("asset_id") % 3 == b)
                )
        out = state.serve_keep_list().orderBy("asset_id")
        # driver-materialize (keep-list grain) before dropping the
        # on-disk state — see events_hll_weekly_served
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_MEDIA_DEDUP_SERVED_SQL = f"""
    WITH RECURSIVE {_MEDIA_DEDUP_SQL_BODY},
    mpairs AS (SELECT lid, rid FROM ham WHERE hamming <= 6),
    medges AS (
        SELECT lid AS a, rid AS b FROM mpairs
        UNION SELECT rid, lid FROM mpairs
    ),
    mnodes AS (SELECT DISTINCT a AS node FROM medges),
    mwalk(node, reached) AS (
        SELECT node, node FROM mnodes
        UNION
        SELECT w.node, e.b FROM mwalk w JOIN medges e ON e.a = w.reached
    ),
    mcomp AS (
        SELECT node, min(reached) AS component FROM mwalk GROUP BY node
    )
    SELECT node AS asset_id, (node = component) AS keep
    FROM mcomp
    ORDER BY asset_id
"""


def q_media_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media tier's quality gate — ``dedup/eval.py``'s pairwise +
    BCubed metrics scoring the dHash clustering against the PLANTED
    ground truth (gold = the document behind each asset pair: the BMP
    and the PPM re-encode of one pixel stream must cluster).  The
    batch-row sibling of the text tier's ``dedup_eval``: precision
    below 1.0 means noise imagery collided within Hamming 6; recall
    below 1.0 means a decode/banding regression dropped a planted
    pair — the end-to-end alarm the hash-match alone wouldn't localize.
    Singleton assets label themselves (coalesce), the quadratic pair
    space is never materialized (cluster-size aggregates only), and
    the BCubed sums ride the DECIMAL(38,0) grid with the executable
    per-cell cap."""
    from nomenklatura_spark.dedup.eval import pairwise_cluster_metrics
    from nomenklatura_spark.multimodal.decode import (
        synthetic_media_pair_assets,
    )
    from nomenklatura_spark.resolver.components import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assets = synthetic_media_pair_assets(docs)
    pairs = _media_pairs_cached(spark, sf_dir)
    comps = connected_components(pairs, src="lid", dst="rid")
    labels = (
        assets.select(F.col("asset_id").alias("id"))
        .withColumn("gold", F.expr("id DIV 2"))
        .join(comps.withColumnRenamed("node", "id"), "id", "left")
        .select(
            "gold",
            F.coalesce("component", F.col("id")).alias("pred"),
        )
    )
    return pairwise_cluster_metrics(labels, "gold", "pred")


_MEDIA_DEDUP_EVAL_SQL = f"""
    WITH RECURSIVE {_MEDIA_DEDUP_SQL_BODY},
    mpairs AS (SELECT lid, rid FROM ham WHERE hamming <= 6),
    medges AS (
        SELECT lid AS a, rid AS b FROM mpairs
        UNION SELECT rid, lid FROM mpairs
    ),
    mnodes AS (SELECT DISTINCT a AS node FROM medges),
    mwalk(node, reached) AS (
        SELECT node, node FROM mnodes
        UNION
        SELECT w.node, e.b FROM mwalk w JOIN medges e ON e.a = w.reached
    ),
    mcomp AS (
        SELECT node, min(reached) AS component FROM mwalk GROUP BY node
    ),
    lab AS (
        SELECT d.doc_id AS g,
               coalesce(c.component, d.doc_id * 2 + a.a) AS p
        FROM documents d
        CROSS JOIN (VALUES (0), (1)) a(a)
        LEFT JOIN mcomp c ON c.node = d.doc_id * 2 + a.a
    ),
    {_CLUSTER_METRICS_TAIL_SQL}
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column plumbing: synthetic assets → mapInPandas features.

    Exercises the full multimodal path (binary payload + typed metadata
    through Arrow-batched mapInPandas) with byte-verifiable outputs.
    Each row also carries its media type's rollup (asset count, total
    bytes, max chunks) as window aggregates — the former
    ``media_by_type`` driver row folded in (round-3 registry
    consolidation; one extra partial-agg exchange on ``media_type``).
    """
    from nomenklatura_spark.multimodal import assets_from_documents, extract_features

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(assets_from_documents(docs))
    w = Window.partitionBy("media_type")
    return feats.select(
        "*",
        F.count(F.lit(1)).over(w).alias("t_n_assets"),
        F.sum("n_bytes").over(w).alias("t_total_bytes"),
        F.max("n_chunks").over(w).alias("t_max_chunks"),
    )


_MEDIA_FEATURES_SQL = """
    SELECT *,
        count(*) OVER (PARTITION BY media_type) AS t_n_assets,
        CAST(sum(n_bytes) OVER (PARTITION BY media_type) AS BIGINT)
            AS t_total_bytes,
        max(n_chunks) OVER (PARTITION BY media_type) AS t_max_chunks
    FROM (
        SELECT doc_id AS asset_id,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                 WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
            octet_length(encode(text)) AS n_bytes,
            substring(text, 1, 4) AS header,
            CAST(octet_length(encode(text)) // 256 + 1 AS INT) AS n_chunks
        FROM documents
    )
    ORDER BY asset_id
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunking over the documents table (the
    pretraining-corpus shape; textops/chunks.py)."""
    from nomenklatura_spark.textops.chunks import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return (
        chunk_documents(docs)
        .select("doc_id", "chunk_idx", "n_words", "chunk_hash")
        .orderBy("doc_id", "chunk_idx")
    )


_DOC_CHUNKS_SQL = """
    WITH w AS (
        SELECT doc_id,
            list_filter(string_split_regex(text, '\\s+'), x -> x != '')
                AS words
        FROM documents
    ),
    c AS (
        SELECT doc_id,
            CAST(st // 48 AS INT) AS chunk_idx,
            array_to_string(list_slice(words, st + 1, st + 64), ' ')
                AS chunk_text
        FROM w, UNNEST(range(0,
            CAST(ceil(greatest(len(words) - 64, 0) / 48.0) AS INT) * 48 + 1,
            48)) AS t(st)
    )
    SELECT doc_id, chunk_idx,
        len(list_filter(string_split_regex(chunk_text, '\\s+'), x -> x != ''))
            AS n_words,
        md5(chunk_text) AS chunk_hash
    FROM c
    ORDER BY doc_id, chunk_idx
"""


def q_doc_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII class counts + scrubbed-text hash per document
    (textops/chunks.pii_features)."""
    from nomenklatura_spark.textops.chunks import pii_features

    docs = load_table(spark, sf_dir, "documents")
    return pii_features(docs).orderBy("doc_id")


def _doc_pii_sql() -> str:
    from nomenklatura_spark.textops.chunks import PII_PATTERNS

    counts = ", ".join(
        f"len(string_split_regex(text, '{p}')) - 1 AS n_{k}"
        for k, p in PII_PATTERNS.items()
    )
    scrub = "text"
    for kind, pattern in PII_PATTERNS.items():
        scrub = (
            f"regexp_replace({scrub}, '{pattern}', '[PII:{kind}]', 'g')"
        )
    return f"""
        SELECT doc_id, {counts}, md5({scrub}) AS scrubbed_hash
        FROM documents
        ORDER BY doc_id
    """


def q_xref_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — xref score summary over the scored candidate pairs."""
    from nomenklatura_spark.operators.diffs import xref_stats

    return xref_stats(q_pair_scores(spark, sf_dir))


_XREF_STATS_SQL = f"""
    SELECT count(*) AS n_pairs,
           round(avg(score), 6) AS avg_score,
           round(min(score), 6) AS min_score,
           round(max(score), 6) AS max_score
    FROM ({_PAIR_SCORES_SQL})
"""


def q_conflicting_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — conflict triangles: two entities matching the same candidate
    while negatively judged against each other.

    The match table and negative edge set are derived deterministically
    from the customer table (customers match the supplier with key ≡
    custkey mod 100; customers 100 apart are negatively judged) so both
    engines construct identical inputs.
    """
    from nomenklatura_spark.operators.diffs import conflicting_matches

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    matches = cust.select(
        F.concat(F.lit("supplier-"), (F.col("k") % 100).cast("string")).alias(
            "matching_id"
        ),
        F.concat(F.lit("customer-"), F.col("k").cast("string")).alias("matches_id"),
        F.lit(0.9).alias("score"),
    )
    shifted = cust.select((F.col("k") + 100).alias("k"))
    edge_keys = cust.join(shifted, "k")  # custkey where custkey-100 also exists
    edges = edge_keys.select(
        F.concat(F.lit("customer-"), (F.col("k") - 100).cast("string")).alias(
            "target"
        ),
        F.concat(F.lit("customer-"), F.col("k").cast("string")).alias("source"),
        F.lit("negative").alias("judgement"),
        F.lit(None).cast("string").alias("deleted_at"),
    )
    return conflicting_matches(matches, edges, threshold=0.5).orderBy(
        "candidate_id", "left_id", "right_id"
    )


_CONFLICTS_SQL = """
    WITH matches AS (
        SELECT 'supplier-' || CAST(c_custkey % 100 AS VARCHAR) AS matching_id,
               'customer-' || CAST(c_custkey AS VARCHAR) AS matches_id,
               0.9 AS score
        FROM customer
    ),
    sym AS (
        SELECT matching_id AS candidate_id, matches_id AS match_id FROM matches
        UNION
        SELECT matches_id, matching_id FROM matches
    ),
    combos AS (
        SELECT l.candidate_id, l.match_id AS left_id, r.match_id AS right_id
        FROM sym l JOIN sym r ON l.candidate_id = r.candidate_id
        WHERE l.match_id < r.match_id
    ),
    negative AS (
        SELECT least('customer-' || CAST(c_custkey - 100 AS VARCHAR),
                     'customer-' || CAST(c_custkey AS VARCHAR)) AS left_id,
               greatest('customer-' || CAST(c_custkey - 100 AS VARCHAR),
                        'customer-' || CAST(c_custkey AS VARCHAR)) AS right_id
        FROM customer
        WHERE (c_custkey - 100) IN (SELECT c_custkey FROM customer)
    )
    SELECT c.candidate_id, c.left_id, c.right_id
    FROM combos c JOIN negative n
      ON c.left_id = n.left_id AND c.right_id = n.right_id
    ORDER BY c.candidate_id, c.left_id, c.right_id
"""


def q_entity_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — ADD/MOD/DEL entity diff between two statement snapshots.

    old = corpus minus customers with custkey%10=3 (→ ADD in new), with
    part brands rewritten for partkey%10=7 (→ MOD); new = corpus minus
    suppliers with suppkey%10=1 (→ DEL).
    """
    from nomenklatura_spark.operators.diffs import entity_delta
    from nomenklatura_spark.model.statement import _stmt_id

    stmts = er_statements(spark, sf_dir)
    key = F.element_at(F.split(F.col("entity_id"), "-"), 2).cast("long")
    old_val = F.when(
        (F.col("schema") == "Part") & (key % 10 == 7) & (F.col("prop") == "brand"),
        F.concat(F.lit("OLD-"), F.col("value")),
    ).otherwise(F.col("value"))
    old = (
        stmts.where(~((F.col("schema") == "Customer") & (key % 10 == 3)))
        .withColumn("value", old_val)
        .withColumn("id", _stmt_id(F.col("entity_id"), F.col("prop"), F.col("value")))
    )
    new = stmts.where(~((F.col("schema") == "Supplier") & (key % 10 == 1)))
    return entity_delta(old, new).orderBy("canonical_id")


_ENTITY_DELTA_SQL = """
    WITH stmts AS (
        SELECT 'Part' AS schema, 'part-' || p_partkey AS entity_id, 'name' AS prop, p_name AS value FROM part
        UNION ALL SELECT 'Part', 'part-' || p_partkey, 'brand', p_brand FROM part
        UNION ALL SELECT 'Part', 'part-' || p_partkey, 'typeText', p_type FROM part
        UNION ALL SELECT 'Customer', 'customer-' || c_custkey, 'name', c_name FROM customer
        UNION ALL SELECT 'Customer', 'customer-' || c_custkey, 'segment', c_mktsegment FROM customer
        UNION ALL SELECT 'Supplier', 'supplier-' || s_suppkey, 'name', s_name FROM supplier
    ),
    keyed AS (
        SELECT *, CAST(string_split(entity_id, '-')[2] AS BIGINT) AS k FROM stmts
    ),
    old AS (
        SELECT entity_id,
            sha256(entity_id || chr(30) || prop || chr(30) ||
                CASE WHEN schema = 'Part' AND k % 10 = 7 AND prop = 'brand'
                     THEN 'OLD-' || value ELSE value END) AS id
        FROM keyed
        WHERE NOT (schema = 'Customer' AND k % 10 = 3)
    ),
    new AS (
        SELECT entity_id,
            sha256(entity_id || chr(30) || prop || chr(30) || value) AS id
        FROM keyed
        WHERE NOT (schema = 'Supplier' AND k % 10 = 1)
    ),
    o AS (SELECT entity_id, list_sort(list(DISTINCT id)) AS ids FROM old GROUP BY entity_id),
    n AS (SELECT entity_id, list_sort(list(DISTINCT id)) AS ids FROM new GROUP BY entity_id)
    SELECT coalesce(o.entity_id, n.entity_id) AS canonical_id,
        CASE WHEN o.entity_id IS NULL THEN 'ADD'
             WHEN n.entity_id IS NULL THEN 'DEL'
             WHEN o.ids != n.ids THEN 'MOD' END AS op
    FROM o FULL OUTER JOIN n ON o.entity_id = n.entity_id
    WHERE CASE WHEN o.entity_id IS NULL THEN 'ADD'
               WHEN n.entity_id IS NULL THEN 'DEL'
               WHEN o.ids != n.ids THEN 'MOD' END IS NOT NULL
    ORDER BY canonical_id
"""


def q_blocker_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — the dynamic-stopword leaderboard: the 10 most expensive tokens
    by compatible pair cost (the reference's diagnostic query,
    index.py:432-460), tie-broken on token for a stable cut."""
    stats = build_token_stats(
        er_entries(spark, sf_dir), er_schemata(spark), MAX_PAIR_COST,
        schema_pairs=SCHEMATA_PAIRS,
    )
    return (
        stats.where("stopword")
        .select(
            "token",
            "field",
            F.col("freq").cast("long").alias("freq"),
            F.col("df").cast("long").alias("df"),
            F.col("compatible_pair_cost").cast("long").alias(
                "compatible_pair_cost"
            ),
        )
        .orderBy(F.desc("compatible_pair_cost"), "token")
        .limit(10)
    )


_BLOCKER_STOPWORDS_SQL = f"""
    SELECT token, field, freq, df, compatible_pair_cost
    FROM ({_TOKEN_STATS_SQL})
    WHERE stopword
    ORDER BY compatible_pair_cost DESC, token
    LIMIT 10
"""


def q_resolver_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6/W3 — undecided suggestions ranked by score.

    Deterministic edge table from the customer keys: every customer k
    carries a suggestion edge for the pair (customer-k, supplier-(k mod
    100)) with score (k mod 97)/97; every k ≡ 0 (mod 10) additionally has
    a POSITIVE decision on the same pair, which must knock the suggestion
    out via the anti-join.
    """
    from nomenklatura_spark.resolver.edges import (
        NO_JUDGEMENT,
        POSITIVE,
        get_candidates,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    a = F.concat(F.lit("customer-"), F.col("k").cast("string"))
    b = F.concat(F.lit("supplier-"), (F.col("k") % 100).cast("string"))
    base = cust.select(
        F.greatest(a, b).alias("target"), F.least(a, b).alias("source"), "k"
    )
    common = [
        F.lit("test").alias("user"),
        F.lit("2024-01-01T00:00:00").alias("created_at"),
        F.lit(None).cast("string").alias("deleted_at"),
    ]
    sugg = base.select(
        "target",
        "source",
        F.lit(NO_JUDGEMENT).alias("judgement"),
        F.round((F.col("k") % 97) / 97.0, 6).alias("score"),
        *common,
    )
    dec = base.where(F.col("k") % 10 == 0).select(
        "target",
        "source",
        F.lit(POSITIVE).alias("judgement"),
        F.lit(None).cast("double").alias("score"),
        *common,
    )
    return get_candidates(sugg.unionByName(dec), limit=1000)


_RESOLVER_CANDIDATES_SQL = """
    WITH cust AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
    pairs AS (
        SELECT greatest('customer-' || CAST(k AS VARCHAR),
                        'supplier-' || CAST(k % 100 AS VARCHAR)) AS target,
               least('customer-' || CAST(k AS VARCHAR),
                     'supplier-' || CAST(k % 100 AS VARCHAR)) AS source,
               k
        FROM cust
    )
    SELECT target, source, round((k % 97) / 97.0, 6) AS score
    FROM pairs
    WHERE k % 10 != 0
    ORDER BY score DESC NULLS LAST, target, source
    LIMIT 1000
"""


def q_statements_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — first_seen carry-over between dataset snapshots as a pure
    transformation (``sources/versioned.carry_first_seen``): v1 lacks the
    Part brand statements; re-releasing the full corpus as v2 must keep
    v1's first_seen for surviving statement ids and stamp only the new
    rows with the v2 date."""
    from nomenklatura_spark.sources.versioned import carry_first_seen

    stmts = er_statements(spark, sf_dir)
    v1 = stmts.where(
        ~((F.col("schema") == "Part") & (F.col("prop") == "brand"))
    ).withColumn("first_seen", F.lit("2024-01-05 00:00:00").cast("timestamp"))
    v2 = stmts.withColumn(
        "first_seen", F.lit("2024-02-05 00:00:00").cast("timestamp")
    )
    out = carry_first_seen(v2, v1)
    return out.select(
        "entity_id",
        "prop",
        "value",
        F.date_format("first_seen", "yyyy-MM-dd").alias("first_seen"),
    ).orderBy("entity_id", "prop", "value")


_STATEMENTS_VERSIONED_SQL = """
    WITH stmts AS (
        SELECT 'Part' AS schema, 'part-' || p_partkey AS entity_id, 'name' AS prop, p_name AS value FROM part
        UNION ALL SELECT 'Part', 'part-' || p_partkey, 'brand', p_brand FROM part
        UNION ALL SELECT 'Part', 'part-' || p_partkey, 'typeText', p_type FROM part
        UNION ALL SELECT 'Customer', 'customer-' || c_custkey, 'name', c_name FROM customer
        UNION ALL SELECT 'Customer', 'customer-' || c_custkey, 'segment', c_mktsegment FROM customer
        UNION ALL SELECT 'Supplier', 'supplier-' || s_suppkey, 'name', s_name FROM supplier
    ),
    v1 AS (
        SELECT entity_id, prop, value FROM stmts
        WHERE NOT (schema = 'Part' AND prop = 'brand')
    )
    SELECT s.entity_id, s.prop, s.value,
           CASE WHEN v1.entity_id IS NOT NULL THEN '2024-01-05'
                ELSE '2024-02-05' END AS first_seen
    FROM stmts s
    LEFT JOIN v1 ON s.entity_id = v1.entity_id AND s.prop = v1.prop
               AND s.value = v1.value
    ORDER BY s.entity_id, s.prop, s.value
"""


def q_doc_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate pass: word bigrams whose document frequency
    reaches 5% of the corpus are boilerplate; per-doc gram counts and the
    boilerplate ratio drive downstream drop/trim decisions.  The
    boilerplate set is found with one partially-aggregated shuffle and
    broadcast back onto the map-side gram stream — the corpus is never
    joined against itself (see ``textops.analysis.boilerplate_stats``)."""
    from nomenklatura_spark.textops.analysis import boilerplate_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return boilerplate_stats(
        docs, "doc_id", "text", k=2, min_df=(1, 20)
    ).orderBy("doc_id")


_DOC_BOILERPLATE_SQL = f"""
    WITH ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    grams AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(w) - 1, 0)),
            i -> w[i] || ' ' || w[i+1])) AS sh
        FROM ws
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    dfreq AS (SELECT sh, count(*) AS gram_df FROM grams GROUP BY sh),
    boiler AS (SELECT sh FROM dfreq, n WHERE gram_df * 20 >= n_docs * 1),
    per_doc AS (
        SELECT g.doc_id,
               count(*) AS n_grams,
               count(b.sh) AS n_boilerplate
        FROM grams g LEFT JOIN boiler b ON g.sh = b.sh
        GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_grams, 0) AS n_grams,
           coalesce(p.n_boilerplate, 0) AS n_boilerplate,
           round(CASE WHEN coalesce(p.n_grams, 0) > 0
                      THEN p.n_boilerplate * 1.0 / p.n_grams
                      ELSE 0.0 END, 6) AS boilerplate_ratio
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY doc_id
"""


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup verdict: n-gram near-dup pairs -> connected
    components -> one survivor (min doc_id) per component, every corpus
    document accounted for (see ``dedup/survivors.py``)."""
    from nomenklatura_spark.dedup.survivors import select_survivors

    docs = load_table(spark, sf_dir, "documents")
    pairs = _spark_ngram_pairs(spark, sf_dir)
    return select_survivors(docs, pairs).orderBy("doc_id")


_DEDUP_SURVIVORS_SQL = f"""
    WITH RECURSIVE {_COMPONENT_WALK_SQL_BODY},
    comps AS (SELECT node, min(reached) AS component FROM walk GROUP BY node)
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS canonical_doc,
           (coalesce(c.component, d.doc_id) = d.doc_id) AS keep
    FROM documents d LEFT JOIN comps c ON d.doc_id = c.node
    ORDER BY d.doc_id
"""


def q_doc_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary rollup (tokenizer-training prep): per word, total
    occurrences and document frequency, top 100 by count.  Two-level
    aggregation — both shuffles partially aggregated, no countDistinct
    expand (see ``textops.analysis.corpus_vocab``)."""
    from nomenklatura_spark.textops.analysis import corpus_vocab

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return corpus_vocab(docs, "text", "doc_id", top_k=100)


_DOC_VOCAB_SQL = f"""
    WITH ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    tok AS (SELECT doc_id, unnest(w) AS word FROM ws),
    per_doc AS (SELECT doc_id, word, count(*) AS n FROM tok GROUP BY doc_id, word)
    SELECT word, CAST(sum(n) AS BIGINT) AS count, count(*) AS n_docs
    FROM per_doc GROUP BY word
    ORDER BY count DESC, word
    LIMIT 100
"""


def q_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shaped LM quality proxy: mean token surprisal under the
    corpus's own unigram model (see
    ``textops.analysis.unigram_logprob_scores``).  Cross-engine ln
    parity is already load-bearing in the flagship blocker_pairs IDF
    score, so the float contract here is proven ground."""
    from nomenklatura_spark.textops.analysis import unigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_logprob_scores(docs).orderBy("doc_id")


_DOC_LM_SCORE_SQL = f"""
    WITH ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    tok AS (SELECT doc_id, unnest(w) AS word FROM ws),
    vocab AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
    t AS (SELECT count(*) AS total FROM tok)
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(-ln(v.c * 1.0 / t.total)), 6) AS avg_neg_logprob
    FROM tok JOIN vocab v USING (word), t
    GROUP BY doc_id
    ORDER BY doc_id
"""


def q_doc_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score with Jelinek-Mercer interpolation
    (``textops.analysis.bigram_logprob_scores``): mean surprisal of each
    token given its predecessor under the corpus's own bigram model —
    the context-aware rung above ``doc_lm_score`` (catches degenerate
    repetition and boilerplate n-grams unigram frequency can't see).
    Bigrams are built map-side by zipping the token array against its
    shifted self; the oracle rebuilds them with a lag window."""
    from nomenklatura_spark.textops.analysis import bigram_logprob_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_logprob_scores(docs).orderBy("doc_id")


_DOC_LM_BIGRAM_SQL = f"""
    WITH ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    tok AS (
        SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS pos
        FROM ws WHERE len(w) > 0
    ),
    pairs AS (
        SELECT doc_id,
               COALESCE(lag(word) OVER (PARTITION BY doc_id ORDER BY pos),
                        '<s>') AS v,
               word AS w
        FROM tok
    ),
    bigrams AS (SELECT v, w, count(*) AS cb FROM pairs GROUP BY v, w),
    ctx AS (SELECT v, count(*) AS cv FROM pairs GROUP BY v),
    uni AS (SELECT w, count(*) AS cu FROM pairs GROUP BY w),
    t AS (SELECT count(*) AS total FROM pairs)
    SELECT p.doc_id, count(*) AS n_tokens,
           round(avg(-ln(0.7 * b.cb / c.cv
                         + (1.0 - 0.7) * u.cu / t.total)), 6)
               AS avg_neg_logprob_bi
    FROM pairs p
    JOIN bigrams b USING (v, w)
    JOIN ctx c USING (v)
    JOIN uni u USING (w), t
    GROUP BY p.doc_id
    ORDER BY p.doc_id
"""


def q_doc_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (``textops.analysis.source_cap``):
    RefinedWeb-style domain capping — at most 10 docs per source by
    deterministic md5 order.  The rank filter rides the window, so
    WindowGroupLimit bounds what each map task ships (plan-asserted in
    tests/test_retrieval.py)."""
    from nomenklatura_spark.textops.analysis import source_cap

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        source_cap(docs, "source", "doc_id", cap=10)
        .select("doc_id", "source", F.col("src_rank").cast("int").alias("src_rank"))
        .orderBy("source", "src_rank")
    )


_DOC_SOURCE_CAP_SQL = """
    WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS src_rank
        FROM documents
    )
    SELECT doc_id, source, CAST(src_rank AS INT) AS src_rank
    FROM r WHERE src_rank <= 10 ORDER BY source, src_rank
"""


def q_doc_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic train/val/test split
    (``textops.analysis.stratified_split``): exact 90/5/5 per language
    by salted-md5 rank with integer cut boundaries — reproducible under
    any partitioning, exact per-stratum counts."""
    from nomenklatura_spark.textops.analysis import stratified_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_split(docs, "lang", "doc_id").orderBy("doc_id")


_DOC_SPLIT_SQL = """
    WITH r AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5('split:' || CAST(doc_id AS VARCHAR)), doc_id
               ) - 1 AS rk,
               count(*) OVER (PARTITION BY lang) AS n
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN rk < (n * 90) // 100 THEN 'train'
                WHEN rk < (n * 95) // 100 THEN 'val'
                ELSE 'test' END AS split
    FROM r ORDER BY doc_id
"""


def q_doc_split_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split (``textops/analysis.leakage_safe_split``):
    near-duplicate families (connected components of the memoized
    n-gram dup graph) move between train/val/test as ATOMIC units, so
    no eval document has a training near-copy — the contamination a
    per-document split cannot prevent.  Split = md5 bucket of the
    family representative (approximate 90/5/5; exact cuts are
    impossible once docs move in groups); the oracle replays the
    recursive component walk + the same bucket arithmetic."""
    from nomenklatura_spark.textops.analysis import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = _spark_ngram_pairs(spark, sf_dir)
    return leakage_safe_split(docs, pairs).orderBy("doc_id")


_DOC_SPLIT_SAFE_SQL = f"""
    WITH RECURSIVE {_COMPONENT_WALK_SQL_BODY},
    comp AS (SELECT node, min(reached) AS component FROM walk GROUP BY node),
    fam AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS family
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    b AS (
        SELECT doc_id, family,
            CAST(('0x' || substr(md5('famsplit:' || CAST(family AS VARCHAR)),
                                 1, 15)) AS BIGINT) % 1000 AS bucket
        FROM fam
    )
    SELECT doc_id, family,
        CASE WHEN bucket < 900 THEN 'train'
             WHEN bucket < 950 THEN 'val'
             ELSE 'test' END AS split
    FROM b ORDER BY doc_id
"""


def q_doc_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitor (``textops.analysis.unigram_drift``): the 25
    words whose smoothed unigram probability moved most between the two
    snapshot halves (doc_id parity stands in for crawl N vs N+1), with
    each word's KL(new‖old) contribution.  Rank key is the 9dp-rounded
    delta (round-before-rank float discipline), ties by word."""
    from nomenklatura_spark.textops.analysis import unigram_drift

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    drift = unigram_drift(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
    )
    return drift.orderBy(
        F.abs(F.col("delta")).desc(), F.col("word")
    ).limit(25)


def q_doc_drift_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift answered from STORED vocabulary snapshots
    (``streaming/vocab_index.py`` + ``unigram_drift_from_counts``):
    even-id docs fold in as batch 0 (index version 0 = "yesterday"),
    odd-id docs as batch 1 (version 1 = "today"), and the what-changed
    table comes from reading the two versions — neither corpus
    snapshot is rescanned at question time.  The monitoring twin of
    the retrieval/ANN/sketch/funnel at-rest serving rows; the oracle
    recomputes both vocabularies from raw text, so hash-green proves
    the maintained counters reproduce the rescan exactly."""
    import shutil
    import tempfile

    from nomenklatura_spark.streaming.vocab_index import VocabIndexState
    from nomenklatura_spark.textops.analysis import unigram_drift_from_counts

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="nk_vocab_drift_")
    try:
        state = VocabIndexState(spark, root)
        prof = _fold_serve("doc_drift_served")
        with prof.fold():
            state.apply_batch(
                docs.where(F.col("doc_id") % 2 == 0), batch_id=0
            )
        with prof.fold():
            state.apply_batch(
                docs.where(F.col("doc_id") % 2 == 1), batch_id=1
            )
        drift = unigram_drift_from_counts(
            state.vocab(version=0).select("word", "count"),
            state.vocab(version=1).select("word", "count"),
        )
        out = drift.orderBy(
            F.abs(F.col("delta")).desc(), F.col("word")
        ).limit(25)
        # driver-materialize (25 rows) — see events_hll_weekly_served
        with prof.serve():
            rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_DOC_DRIFT_SERVED_SQL = f"""
    WITH ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    tok AS (SELECT doc_id, unnest(w) AS word FROM ws),
    old_c AS (
        SELECT word, count(*) AS c_old FROM tok
        WHERE doc_id % 2 = 0 GROUP BY word
    ),
    new_c AS (SELECT word, count(*) AS c_new FROM tok GROUP BY word),
    co AS (
        SELECT COALESCE(o.word, n.word) AS word,
            COALESCE(o.c_old, 0) AS c_old,
            COALESCE(n.c_new, 0) AS c_new
        FROM old_c o FULL OUTER JOIN new_c n ON o.word = n.word
    ),
    tot AS (SELECT sum(c_old) AS t_old, sum(c_new) AS t_new,
                   count(*) AS v FROM co),
    p AS (
        SELECT word, c_old, c_new,
            (c_old + 1) * 1.0 / (t_old + v) AS po,
            (c_new + 1) * 1.0 / (t_new + v) AS pn
        FROM co, tot
    )
    SELECT word, CAST(c_old AS BIGINT) AS c_old,
        CAST(c_new AS BIGINT) AS c_new,
        round(po, 9) AS p_old, round(pn, 9) AS p_new,
        round(pn - po, 9) AS delta,
        round(pn * ln(pn / po), 9) AS kl_term
    FROM p
    ORDER BY abs(round(pn - po, 9)) DESC, word
    LIMIT 25
"""


_DOC_DRIFT_SQL = f"""
    WITH ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    tok AS (SELECT doc_id % 2 AS side, unnest(w) AS word FROM ws),
    co AS (
        SELECT word,
               count(*) FILTER (WHERE side = 0) AS c_old,
               count(*) FILTER (WHERE side = 1) AS c_new
        FROM tok GROUP BY word
    ),
    tot AS (SELECT sum(c_old) AS t_old, sum(c_new) AS t_new, count(*) AS v FROM co),
    p AS (
        SELECT word, c_old, c_new,
               (c_old + 1) * 1.0 / (t_old + v) AS po,
               (c_new + 1) * 1.0 / (t_new + v) AS pn
        FROM co, tot
    )
    SELECT word, CAST(c_old AS BIGINT) AS c_old, CAST(c_new AS BIGINT) AS c_new,
           round(po, 9) AS p_old, round(pn, 9) AS p_new,
           round(pn - po, 9) AS delta,
           round(pn * ln(pn / po), 9) AS kl_term
    FROM p
    ORDER BY abs(round(pn - po, 9)) DESC, word
    LIMIT 25
"""


def q_doc_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked selection under a 10k-token budget per language
    (``textops.analysis.budget_select``): the data-selection assembly
    step — fill each stratum's budget with its best-scoring docs via one
    running-sum window; rank key is the rounded score (ties by id)."""
    from nomenklatura_spark.textops.analysis import budget_select

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    out = budget_select(docs, budget_tokens=10_000)
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("stratum").alias("lang"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "score",
        "cum_tokens",
    ).orderBy("lang", "cum_tokens")


def _budget_select_sql() -> str:
    stops = _sql_list(LANG_MARKERS["en"])
    wsplit = (
        "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'),"
        " x -> x != '')"
    )
    return f"""
        WITH base AS (SELECT doc_id, lang, {wsplit} AS ws FROM documents),
        feat AS (
            SELECT doc_id, lang, len(ws) AS n_tokens,
                round(CASE WHEN len(ws) > 0
                    THEN len(list_filter(ws, w -> w IN {stops})) * 1.0 / len(ws)
                    ELSE 0.0 END, 6) AS score
            FROM base
        ),
        run AS (
            SELECT *, sum(n_tokens) OVER (
                PARTITION BY lang ORDER BY score DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS cum_tokens
            FROM feat
        )
        SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens, score,
               CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM run WHERE cum_tokens <= 10000
        ORDER BY lang, cum_tokens
    """


def q_doc_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 more-like-this retrieval (``textops/retrieval.py``): the 8
    md5-first documents as queries, top-5 corpus matches each by Okapi
    BM25 (Lucene idf, k1=1.2, b=0.75), self-matches excluded.  Document
    frequencies are computed only for query terms (semi-join before the
    rollup), so the plan carries no vocabulary-sized aggregate."""
    from nomenklatura_spark.textops.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    probes = docs.orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    ).limit(8)
    return bm25_topk(
        docs,
        probes,
        id_col="doc_id",
        text_col="text",
        query_id_col="doc_id",
        query_text_col="text",
        k=5,
        exclude_self=True,
    ).orderBy("query_id", "rank")


def _doc_bm25_sql(n_queries: int = 8, k: int = 5, k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
    WITH ws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS word FROM ws),
    tf AS (SELECT doc_id, dl, word, count(*) AS n
           FROM tok GROUP BY doc_id, dl, word),
    stats AS (SELECT count(*) AS n_docs,
                     sum(len(w)) * 1.0 / count(*) AS avgdl FROM ws),
    probes AS (SELECT doc_id AS query_id FROM documents
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {n_queries}),
    qt AS (SELECT DISTINCT p.query_id, t.word
           FROM probes p JOIN tok t ON t.doc_id = p.query_id),
    dfq AS (SELECT word, count(*) AS df FROM tf
            WHERE word IN (SELECT word FROM qt) GROUP BY word),
    qidf AS (SELECT qt.query_id, qt.word, s.avgdl,
                    ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf
             FROM qt JOIN dfq d USING (word), stats s),
    sc AS (SELECT qi.query_id, tf.doc_id,
                  count(*) AS n_terms,
                  round(sum(qi.idf * (tf.n * ({k1} + 1.0))
                        / (tf.n + {k1} * (1.0 - {b} + {b} * tf.dl / qi.avgdl))), 6)
                      AS bm25
           FROM tf JOIN qidf qi USING (word)
           WHERE tf.doc_id <> qi.query_id
           GROUP BY qi.query_id, tf.doc_id),
    r AS (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rank
          FROM sc)
    SELECT query_id, doc_id, n_terms, bm25, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= {k} ORDER BY query_id, rank
"""


def q_doc_search_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical) and hashed-BoW cosine (semantic)
    top-20 runs fused by reciprocal rank (k0=60), top-10 per query —
    the standard two-tower retrieval composition, here entirely from
    oracle-proven tiers (``bm25_topk`` + ``cosine_topk`` over
    ``hashed_embeddings``) so the fusion itself is the only new
    algebra.  Ranks are small integers → the fused score is
    cross-engine exact; the oracle replays both runs and the fusion."""
    from nomenklatura_spark.ann.brute import cosine_topk
    from nomenklatura_spark.textops.embed import hashed_embeddings
    from nomenklatura_spark.textops.retrieval import bm25_topk, rrf_fuse

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    probes = docs.orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    ).limit(8)
    lex = bm25_topk(
        docs,
        probes,
        id_col="doc_id",
        text_col="text",
        query_id_col="doc_id",
        query_text_col="text",
        k=20,
        exclude_self=True,
    )
    # corpus vectors from the per-(session, corpus) memoized artifact —
    # the serving shape doc_clusters already uses: embeddings are
    # computed once per corpus and every retrieval call reuses the
    # persisted relation (hashed_embeddings with identical params, so
    # the oracle replay is unaffected)
    emb = _doc_emb_cached(spark, sf_dir)
    # probe vectors from the 8 probe docs alone: feature hashing is
    # per-document (no corpus statistics), so this is value-identical
    # to filtering the corpus embeddings and skips a full embed pass
    # inside cosine_topk's query-matrix collect (measured 10.6s -> 6s
    # for the whole row at sf0.1)
    qv = hashed_embeddings(probes, "doc_id", "text", dim=64)
    sem = cosine_topk(emb, qv, id_col="doc_id", vec_col="embedding", k=20)
    return rrf_fuse(
        {
            "lex": lex,
            "sem": sem.select(
                "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
            ),
        },
        k=10,
    ).orderBy("query_id", "rank")


def _doc_hybrid_sql(n_queries: int = 8, run_k: int = 20, k: int = 10) -> str:
    words = (
        "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'),"
        " x -> x != '')"
    )
    return f"""
    WITH lex AS (
        SELECT query_id, doc_id, rank
        FROM ({_doc_bm25_sql(n_queries, run_k)})
    ),
    w2 AS (SELECT doc_id, unnest({words}) AS w FROM documents),
    h2 AS (
        SELECT doc_id,
            CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 64 AS b,
            CASE WHEN CAST(('0x' || substr(md5('sgn:' || w), 1, 2)) AS INT)
                      % 2 = 0
                 THEN 1.0 ELSE -1.0 END AS s
        FROM w2
    ),
    hist2 AS (SELECT doc_id, b, sum(s) AS v FROM h2 GROUP BY doc_id, b),
    nrm2 AS (SELECT doc_id, sqrt(sum(v * v)) AS n FROM hist2 GROUP BY doc_id),
    grid2 AS (
        SELECT d.doc_id, k AS pos
        FROM (SELECT DISTINCT doc_id FROM documents) d,
            LATERAL (SELECT unnest(generate_series(0, 63)) AS k)
    ),
    emb2 AS (
        SELECT g.doc_id,
            list(round(COALESCE(h.v, 0.0)
                       / greatest(COALESCE(n.n, 0.0), 1e-12), 6)
                 ORDER BY g.pos) AS e
        FROM grid2 g
        LEFT JOIN hist2 h ON h.doc_id = g.doc_id AND h.b = g.pos
        LEFT JOIN nrm2 n ON n.doc_id = g.doc_id
        GROUP BY g.doc_id
    ),
    vecs2 AS (
        SELECT doc_id AS id,
            list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS vec
        FROM emb2
    ),
    probes2 AS (SELECT doc_id AS query_id FROM documents
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                LIMIT {n_queries}),
    qv AS (SELECT p.query_id, v.vec FROM probes2 p
           JOIN vecs2 v ON v.id = p.query_id),
    cs AS (
        SELECT q.query_id, c.id AS doc_id,
            round(list_dot_product(q.vec, c.vec), 6) AS sim
        FROM qv q JOIN vecs2 c ON c.id <> q.query_id
    ),
    sem AS (
        SELECT query_id, doc_id, rank FROM (
            SELECT query_id, doc_id, row_number() OVER (
                PARTITION BY query_id ORDER BY sim DESC, doc_id) AS rank
            FROM cs
        ) WHERE rank <= {run_k}
    ),
    fused AS (
        SELECT COALESCE(l.query_id, s.query_id) AS query_id,
               COALESCE(l.doc_id, s.doc_id) AS doc_id,
               COALESCE(l.rank, 0) AS lex_rank,
               COALESCE(s.rank, 0) AS sem_rank,
               COALESCE(1.0 / (60 + l.rank), 0.0)
                   + COALESCE(1.0 / (60 + s.rank), 0.0) AS score
        FROM lex l FULL OUTER JOIN sem s
            ON l.query_id = s.query_id AND l.doc_id = s.doc_id
    ),
    ranked AS (
        SELECT query_id, doc_id, lex_rank, sem_rank,
               round(score, 6) AS rrf,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM fused
    )
    SELECT query_id, doc_id,
           CAST(lex_rank AS INT) AS lex_rank,
           CAST(sem_rank AS INT) AS sem_rank,
           rrf, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    ORDER BY query_id, rank
"""


def q_doc_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the corpus token stream
    (``operators/sketch.py``): the true top-20 words next to their CMS
    estimates and the one-sided overcount.  The sketch collapses the
    unbounded vocabulary into depth*width counters through ONE
    partially-aggregated shuffle — the mergeable alternative to the
    vocabulary-sized rollup (`doc_vocab`) when only heavy hitters
    matter; everything is exact BIGINT, so the oracle replay is
    bit-for-bit."""
    from nomenklatura_spark.dedup.ngram import (
        normalize_for_shingles,
        widen_small_scan,
    )
    from nomenklatura_spark.operators.sketch import cms_lookup, cms_sketch

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.filter(
        F.split(normalize_for_shingles(F.col("text")), " "), lambda w: w != ""
    )
    tok = widen_small_scan(docs).select(F.explode(ws).alias("w"))
    # 20 rows by contract -> LocalRelation: the top list feeds BOTH the
    # result join and the CMS probes, and a lazy lineage would re-run
    # the corpus rollup per branch
    from nomenklatura_spark.ann.brute import materialize_local

    top = materialize_local(
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .orderBy(F.desc("n_true"), "w")
        .limit(20)
    )
    est = cms_lookup(cms_sketch(tok, "w"), top.select("w"), "w")
    return (
        top.join(est, top["w"] == est["value"])
        .select(
            F.col("w").alias("word"),
            "n_true",
            "n_cms",
            (F.col("n_cms") - F.col("n_true")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("n_true"), "word")
    )


_DOC_HEAVY_HITTERS_SQL = f"""
    WITH tok AS (SELECT unnest({_DOC_WORDS}) AS w FROM documents),
    tru AS (
        SELECT w AS word, COUNT(*) AS n_true FROM tok GROUP BY w
        ORDER BY n_true DESC, word LIMIT 20
    ),
    cnts AS (
        SELECT dd.d,
            CAST(('0x' || substr(md5('cms' || CAST(dd.d AS VARCHAR)
                 || ':' || w), 1, 15)) AS BIGINT) % 1024 AS bucket,
            COUNT(*) AS cnt
        FROM tok, (SELECT unnest([0, 1, 2, 3]) AS d) dd
        GROUP BY 1, 2
    ),
    probes AS (
        SELECT t.word, t.n_true, dd.d,
            CAST(('0x' || substr(md5('cms' || CAST(dd.d AS VARCHAR)
                 || ':' || t.word), 1, 15)) AS BIGINT) % 1024 AS bucket
        FROM tru t, (SELECT unnest([0, 1, 2, 3]) AS d) dd
    ),
    est AS (
        SELECT p.word, p.n_true, MIN(COALESCE(c.cnt, 0)) AS n_cms
        FROM probes p LEFT JOIN cnts c ON c.d = p.d AND c.bucket = p.bucket
        GROUP BY p.word, p.n_true
    )
    SELECT word, n_true, CAST(n_cms AS BIGINT) AS n_cms,
           CAST(n_cms - n_true AS BIGINT) AS overcount
    FROM est ORDER BY n_true DESC, word
"""


@plan_cache(maxsize=8)
def _doc_emb_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted hashed-BoW corpus embeddings, once per (session,
    corpus) — shared by the retrieval (hybrid) and domain-clustering
    tiers.  persist(), NOT localCheckpoint: plan_cache's eviction
    contract is DataFrame.unpersist(), a no-op for checkpoint blocks —
    a cached checkpoint would outlive its eviction until JVM GC."""
    from nomenklatura_spark.textops.embed import hashed_embeddings

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return hashed_embeddings(docs, "doc_id", "text", dim=64).persist()


@plan_cache(maxsize=8)
def _doc_centroids_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained domain centroids over the memoized embeddings (the
    ``_ann_codebooks_cached`` shape).  Training is hash-seeded and
    round(9)-pinned, so the memoized codebook is byte-identical to an
    in-query retrain and the oracle replay is unaffected.  Split from
    the embedding memoizer so a retrieval-only session never pays the
    k-means passes, and so neither cache can unpersist a frame the
    other still serves."""
    from nomenklatura_spark.ann.brute import materialize_local
    from nomenklatura_spark.ann.ivf import train_centroids

    return materialize_local(
        train_centroids(
            _doc_emb_cached(spark, sf_dir),
            "doc_id",
            "embedding",
            n_centroids=8,
            n_iter=2,
        )
    )


def _doc_domain_artifacts_cached(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(persisted doc embeddings, trained domain centroids)."""
    return _doc_emb_cached(spark, sf_dir), _doc_centroids_cached(spark, sf_dir)


def q_doc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain discovery + alpha-sampling mix weights
    (``textops/domains.py``): k-means over the hashed-BoW document
    embeddings (the oracle-proven deterministic Lloyd tier), per-cluster
    sizes, and the multilingual alpha-sampling weight that flattens the
    discovered domain distribution (α=0.5).  The DoReMi/cluster-
    conditioned-sampling pipeline step."""
    from nomenklatura_spark.textops.domains import domain_clusters

    emb, centroids = _doc_domain_artifacts_cached(spark, sf_dir)
    out = domain_clusters(
        emb,
        "doc_id",
        "embedding",
        n_clusters=8,
        n_iter=2,
        alpha=0.5,
        centroids=centroids,
    )
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("cluster").cast("int").alias("cluster"),
        "cluster_size",
        "mix_weight",
    ).orderBy("doc_id")


_CLUSTER_WORDS = (
    "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'),"
    " x -> x != '')"
)


def _doc_cluster_chain_ctes(n_clusters: int = 8) -> str:
    """The shared CTE chain hashed-BoW embed → re-normalize →
    md5-seeded 2-round Lloyd → assignment (`inv`), reused by the
    `doc_clusters` and `doc_cluster_keywords` oracles."""
    words = _CLUSTER_WORDS
    return f"""w AS (
        SELECT doc_id, unnest({words}) AS w
        FROM documents
    ),
    h AS (
        SELECT doc_id,
            CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 64 AS b,
            CASE WHEN CAST(('0x' || substr(md5('sgn:' || w), 1, 2)) AS INT)
                      % 2 = 0
                 THEN 1.0 ELSE -1.0 END AS s
        FROM w
    ),
    hist AS (SELECT doc_id, b, sum(s) AS v FROM h GROUP BY doc_id, b),
    nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS n FROM hist GROUP BY doc_id),
    grid AS (
        SELECT d.doc_id, k AS pos
        FROM (SELECT DISTINCT doc_id FROM documents) d,
            LATERAL (SELECT unnest(generate_series(0, 63)) AS k)
    ),
    emb AS (
        SELECT g.doc_id,
            list(round(COALESCE(h.v, 0.0)
                       / greatest(COALESCE(n.n, 0.0), 1e-12), 6)
                 ORDER BY g.pos) AS e
        FROM grid g
        LEFT JOIN hist h ON h.doc_id = g.doc_id AND h.b = g.pos
        LEFT JOIN nrm n ON n.doc_id = g.doc_id
        GROUP BY g.doc_id
    ),
    vecs AS (
        SELECT doc_id AS id,
            list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS vec
        FROM emb
    ),
    seeds AS (
        SELECT CAST(rk - 1 AS INT) AS centroid, vec AS c_vec FROM (
            SELECT vec, row_number() OVER (
                ORDER BY md5(CAST(id AS VARCHAR)), id
            ) AS rk
            FROM vecs
        ) WHERE rk <= {n_clusters}
    ),
    a1 AS ({_ivf_assign_sql("vecs", "seeds")}),
    c1 AS ({_ivf_update_sql("a1")}),
    a2 AS ({_ivf_assign_sql("vecs", "c1")}),
    c2 AS ({_ivf_update_sql("a2")}),
    inv AS ({_ivf_assign_sql("vecs", "c2")})"""


def _doc_clusters_sql(n_clusters: int = 8, alpha: float = 0.5) -> str:
    """Cluster sizes + alpha weights on top of the shared Lloyd chain."""
    return f"""
    WITH {_doc_cluster_chain_ctes(n_clusters)},
    sizes AS (SELECT centroid, count(*) AS cluster_size FROM inv
              GROUP BY centroid),
    tot AS (SELECT sum(cluster_size) AS n FROM sizes),
    shared AS (
        SELECT centroid, cluster_size,
            cluster_size * 1.0 / t.n AS share,
            round(pow(cluster_size * 1.0 / t.n, {alpha}), 9) AS sh_a
        FROM sizes CROSS JOIN tot t
    ),
    z AS (SELECT sum(sh_a) AS z FROM shared)
    SELECT i.id AS doc_id, CAST(i.centroid AS INT) AS cluster,
        s.cluster_size,
        round(s.sh_a / z.z / s.share, 6) AS mix_weight
    FROM inv i
    JOIN shared s USING (centroid)
    CROSS JOIN z
    ORDER BY doc_id
"""


def q_doc_cluster_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c-TF-IDF keyword labels for the discovered domain clusters
    (``textops/domains.cluster_keywords``): top-10 words per cluster by
    ``tf_{w,c} * ln(1 + A / f_w)`` — the BERTopic-style step that turns
    `doc_clusters`' opaque ids into auditable topic labels when
    deciding what a training mixture actually contains.  Reuses the
    memoized embeddings + centroids (one Lloyd chain per session), so
    the row's own cost is the token shuffle + two partial aggs; the
    oracle replays the full chain from raw text."""
    from nomenklatura_spark.ann.ivf import ivf_assign
    from nomenklatura_spark.textops.domains import cluster_keywords

    emb, centroids = _doc_domain_artifacts_cached(spark, sf_dir)
    assign = ivf_assign(emb, centroids, "doc_id", "embedding").select(
        "id", F.col("centroid").alias("cluster")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = cluster_keywords(
        docs, assign, id_col="doc_id", text_col="text",
        cluster_col="cluster", top_k=10,
    )
    return out.select(
        F.col("cluster").cast("int").alias("cluster"),
        "rank",
        "word",
        "tf",
        "score",
    ).orderBy("cluster", "rank")


def _doc_cluster_keywords_sql(n_clusters: int = 8, top_k: int = 10) -> str:
    return f"""
    WITH {_doc_cluster_chain_ctes(n_clusters)},
    tokw AS (
        SELECT doc_id, unnest({_CLUSTER_WORDS}) AS w FROM documents
    ),
    asg AS (SELECT id AS doc_id, centroid AS c FROM inv),
    tf AS (
        SELECT a.c, t.w, count(*) AS tf
        FROM tokw t JOIN asg a USING (doc_id)
        GROUP BY a.c, t.w
    ),
    fw AS (SELECT w, sum(tf) AS fw FROM tf GROUP BY w),
    aa AS (
        SELECT CAST(sum(tf) AS DOUBLE) / count(DISTINCT c) AS a FROM tf
    ),
    scored AS (
        SELECT tf.c, tf.w, tf.tf,
            round(tf.tf * ln(1.0 + aa.a / fw.fw), 6) AS score
        FROM tf JOIN fw USING (w) CROSS JOIN aa
    ),
    rk AS (
        SELECT c, w, tf, score,
            row_number() OVER (
                PARTITION BY c ORDER BY score DESC, w
            ) AS rank
        FROM scored
    )
    SELECT CAST(c AS INT) AS cluster, CAST(rank AS INT) AS rank,
        w AS word, CAST(tf AS BIGINT) AS tf, score
    FROM rk WHERE rank <= {top_k}
    ORDER BY cluster, rank
"""


def q_doc_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (``textops/dsir.py``): hashed
    unigram+bigram log-likelihood-ratio weights (target = the curated
    sources, source = the whole corpus, Laplace-smoothed 256-bucket
    models) and a deterministic Gumbel-top-100 resample.  The third
    data-selection method on the shared supervision (with
    ``doc_quality_classifier`` and ``doc_clusters``)."""
    from nomenklatura_spark.textops.dsir import dsir_resample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    out = dsir_resample(
        docs, F.col("source").isin(*CLF_POSITIVE_SOURCES), k=100
    )
    return out.select(
        F.col("id").alias("doc_id"), "dsir_logweight", "sample_key", "sampled"
    ).orderBy("doc_id")


def _doc_dsir_sql(n_buckets: int = 256, k: int = 100) -> str:
    srcs = ", ".join(f"'{s}'" for s in CLF_POSITIVE_SOURCES)
    u = (
        "((CAST(('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 15))"
        " AS BIGINT) % 100000) + 0.5) / 100000.0"
    )
    return f"""
    WITH ws AS (
        SELECT doc_id, source, {_DOC_WORDS} AS w FROM documents
    ),
    gr AS (
        SELECT doc_id, source,
            unnest(w || CASE WHEN len(w) >= 2
                THEN list_transform(generate_series(1, len(w) - 1),
                                    i -> w[i] || ' ' || w[i + 1])
                ELSE CAST([] AS VARCHAR[]) END) AS g
        FROM ws
    ),
    st AS (
        SELECT doc_id, source IN ({srcs}) AS t,
            CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % {n_buckets} AS b
        FROM gr
    ),
    doc_counts AS (SELECT doc_id, b, count(*) AS c FROM st GROUP BY doc_id, b),
    bc AS (
        SELECT b, count(*) AS cs, count(*) FILTER (WHERE t) AS ct
        FROM st GROUP BY b
    ),
    tot AS (SELECT sum(cs) AS ts, sum(ct) AS tt FROM bc),
    grid AS (
        SELECT gs.b, COALESCE(bc.cs, 0) AS cs, COALESCE(bc.ct, 0) AS ct
        FROM (SELECT unnest(generate_series(0, {n_buckets - 1})) AS b) gs
        LEFT JOIN bc USING (b)
    ),
    ratios AS (
        SELECT b, CAST(round((ln((ct + 1.0) / (t.tt + {n_buckets}))
                      - ln((cs + 1.0) / (t.ts + {n_buckets}))) * 1e9)
                  AS BIGINT) AS lr9
        FROM grid CROSS JOIN tot t
    ),
    summed AS (
        SELECT doc_id, CAST(sum(c * lr9) AS BIGINT) AS s9
        FROM doc_counts JOIN ratios USING (b) GROUP BY doc_id
    ),
    wts AS (
        SELECT d.doc_id, COALESCE(s.s9, 0) AS w9,
            round(COALESCE(s.s9, 0) / 1e9, 9) AS dsir_logweight
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN summed s USING (doc_id)
    ),
    scored AS (
        SELECT doc_id, dsir_logweight,
            round((w9 + CAST(round(-ln(-ln({u})) * 1e9) AS BIGINT)) / 1e9, 9)
                AS sample_key
        FROM wts
    ),
    top AS (
        SELECT doc_id FROM scored ORDER BY sample_key DESC, doc_id LIMIT {k}
    )
    SELECT s.doc_id, s.dsir_logweight, s.sample_key,
        t.doc_id IS NOT NULL AS sampled
    FROM scored s LEFT JOIN top t USING (doc_id)
    ORDER BY s.doc_id
"""


# fastText/DCLM-style membership supervision: the first five sources play
# the curated corpus, the rest the crawl.  Arbitrary but fixed — the
# classifier learns whatever signal separates them; what the oracle
# verifies is the distributed training trajectory itself.
CLF_POSITIVE_SOURCES = ("src0", "src1", "src2", "src3", "src4")
CLF_N_ITER = 6
CLF_LR = 2.0
CLF_EVAL_PERMILLE = 200


def q_doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality-classifier filter (fastText/DCLM shape): corpus-
    membership labels, full-batch GD logistic fit on an md5-split train
    fold, closed-form scoring of every document.  The oracle replays the
    ENTIRE training loop as unrolled CTEs (gradient means and weights
    rounded to 9dp per iteration — the k-means Lloyd contract), so the
    fit is value-verified, not just the final arithmetic (contrast
    ``pair_scores_regression``, which pins coefficients).  See
    ``textops/classifier.py`` for the 100 TB cost model."""
    from nomenklatura_spark.textops.classifier import quality_classifier_scores

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    return quality_classifier_scores(
        docs,
        CLF_POSITIVE_SOURCES,
        n_iter=CLF_N_ITER,
        lr=CLF_LR,
        eval_permille=CLF_EVAL_PERMILLE,
    ).orderBy("doc_id")


def _quality_clf_sql(
    n_iter: int = CLF_N_ITER,
    lr: float = CLF_LR,
    eval_permille: int = CLF_EVAL_PERMILLE,
) -> str:
    """Unrolled gradient-descent replay of ``train_quality_lr``: CTE
    ``g{i}`` aggregates the 9dp-rounded mean gradient under weights
    ``w{i-1}``; CTE ``w{i}`` applies the 9dp-rounded update.  Feature,
    label and split expressions mirror ``classifier_features`` /
    ``quality_classifier_scores`` term for term."""
    words = (
        "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'),"
        " x -> x != '')"
    )
    en = _sql_list(LANG_MARKERS["en"])
    srcs = ", ".join(f"'{s}'" for s in CLF_POSITIVE_SOURCES)
    ctes = [
        f"""base AS (
        SELECT doc_id, source, {words} AS ws, length(text) AS n_chars, text
        FROM documents
    ),
    feats AS (
        SELECT doc_id,
            CASE WHEN source IN ({srcs}) THEN 1.0 ELSE 0.0 END AS label,
            (CAST(('0x' || substr(md5('clf:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1000) >= {eval_permille} AS is_train,
            round(CASE WHEN len(ws) > 0
                THEN len(list_filter(ws, w -> w IN {en})) * 1.0 / len(ws)
                ELSE 0.0 END, 4) AS f_stop,
            round(CASE WHEN n_chars > 0
                THEN len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / n_chars
                ELSE 0.0 END, 4) AS f_punct,
            round(least(CASE WHEN len(ws) > 0
                THEN list_sum(list_transform(ws, w -> length(w))) * 1.0 / len(ws)
                ELSE 0.0 END / 12.0, 1.0), 4) AS f_wlen,
            round(CASE WHEN n_chars > 0
                THEN len(regexp_extract_all(text, '[0-9]')) * 1.0 / n_chars
                ELSE 0.0 END, 4) AS f_digit
        FROM base
    ),
    w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4, 0.0 AS b)"""
    ]
    lin = (
        "w.b + w.w1 * f.f_stop + w.w2 * f.f_punct"
        " + w.w3 * f.f_wlen + w.w4 * f.f_digit"
    )
    p = f"1.0 / (1.0 + exp(-({lin})))"
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""g{i} AS (
        SELECT round(avg(({p} - f.label) * f.f_stop), 9) AS g1,
               round(avg(({p} - f.label) * f.f_punct), 9) AS g2,
               round(avg(({p} - f.label) * f.f_wlen), 9) AS g3,
               round(avg(({p} - f.label) * f.f_digit), 9) AS g4,
               round(avg({p} - f.label), 9) AS gb
        FROM feats f CROSS JOIN w{i - 1} w
        WHERE f.is_train
    ),
    w{i} AS (
        SELECT round(w.w1 - {lr} * g.g1, 9) AS w1,
               round(w.w2 - {lr} * g.g2, 9) AS w2,
               round(w.w3 - {lr} * g.g3, 9) AS w3,
               round(w.w4 - {lr} * g.g4, 9) AS w4,
               round(w.b - {lr} * g.gb, 9) AS b
        FROM w{i - 1} w CROSS JOIN g{i} g
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT f.doc_id, f.label, f.is_train,
           round({p}, 6) AS quality_prob
    FROM feats f CROSS JOIN w{n_iter} w
    ORDER BY f.doc_id
"""


def q_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation verdict: quality gate, exact-fingerprint dedup,
    near-dup survivor selection, benchmark decontamination and
    boilerplate cut as per-document boolean columns in one composed plan
    (see ``plans/curate.py``).  Bench set = doc_id % 50 == 0, thresholds
    chosen to split the synthetic corpus non-degenerately."""
    from nomenklatura_spark.plans.curate import curate_verdicts

    docs = load_table(spark, sf_dir, "documents")
    pairs = _spark_ngram_pairs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    return curate_verdicts(
        docs, pairs, bench, boiler_max=0.85
    ).orderBy("doc_id")


def _corpus_curate_sql() -> str:
    fingerprint = (
        "md5(array_to_string(list_sort(list_distinct("
        "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'),"
        " x -> x != ''))), ' '))"
    )
    return f"""
    WITH RECURSIVE {_COMPONENT_WALK_SQL_BODY},
    comps AS (SELECT node, min(reached) AS component FROM walk GROUP BY node),
    quality AS (SELECT doc_id, q_keep FROM ({_quality_sql()})),
    fp AS (SELECT doc_id, {fingerprint} AS f FROM documents),
    exact AS (
        SELECT doc_id,
               doc_id = min(doc_id) OVER (PARTITION BY f) AS keep_exact
        FROM fp
    ),
    cws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    g5 AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(w) - 4, 0)),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS sh
        FROM cws
    ),
    bench5 AS (SELECT doc_id AS bench_id, sh FROM g5 WHERE doc_id % 50 = 0),
    bsizes AS (SELECT bench_id, count(*) AS n_bench FROM bench5 GROUP BY bench_id),
    contaminated AS (
        SELECT DISTINCT g.doc_id
        FROM g5 g JOIN bench5 b ON g.sh = b.sh
        JOIN bsizes s ON s.bench_id = b.bench_id
        WHERE g.doc_id != b.bench_id
        GROUP BY g.doc_id, b.bench_id, s.n_bench
        HAVING count(*) * 1.0 / s.n_bench >= 0.5
    ),
    g2 AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(w) - 1, 0)),
            i -> w[i] || ' ' || w[i+1])) AS sh
        FROM cws
    ),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    dfreq2 AS (SELECT sh, count(*) AS gram_df FROM g2 GROUP BY sh),
    boiler2 AS (SELECT sh FROM dfreq2, nd WHERE gram_df * 20 >= n_docs),
    bratio AS (
        SELECT g.doc_id,
               round(CASE WHEN count(*) > 0
                     THEN count(b.sh) * 1.0 / count(*) ELSE 0.0 END, 6) AS r
        FROM g2 g LEFT JOIN boiler2 b ON g.sh = b.sh
        GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           q.q_keep AS keep_quality,
           e.keep_exact,
           (coalesce(c.component, d.doc_id) = d.doc_id) AS keep_near_dup,
           (x.doc_id IS NULL) AS keep_decontam,
           (coalesce(br.r, 0.0) < 0.85) AS keep_boiler,
           (q.q_keep AND e.keep_exact
            AND coalesce(c.component, d.doc_id) = d.doc_id
            AND x.doc_id IS NULL
            AND coalesce(br.r, 0.0) < 0.85) AS keep
    FROM documents d
    JOIN quality q USING (doc_id)
    JOIN exact e USING (doc_id)
    LEFT JOIN comps c ON c.node = d.doc_id
    LEFT JOIN contaminated x ON x.doc_id = d.doc_id
    LEFT JOIN bratio br ON br.doc_id = d.doc_id
    ORDER BY d.doc_id
    """


def q_training_batch_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-feed materialization — the artifact a
    training run actually mounts, composed from the tiers the engine
    already serves, as ONE plan:

    1. TEXT curation (``plans/curate.curate_verdicts``): quality gate,
       exact-fingerprint dedup, n-gram near-dup survivor selection,
       benchmark decontamination, boilerplate cut — each leg oracled by
       ``corpus_curate``.
    2. MEDIA gate: the document's PRIMARY media asset (asset
       ``2*doc_id`` of the synthetic pair device) must survive the
       dHash keep-list (min-id keeper per near-dup cluster — the
       relation ``media_dedup_served`` serves from state; incremental
       == scratch is pinned there, so this row composes the batch
       relation).
    3. PACKING: the surviving docs pack into ``PACK_MAX_TOKENS`` shards
       by the stratified running-sum budget (``doc_pack``'s rule) —
       shard numbering runs over the FILTERED corpus, which is what a
       training run reads.
    4. CONTRASTIVE attach: ``n_positives`` — how many near-dup partners
       the kept anchor has in its component (the positives
       ``build_positive_pairs`` serves, ``doc_positives``'s graph) —
       and ``in_neg_pool`` — membership in the 64-doc uniform negative
       pool (``doc_negatives``' md5 min-k draw, the relation the
       sample index maintains).

    Every leg is independently oracled, so the oracle here is a join of
    those oracle CTEs; the lineage pytest walks each served doc through
    every gate (``tests/test_curate.py``)."""
    from nomenklatura_spark.plans.curate import curate_verdicts
    from nomenklatura_spark.textops.analysis import words

    docs = load_table(spark, sf_dir, "documents")
    pairs = _spark_ngram_pairs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    verdicts = curate_verdicts(docs, pairs, bench, boiler_max=0.85)

    mcomp = connected_components(
        _media_pairs_cached(spark, sf_dir), src="lid", dst="rid"
    )
    media_drop = mcomp.where(
        (F.col("node") != F.col("component")) & (F.col("node") % 2 == 0)
    ).select(F.expr("node DIV 2").alias("doc_id"))

    kept = (
        verdicts.where("keep")
        .select("doc_id")
        .join(media_drop, "doc_id", "left_anti")
    )

    comps = connected_components(pairs, src="lid", dst="rid")
    csz = comps.groupBy("component").agg(F.count(F.lit(1)).alias("_sz"))
    npos = comps.join(csz, "component").select(
        F.col("node").alias("doc_id"),
        (F.col("_sz") - 1).cast("int").alias("n_positives"),
    )
    from nomenklatura_spark.functions.hashing import md5_bucket

    pool = (
        docs.select(
            "doc_id",
            md5_bucket("negpair:pool", F.col("doc_id"), 16**15).alias(
                "_pk"
            ),
        )
        .orderBy("_pk", "doc_id")
        .limit(64)
        .select("doc_id", F.lit(True).alias("_pool"))
    )

    base = (
        kept.join(docs.select("doc_id", "text"), "doc_id")
        .withColumn("_ws", words(F.col("text")))
        .select(
            "doc_id",
            lang_id(F.col("text"), ws=F.col("_ws")).alias("lang_pred"),
            token_count(F.col("text")).alias("n_tokens"),
        )
    )
    w = (
        Window.partitionBy("lang_pred")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shard = F.floor(
        (F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_MAX_TOKENS
    )
    return (
        base.withColumn("shard", shard.cast("int"))
        .join(npos, "doc_id", "left")
        .join(pool, "doc_id", "left")
        .select(
            "doc_id",
            "lang_pred",
            "n_tokens",
            "shard",
            F.coalesce("n_positives", F.lit(0)).alias("n_positives"),
            F.coalesce("_pool", F.lit(False)).alias("in_neg_pool"),
        )
        .orderBy("doc_id")
    )


def _training_batch_served_sql() -> str:
    fingerprint = (
        "md5(array_to_string(list_sort(list_distinct("
        "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'),"
        " x -> x != ''))), ' '))"
    )
    wc = "len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))"
    return f"""
    WITH RECURSIVE {_COMPONENT_WALK_SQL_BODY},
    comps AS (SELECT node, min(reached) AS component FROM walk GROUP BY node),
    quality AS (SELECT doc_id, q_keep FROM ({_quality_sql()})),
    fp AS (SELECT doc_id, {fingerprint} AS f FROM documents),
    exact AS (
        SELECT doc_id,
               doc_id = min(doc_id) OVER (PARTITION BY f) AS keep_exact
        FROM fp
    ),
    cws AS (SELECT doc_id, {_DOC_WORDS} AS w FROM documents),
    g5 AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(w) - 4, 0)),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS sh
        FROM cws
    ),
    bench5 AS (SELECT doc_id AS bench_id, sh FROM g5 WHERE doc_id % 50 = 0),
    bsizes AS (SELECT bench_id, count(*) AS n_bench FROM bench5 GROUP BY bench_id),
    contaminated AS (
        SELECT DISTINCT g.doc_id
        FROM g5 g JOIN bench5 b ON g.sh = b.sh
        JOIN bsizes s ON s.bench_id = b.bench_id
        WHERE g.doc_id != b.bench_id
        GROUP BY g.doc_id, b.bench_id, s.n_bench
        HAVING count(*) * 1.0 / s.n_bench >= 0.5
    ),
    g2 AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(w) - 1, 0)),
            i -> w[i] || ' ' || w[i+1])) AS sh
        FROM cws
    ),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    dfreq2 AS (SELECT sh, count(*) AS gram_df FROM g2 GROUP BY sh),
    boiler2 AS (SELECT sh FROM dfreq2, nd WHERE gram_df * 20 >= n_docs),
    bratio AS (
        SELECT g.doc_id,
               round(CASE WHEN count(*) > 0
                     THEN count(b.sh) * 1.0 / count(*) ELSE 0.0 END, 6) AS r
        FROM g2 g LEFT JOIN boiler2 b ON g.sh = b.sh
        GROUP BY g.doc_id
    ),
    {_MEDIA_DEDUP_SQL_BODY},
    mpairs AS (SELECT lid, rid FROM ham WHERE hamming <= 6),
    medges AS (
        SELECT lid AS a, rid AS b FROM mpairs
        UNION SELECT rid, lid FROM mpairs
    ),
    mnodes AS (SELECT DISTINCT a AS node FROM medges),
    mwalk(node, reached) AS (
        SELECT node, node FROM mnodes
        UNION
        SELECT w.node, e.b FROM mwalk w JOIN medges e ON e.a = w.reached
    ),
    mcomp AS (
        SELECT node, min(reached) AS component FROM mwalk GROUP BY node
    ),
    media_drop AS (
        SELECT node // 2 AS doc_id FROM mcomp
        WHERE node != component AND node % 2 = 0
    ),
    kept AS (
        SELECT d.doc_id
        FROM documents d
        JOIN quality q USING (doc_id)
        JOIN exact e USING (doc_id)
        LEFT JOIN comps c ON c.node = d.doc_id
        LEFT JOIN contaminated x ON x.doc_id = d.doc_id
        LEFT JOIN bratio br ON br.doc_id = d.doc_id
        LEFT JOIN media_drop md ON md.doc_id = d.doc_id
        WHERE q.q_keep AND e.keep_exact
          AND coalesce(c.component, d.doc_id) = d.doc_id
          AND x.doc_id IS NULL
          AND coalesce(br.r, 0.0) < 0.85
          AND md.doc_id IS NULL
    ),
    {_langid_pred_ctes()},
    toks AS (SELECT doc_id, CAST({wc} AS BIGINT) AS n_tokens FROM documents),
    packed AS (
        SELECT k.doc_id, p.lang_pred, t.n_tokens,
            CAST(floor((sum(t.n_tokens) OVER (
                PARTITION BY p.lang_pred ORDER BY k.doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) - t.n_tokens) / {PACK_MAX_TOKENS}) AS INT) AS shard
        FROM kept k JOIN pred p USING (doc_id) JOIN toks t USING (doc_id)
    ),
    csz AS (SELECT component, count(*) AS sz FROM comps GROUP BY component),
    npos AS (
        SELECT c.node AS doc_id, CAST(s.sz - 1 AS INT) AS n_positives
        FROM comps c JOIN csz s USING (component)
    ),
    pool AS (
        SELECT doc_id FROM documents
        ORDER BY CAST(('0x' || substr(md5('negpair:pool:'
                 || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT), doc_id
        LIMIT 64
    )
    SELECT pk.doc_id, pk.lang_pred, pk.n_tokens, pk.shard,
           coalesce(np.n_positives, 0) AS n_positives,
           (pl.doc_id IS NOT NULL) AS in_neg_pool
    FROM packed pk
    LEFT JOIN npos np ON np.doc_id = pk.doc_id
    LEFT JOIN pool pl ON pl.doc_id = pk.doc_id
    ORDER BY pk.doc_id
    """


# ---------------------------------------------------------------------------
# BPE encode-to-ids (tokenizer-apply at corpus scale)

#: Pinned merge table for the tokenizer-APPLY row: the operator under
#: test is encoding (applying a learned merge table), so the table is a
#: fixed constant the way the quality classifier's weights are.  Rank
#: order matters, and every merge's constituents are produced by
#: earlier merges — the property that makes the kernel's greedy
#: lowest-rank-first equal to the oracle's rank-order replay.
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("e", "</w>"), ("s", "</w>"), ("i", "n"),
    ("a", "n"), ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
    ("the", "</w>"), ("d", "</w>"), ("o", "r"), ("t", "</w>"),
    ("an", "d"), ("and", "</w>"), ("o", "f"), ("of", "</w>"),
    ("in", "</w>"), ("e", "n"), ("t", "o"), ("to", "</w>"),
    ("a", "r"), ("i", "t"),
]


def q_doc_bpe_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encode-to-ids: (doc_id, pos, token_id) for every 10th
    document, first 80 token ids each — the tokenizer-apply projection
    a packing pipeline feeds on (``textops/bpe.py``).  The id space is
    deterministic (a-z0-9 = 0..35, '</w>' = 36, merge r -> 37+r), so
    the DuckDB oracle can replay the merge ranks symbolically."""
    from nomenklatura_spark.textops.bpe import bpe_encode

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 10 == 0
    )
    ids = bpe_encode(docs, _BPE_MERGES)
    return ids.select(
        "doc_id",
        F.posexplode(F.slice("token_ids", 1, 80)).alias("pos", "token_id"),
    ).orderBy("doc_id", "pos")


def _bpe_ids_sql() -> str:
    """Rank-order replay of the pinned merges: each token rides the
    state string as '|tok|', so replace('|a||b|' -> '|ab|') merges
    exactly full-token adjacencies, exhaustively left-to-right, one
    merge rank per nesting level."""
    from nomenklatura_spark.textops.bpe import bpe_vocab

    state = r"regexp_replace(w, '(.)', '|\1|', 'g') || '|</w>|'"
    for a, b in _BPE_MERGES:
        state = f"replace({state}, '|{a}||{b}|', '|{a}{b}|')"
    case = "CASE tok " + " ".join(
        f"WHEN '{t}' THEN {i}" for t, i in bpe_vocab(_BPE_MERGES).items()
    ) + " END"
    return f"""
    WITH norm AS (
        SELECT doc_id,
               list_filter(
                   string_split(trim(regexp_replace(lower(text),
                       '[^a-z0-9]+', ' ', 'g')), ' '),
                   x -> x <> '') AS ws
        FROM documents WHERE doc_id % 10 = 0
    ),
    words AS (
        SELECT doc_id, unnest(ws) AS w,
               generate_subscripts(ws, 1) AS wi
        FROM norm
    ),
    enc AS (SELECT doc_id, wi, {state} AS st FROM words),
    toks AS (
        SELECT doc_id, wi,
               unnest(string_split(trim(st, '|'), '||')) AS tok,
               generate_subscripts(string_split(trim(st, '|'), '||'), 1) AS ti
        FROM enc
    ),
    seq AS (
        SELECT doc_id,
               row_number() OVER (PARTITION BY doc_id ORDER BY wi, ti) - 1
                   AS pos,
               tok
        FROM toks
    )
    SELECT doc_id, CAST(pos AS INT) AS pos, CAST({case} AS INT) AS token_id
    FROM seq WHERE pos < 80 ORDER BY doc_id, pos
    """


def _bpe_pack_sql() -> str:
    """doc_pack's shard algebra with the budget unit replayed from the
    pinned merges: per-word token count = length of the replayed state's
    token list, summed per document."""
    state = r"regexp_replace(w, '(.)', '|\1|', 'g') || '|</w>|'"
    for a, b in _BPE_MERGES:
        state = f"replace({state}, '|{a}||{b}|', '|{a}{b}|')"
    return f"""
    WITH {_langid_pred_ctes()},
    norm AS (
        SELECT doc_id,
               list_filter(
                   string_split(trim(regexp_replace(lower(text),
                       '[^a-z0-9]+', ' ', 'g')), ' '),
                   x -> x <> '') AS ws
        FROM documents
    ),
    wtok AS (
        SELECT doc_id,
               len(string_split(trim({state}, '|'), '||')) AS wn
        FROM (SELECT doc_id, unnest(ws) AS w FROM norm)
    ),
    counts AS (
        SELECT n.doc_id, CAST(coalesce(sum(w.wn), 0) AS INT)
                   AS n_bpe_tokens
        FROM norm n LEFT JOIN wtok w USING (doc_id)
        GROUP BY n.doc_id
    ),
    j AS (
        SELECT p.doc_id, p.lang_pred, c.n_bpe_tokens
        FROM pred p JOIN counts c USING (doc_id)
    )
    SELECT doc_id, lang_pred, n_bpe_tokens,
        CAST(floor((sum(n_bpe_tokens) OVER (
            PARTITION BY lang_pred ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) - n_bpe_tokens) / {PACK_MAX_TOKENS}) AS INT) AS shard
    FROM j
    ORDER BY doc_id
    """


def q_doc_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility / compression report by language — the
    standard quality check before committing a vocabulary: per
    predicted language, tokens-per-word (fertility; high = the merges
    under-fit that language) and bytes-per-token (compression; low =
    the vocab wastes ids) under the pinned merge table.  A cheap
    composition of two proven kernels — the lang-ID heuristic and the
    Arrow-batched BPE token counter — aggregated on exact integer sums
    with one scalar division per language at the serving edge (house
    round-before-compare rule).  Word/byte counts use the tokenizer's
    own [a-z0-9] normalization, so the ratios measure the tokenizer,
    not the normalizer."""
    from nomenklatura_spark.textops.analysis import words
    from nomenklatura_spark.textops.bpe import bpe_token_counter

    docs = load_table(spark, sf_dir, "documents")
    norm = F.filter(
        F.split(
            F.trim(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
            ),
            " ",
        ),
        lambda x: x != "",
    )
    counter = bpe_token_counter(_BPE_MERGES)
    per_doc = (
        docs.withColumn("_ws", words(F.col("text")))
        .withColumn("_nw", norm)
        .select(
            lang_id(F.col("text"), ws=F.col("_ws")).alias("lang_pred"),
            F.size("_nw").alias("_wrds"),
            F.aggregate(
                F.transform("_nw", F.length),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("_byts"),
            counter(F.col("text")).alias("_toks"),
        )
    )
    agg = per_doc.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_wrds").cast("bigint").alias("n_words"),
        F.sum("_toks").cast("bigint").alias("n_tokens"),
        F.sum("_byts").cast("bigint").alias("n_text_bytes"),
    )
    return agg.select(
        "lang_pred",
        "n_docs",
        "n_words",
        "n_tokens",
        "n_text_bytes",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_tokens") / F.col("n_words"), 6),
        ).alias("fertility"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("n_text_bytes") / F.col("n_tokens"), 6),
        ).alias("bytes_per_token"),
    ).orderBy("lang_pred")


def _bpe_fertility_sql() -> str:
    state = r"regexp_replace(w, '(.)', '|\1|', 'g') || '|</w>|'"
    for a, b in _BPE_MERGES:
        state = f"replace({state}, '|{a}||{b}|', '|{a}{b}|')"
    return f"""
    WITH {_langid_pred_ctes()},
    norm AS (
        SELECT doc_id,
               list_filter(
                   string_split(trim(regexp_replace(lower(text),
                       '[^a-z0-9]+', ' ', 'g')), ' '),
                   x -> x <> '') AS ws
        FROM documents
    ),
    wtok AS (
        SELECT doc_id,
               len(string_split(trim({state}, '|'), '||')) AS wn,
               len(w) AS wb
        FROM (SELECT doc_id, unnest(ws) AS w FROM norm)
    ),
    counts AS (
        SELECT n.doc_id,
               CAST(coalesce(count(w.wn), 0) AS BIGINT) AS wrds,
               CAST(coalesce(sum(w.wn), 0) AS BIGINT) AS toks,
               CAST(coalesce(sum(w.wb), 0) AS BIGINT) AS byts
        FROM norm n LEFT JOIN wtok w USING (doc_id)
        GROUP BY n.doc_id
    ),
    j AS (
        SELECT p.lang_pred, c.wrds, c.toks, c.byts
        FROM pred p JOIN counts c USING (doc_id)
    )
    SELECT lang_pred,
        count(*) AS n_docs,
        CAST(sum(wrds) AS BIGINT) AS n_words,
        CAST(sum(toks) AS BIGINT) AS n_tokens,
        CAST(sum(byts) AS BIGINT) AS n_text_bytes,
        CASE WHEN sum(wrds) > 0
             THEN round(sum(toks) * 1.0 / sum(wrds), 6) END AS fertility,
        CASE WHEN sum(toks) > 0
             THEN round(sum(byts) * 1.0 / sum(toks), 6) END
            AS bytes_per_token
    FROM j
    GROUP BY lang_pred
    ORDER BY lang_pred
    """


# ---------------------------------------------------------------------------
# registry

QUERIES = {
    # Ordering is deliberate: the driver's correctness board checks the
    # first 50 entries — flagship rows plus one representative per tier
    # (blocker, matcher, resolver, dedup, ANN, text, multimodal, graph,
    # sketch, funnel, hybrid retrieval) sit inside the cap so every
    # tier's health is driver-visible.  Rows past the cap are
    # oracle-checked by tests/test_entry_contract.py at every SF —
    # same contract, just not on the driver board.  (r8 rotations:
    # doc_split_safe + doc_drift_served displaced statements_unpivot +
    # adjacency_orders; the new graph_scc / events_topk_served /
    # events_anomaly / doc_sample_weighted rows displaced the middle ANN
    # variants (brute, PQ and IVFPQ stay), dedup_exact and
    # pair_scores_regression; late-r8: the eight new rows
    # (events_sessions_served, events_retention_served, graph_bfs,
    # graph_links, graph_layers, dedup_eval, ann_eval, events_paths)
    # displaced ann_topk, doc_stats, doc_embed, dedup_simhash,
    # events_sessionize (its served variant subsumes it on-board),
    # entity_delta, doc_pii and doc_heavy_hitters (the CMS tier keeps
    # events_topk_served); events_anomaly_served then took
    # events_anomaly's seat (same oracle, but the served path also
    # proves the maintained counter view) — every displaced row stays
    # contract-checked.  r9 rotation: events_hourly_served (the counter
    # view's direct dashboard row) and graph_condense on-board,
    # displacing events_hll_users and events_funnel — each subsumed by
    # its on-board served sibling (events_hll_weekly_served serves from
    # the same merged registers; events_funnel_served derives the same
    # chain from maintained state).  r10 rotation: the r9 contrastive
    # tier (doc_negatives, doc_hard_negatives, doc_positives) and
    # graph_features on-board, displacing dedup_semantic (both halves
    # covered on-board by dedup_embedding_lsh + ann_ivfpq_topk),
    # events_value_hist (same histogram oracle as the maintained
    # events_quantiles_served row), ann_pq_topk (subsumed by on-board
    # ann_ivfpq_topk, which exercises the same PQ codebooks behind the
    # IVF route) and graph_bfs (graph_layers is its multi-source
    # generalization over the same adjacency); the new media_dedup row
    # (dHash + banded Hamming — the first multimodal x dedup operator)
    # took dedup_embedding's seat (dedup_embedding_lsh computes the
    # same embedding near-dup relation on-board via the scale path);
    # doc_positives_served then took doc_positives' seat — the served
    # row exercises the same build_positive_pairs operator PLUS the
    # maintained incremental-component fold, the
    # events_funnel_served-over-events_funnel precedent.  r11 rotation:
    # the late-r10 serving tier on-board — media_dedup_served took
    # media_dedup's seat, doc_negatives_served took doc_negatives' and
    # doc_sample_served took doc_sample_weighted's (each served row
    # derives the SAME relation as its batch sibling — same salts, same
    # integer keys — PLUS the maintained incremental fold, the
    # served-over-batch precedent above); media_dedup_eval took
    # dedup_containment's seat (both sub-document/near-dup quality
    # surfaces: containment's word-trigram partial-mirror detection is
    # covered on-board by doc_dup_passages, the duplicated-window tier
    # over the same word n-gram multisets, while media_dedup_eval is a
    # tier with no other board representation); training_batch_served —
    # the end-to-end composed training feed — took doc_pack's seat (its
    # packing leg runs the same running-sum shard budgeting; the
    # doc_pack oracle stays contract-checked past-cap alongside
    # doc_pack_bpe).)
    "resolver_candidates": q_resolver_candidates,
    "statements_versioned": q_statements_versioned,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "blocker_entries": q_blocker_entries,
    "doc_quality": q_doc_quality,
    "media_features": q_media_features,
    "media_decode": q_media_decode,
    "media_dedup_served": q_media_dedup_served,
    "pair_scores_v2": q_pair_scores_v2,
    "doc_negatives_served": q_doc_negatives_served,
    "graph_pagerank": q_graph_pagerank,
    "graph_triangles": q_graph_triangles,
    "graph_kcore": q_graph_kcore,
    "graph_scc": q_graph_scc,
    "graph_condense": q_graph_condense,
    "events_topk_served": q_events_topk_served,
    "events_anomaly_served": q_events_anomaly_served,
    "events_hourly_served": q_events_hourly_served,
    "doc_sample_served": q_doc_sample_served,
    "media_dedup_eval": q_media_dedup_eval,
    "doc_cluster_keywords": q_doc_cluster_keywords,
    "doc_positives_served": q_doc_positives_served,
    "events_funnel_served": q_events_funnel_served,
    "events_hll_weekly_served": q_events_hll_weekly_served,
    "events_sessions_served": q_events_sessions_served,
    "events_retention_served": q_events_retention_served,
    "graph_features": q_graph_features,
    "graph_links": q_graph_links,
    "graph_layers": q_graph_layers,
    "dedup_eval": q_dedup_eval,
    "ann_eval": q_ann_eval,
    "events_paths": q_events_paths,
    "doc_split_safe": q_doc_split_safe,
    "doc_drift_served": q_doc_drift_served,
    "entity_properties": q_entity_properties,
    "blocker_token_stats": q_blocker_token_stats,
    "blocker_pairs": q_blocker_pairs,
    "blocker_match": q_blocker_match,
    "pair_scores": q_pair_scores,
    "pair_scores_ofac": q_pair_scores_ofac,
    "dedup_components": q_dedup_components,
    "linker_apply": q_linker_apply,
    "doc_search_hybrid": q_doc_search_hybrid,
    "training_batch_served": q_training_batch_served,
    "xref_suggestions": q_xref_suggestions,
    "doc_hard_negatives": q_doc_hard_negatives,
    "doc_dup_passages": q_doc_dup_passages,
    "conflicting_matches": q_conflicting_matches,
    "blocker_stopwords": q_blocker_stopwords,
    # entries past the driver's 50-row board cap: oracle-checked by the
    # pytest suite (tests/test_entry_contract.py), invisible to the board
    "events_hll_users": q_events_hll_users,
    "events_funnel": q_events_funnel,
    "ann_topk": q_ann_topk,
    "doc_stats": q_doc_stats,
    "doc_embed": q_doc_embed,
    "doc_pii": q_doc_pii,
    "doc_heavy_hitters": q_doc_heavy_hitters,
    "dedup_simhash": q_dedup_simhash,
    "events_sessionize": q_events_sessionize,
    "entity_delta": q_entity_delta,
    "statements_unpivot": q_statements_unpivot,
    "adjacency_orders": q_adjacency_orders,
    "pricing_summary": q_pricing_summary,
    "top_revenue_nations": q_top_revenue_nations,
    "events_json": q_events_json,
    "dedup_ngram_pairs": q_dedup_ngram_pairs,
    "doc_decontaminate": q_doc_decontaminate,
    "dedup_minhash": q_dedup_minhash,
    "doc_langid": q_doc_langid,
    "xref_stats": q_xref_stats,
    "doc_boilerplate": q_doc_boilerplate,
    "doc_vocab": q_doc_vocab,
    "dedup_survivors": q_dedup_survivors,
    "corpus_curate": q_corpus_curate,
    "doc_lm_score": q_doc_lm_score,
    "doc_quality_classifier": q_doc_quality_classifier,
    "doc_clusters": q_doc_clusters,
    "doc_dsir": q_doc_dsir,
    "events_asof": q_events_asof,
    "events_band_pairs": q_events_band_pairs,
    "events_quantiles": q_events_quantiles,
    "events_sliding": q_events_sliding,
    "events_retention": q_events_retention,
    "doc_search_bm25": q_doc_search_bm25,
    "doc_source_cap": q_doc_source_cap,
    "doc_decontaminate_bloom": q_doc_decontaminate_bloom,
    "doc_split": q_doc_split,
    "doc_drift": q_doc_drift,
    "doc_decontaminate_semantic": q_doc_decontaminate_semantic,
    "doc_budget_select": q_doc_budget_select,
    "graph_ppr": q_graph_ppr,
    "doc_dup_trim": q_doc_dup_trim,
    "events_user_overlap": q_events_user_overlap,
    "graph_label_prop": q_graph_label_prop,
    "events_user_topk": q_events_user_topk,
    "events_hourly": q_events_hourly,
    "doc_sample_mix": q_doc_sample_mix,
    "doc_chunks": q_doc_chunks,
    "doc_bpe_ids": q_doc_bpe_ids,
    "doc_pack_bpe": q_doc_pack_bpe,
    "doc_bpe_fertility": q_doc_bpe_fertility,
    "media_dedup_audio": q_media_dedup_audio,
    "media_dedup": q_media_dedup,
    "doc_negatives": q_doc_negatives,
    "doc_sample_weighted": q_doc_sample_weighted,
    "dedup_containment": q_dedup_containment,
    "doc_pack": q_doc_pack,
    "orders_profile": q_orders_profile,
    "doc_lm_bigram": q_doc_lm_bigram,
    "doc_sample_stratified": q_doc_sample_stratified,
    "events_quantiles_served": q_events_quantiles_served,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "dedup_exact": q_dedup_exact,
    "pair_scores_regression": q_pair_scores_regression,
    "graph_closeness": q_graph_closeness,
    "events_anomaly": q_events_anomaly,
    "doc_keywords": q_doc_keywords,
    "dedup_semantic": q_dedup_semantic,
    "events_value_hist": q_events_value_hist,
    "ann_pq_topk": q_ann_pq_topk,
    "graph_bfs": q_graph_bfs,
    "dedup_embedding": q_dedup_embedding,
    "doc_positives": q_doc_positives,
}

ORACLES = {
    "pricing_summary": _PRICING_SQL,
    "resolver_candidates": _RESOLVER_CANDIDATES_SQL,
    "statements_versioned": _STATEMENTS_VERSIONED_SQL,
    "ann_ivfpq_topk": _ann_ivfpq_sql(),
    "dedup_embedding_lsh": _dedup_emb_lsh_sql(),
    "blocker_entries": _ENTRIES_TF_SQL,
    "doc_quality": _quality_repetition_sql(),
    "media_features": _MEDIA_FEATURES_SQL,
    "media_dedup": _MEDIA_DEDUP_SQL,
    "media_dedup_audio": _MEDIA_DEDUP_AUDIO_SQL,
    "media_dedup_served": _MEDIA_DEDUP_SERVED_SQL,
    "doc_sample_served": _doc_sample_served_sql(),
    "doc_negatives_served": _DOC_NEGATIVES_SERVED_SQL,
    "media_dedup_eval": _MEDIA_DEDUP_EVAL_SQL,
    "media_decode": _MEDIA_DECODE_SQL.format(
        pixels=_MEDIA_PIXELS_SQL, audio=_MEDIA_AUDIO_SQL
    ),
    "dedup_semantic": _dedup_semantic_sql(),
    "top_revenue_nations": _TOP_NATIONS_SQL,
    "events_user_topk": _EVENTS_TOPK_SQL,
    "events_hourly": _EVENTS_HOURLY_SQL,
    "events_json": _EVENTS_JSON_SQL,
    "statements_unpivot": _STATEMENTS_SQL,
    "entity_properties": _ENTITY_PROPS_SQL,
    "adjacency_orders": _ADJACENCY_SQL,
    "blocker_token_stats": f"SELECT * FROM ({_TOKEN_STATS_SQL}) ORDER BY token",
    "blocker_pairs": _PAIRS_SQL,
    "blocker_match": _MATCH_SQL,
    "pair_scores": _PAIR_SCORES_SQL,
    "pair_scores_regression": _PAIR_SCORES_REG_SQL,
    "pair_scores_ofac": _ofac_sql(),
    "dedup_exact": _DEDUP_EXACT_SQL,
    "dedup_ngram_pairs": f"SELECT * FROM ({_NGRAM_PAIRS_SQL_BODY}) ORDER BY lid, rid",
    "doc_decontaminate": _DECONTAM_SQL,
    "dedup_minhash": _MINHASH_SQL,
    "doc_positives_served": _DOC_POSITIVES_SERVED_SQL,
    "dedup_simhash": _simhash_sql(),
    "dedup_components": _DEDUP_COMPONENTS_SQL,
    "events_sessionize": _SESSIONIZE_SQL,
    "linker_apply": _LINKER_SQL,
    "doc_stats": _DOC_STATS_SQL,
    "doc_langid": _langid_sql(),
    "doc_sample_mix": _doc_sample_mix_sql(),
    "doc_pack": _doc_pack_sql(),
    "doc_chunks": _DOC_CHUNKS_SQL,
    "doc_pii": _doc_pii_sql(),
    "xref_suggestions": _XREF_SUGGESTIONS_SQL,
    "ann_topk": _ANN_SQL,
    "ann_lsh_topk": _ann_lsh_sql(),
    "ann_ivf_topk": _ann_ivf_sql(),
    "ann_pq_topk": _ann_pq_sql(),
    "doc_embed": _DOC_EMBED_SQL,
    "dedup_embedding": _DEDUP_EMB_SQL,
    "doc_dup_passages": _DOC_DUP_PASSAGES_SQL,
    "xref_stats": _XREF_STATS_SQL,
    "conflicting_matches": _CONFLICTS_SQL,
    "entity_delta": _ENTITY_DELTA_SQL,
    "blocker_stopwords": _BLOCKER_STOPWORDS_SQL,
    "doc_boilerplate": _DOC_BOILERPLATE_SQL,
    "doc_vocab": _DOC_VOCAB_SQL,
    "dedup_survivors": _DEDUP_SURVIVORS_SQL,
    "corpus_curate": _corpus_curate_sql(),
    "training_batch_served": _training_batch_served_sql(),
    "doc_lm_score": _DOC_LM_SCORE_SQL,
    "doc_quality_classifier": _quality_clf_sql(),
    "doc_clusters": _doc_clusters_sql(),
    "doc_dsir": _doc_dsir_sql(),
    "events_asof": _EVENTS_ASOF_SQL,
    "events_band_pairs": _EVENTS_BAND_SQL,
    "events_quantiles": _EVENTS_QUANTILES_SQL,
    "events_sliding": _EVENTS_SLIDING_SQL,
    "events_retention": _EVENTS_RETENTION_SQL,
    "doc_search_bm25": _doc_bm25_sql(),
    "doc_source_cap": _DOC_SOURCE_CAP_SQL,
    "doc_decontaminate_bloom": _DECONTAM_BLOOM_SQL,
    "graph_pagerank": _pagerank_sql(),
    "doc_split": _DOC_SPLIT_SQL,
    "doc_drift": _DOC_DRIFT_SQL,
    "doc_decontaminate_semantic": _decontam_semantic_sql(),
    "doc_budget_select": _budget_select_sql(),
    "graph_ppr": _ppr_sql(),
    "events_hll_users": _EVENTS_HLL_SQL,
    "graph_triangles": _GRAPH_TRIANGLES_SQL,
    "doc_search_hybrid": _doc_hybrid_sql(),
    "doc_heavy_hitters": _DOC_HEAVY_HITTERS_SQL,
    "doc_dup_trim": _DOC_DUP_TRIM_SQL,
    "events_value_hist": _EVENTS_VALUE_HIST_SQL,
    "graph_kcore": _kcore_sql(),
    "events_funnel": _EVENTS_FUNNEL_SQL,
    "events_user_overlap": _overlap_sql(),
    "graph_label_prop": _label_prop_sql(),
    "events_hll_weekly_served": _EVENTS_HLL_WEEKLY_SQL,
    "dedup_containment": _DEDUP_CONTAINMENT_SQL,
    "doc_cluster_keywords": _doc_cluster_keywords_sql(),
    "events_funnel_served": _EVENTS_FUNNEL_SQL,
    "doc_split_safe": _DOC_SPLIT_SAFE_SQL,
    "doc_drift_served": _DOC_DRIFT_SERVED_SQL,
    "doc_bpe_ids": _bpe_ids_sql(),
    "doc_pack_bpe": _bpe_pack_sql(),
    "doc_bpe_fertility": _bpe_fertility_sql(),
    "doc_sample_weighted": _doc_sample_weighted_sql(),
    "orders_profile": _orders_profile_sql(),
    "events_anomaly": _EVENTS_ANOMALY_SQL,
    "graph_scc": _GRAPH_SCC_SQL,
    "graph_bfs": _GRAPH_BFS_SQL,
    "graph_links": _GRAPH_LINKS_SQL,
    "graph_layers": _GRAPH_LAYERS_SQL,
    "dedup_eval": _DEDUP_EVAL_SQL,
    "events_retention_served": _EVENTS_RETENTION_SQL,
    "events_paths": _EVENTS_PATHS_SQL,
    "ann_eval": _ann_eval_sql(),
    "graph_closeness": _GRAPH_CLOSENESS_SQL,
    "events_hourly_served": _EVENTS_HOURLY_SERVED_SQL,
    "events_anomaly_served": _EVENTS_ANOMALY_SQL,
    "doc_keywords": _DOC_KEYWORDS_SQL,
    "doc_negatives": _DOC_NEGATIVES_SQL,
    "doc_hard_negatives": _doc_hard_negatives_sql(),
    "doc_positives": _DOC_POSITIVES_SQL,
    "graph_features": _GRAPH_FEATURES_SQL,
    "events_sessions_served": _SESSIONS_SERVED_SQL,
    "doc_lm_bigram": _DOC_LM_BIGRAM_SQL,
    "events_topk_served": _EVENTS_TOPK_SERVED_SQL,
    "doc_sample_stratified": _doc_sample_stratified_sql(),
    "events_quantiles_served": _EVENTS_VALUE_HIST_SQL,
    "graph_condense": _GRAPH_CONDENSE_SQL,
}
