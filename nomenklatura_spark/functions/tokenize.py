"""T1 — statement-level entity tokenizer for the blocking index.

Reference semantics: ``nomenklatura/blocker/tokenizer.py:61-132``. The
reference walks assembled entities in Python (rigour name analysis); here
the tokenizer runs *statement-level* as pure column expressions + explode,
so it never leaves the JVM and needs no entity assembly pass:

- name-type values → ``np:<part>`` tokens (len 3-30, legal/stop parts
  dropped) and a sorted-part fingerprint ``n:<fp>`` (3 < len < 200)
- country / phone / email → full lowered value with prefix
  (``c:`` / ``p:`` / ``email:``)
- identifier → ``i:<normalized>`` plus ``wd:`` word tokens
- date → ``d:<value[:10]>``
- address → ``a:<word>`` (len > 3) and ``wd:<word>`` (len > 6)
- text / string → ``wd:<word>`` tokens (len ≥ 6, stop words dropped)

Deviation from the reference (documented): rigour's symbol tagging
(``sy:`` tokens) and per-language name-part tagging need a linguistic
database; symbols are not emitted. The blocker scoring degrades gracefully
(it treats fields independently).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nomenklatura_spark.functions.normalize import (
    LEGAL_FORMS,
    STOP_TOKENS,
    clean_identifier,
    name_tokens,
    norm_text,
)


def _prefixed(prefix: str, col: Column) -> Column:
    return F.concat(F.lit(prefix + ":"), col)


def tokenize_statements(stmts: DataFrame) -> DataFrame:
    """Statements → raw token stream (schema, id, field, token).

    One row per (entity, field, token) occurrence; feed through
    ``blocker.token_entries`` for the counted/truncated ``entries``
    relation. Only matchable value types produce tokens.
    """
    base = stmts.select(
        "schema",
        F.col("canonical_id").alias("id"),
        "prop_type",
        "prop",
        "value",
    )

    ptype = F.col("prop_type")

    # --- names: part tokens + fingerprint --------------------------------
    names = base.where(ptype == "name")
    nparts = names.select(
        "schema",
        "id",
        F.explode(
            F.array_distinct(
                F.filter(
                    name_tokens(F.col("value")),
                    lambda t: (F.length(t) >= 3)
                    & (F.length(t) <= 30)
                    & ~t.isin(*LEGAL_FORMS)
                    & ~t.isin(*STOP_TOKENS),
                )
            )
        ).alias("tok"),
    ).select("schema", "id", F.lit("np").alias("field"), _prefixed("np", F.col("tok")).alias("token"))

    fp = F.array_join(
        F.array_sort(
            F.array_distinct(
                F.filter(
                    name_tokens(F.col("value")),
                    lambda t: ~t.isin(*LEGAL_FORMS) & ~t.isin(*STOP_TOKENS),
                )
            )
        ),
        "",
    )
    nfp = (
        names.select("schema", "id", fp.alias("fp"))
        .where((F.length("fp") > 3) & (F.length("fp") < 200))
        .select(
            "schema", "id", F.lit("name").alias("field"), _prefixed("n", F.col("fp")).alias("token")
        )
    )

    # --- full-value types (country/phone/email) --------------------------
    full_prefix = (
        F.when(ptype == "country", F.lit("c:"))
        .when(ptype == "phone", F.lit("p:"))
        .otherwise(F.lit("email:"))
    )
    fulls = base.where(ptype.isin("country", "phone", "email")).select(
        "schema",
        "id",
        F.col("prop_type").alias("field"),
        F.concat(full_prefix, F.lower(F.substring("value", 1, 300))).alias("token"),
    )

    # --- identifiers ------------------------------------------------------
    idents = (
        base.where(ptype == "identifier")
        .select("schema", "id", clean_identifier(F.col("value")).alias("cid"))
        .where(F.col("cid").isNotNull())
        .select(
            "schema",
            "id",
            F.lit("identifier").alias("field"),
            _prefixed("i", F.col("cid")).alias("token"),
        )
    )

    # --- dates --------------------------------------------------------
    dates = base.where(ptype == "date").select(
        "schema",
        "id",
        F.lit("date").alias("field"),
        _prefixed("d", F.substring("value", 1, 10)).alias("token"),
    )

    # --- addresses ------------------------------------------------------
    addr_words = base.where(ptype == "address").select(
        "schema",
        "id",
        F.explode(
            F.filter(name_tokens(F.col("value")), lambda t: ~t.isin(*STOP_TOKENS))
        ).alias("tok"),
    )
    addrs = addr_words.where(F.length("tok") > 3).select(
        "schema", "id", F.lit("address").alias("field"), _prefixed("a", F.col("tok")).alias("token")
    )
    addr_wd = addr_words.where(F.length("tok") > 6).select(
        "schema", "id", F.lit("wd").alias("field"), _prefixed("wd", F.col("tok")).alias("token")
    )

    # --- text / string / identifier words --------------------------------
    words = (
        base.where(ptype.isin("text", "string", "identifier"))
        .select(
            "schema",
            "id",
            F.explode(
                F.filter(
                    F.split(norm_text(F.col("value")), " "),
                    lambda t: (F.length(t) >= 6) & ~t.isin(*STOP_TOKENS),
                )
            ).alias("tok"),
        )
        .select(
            "schema", "id", F.lit("wd").alias("field"), _prefixed("wd", F.col("tok")).alias("token")
        )
    )

    return (
        nparts.unionByName(nfp)
        .unionByName(fulls)
        .unionByName(idents)
        .unionByName(dates)
        .unionByName(addrs)
        .unionByName(addr_wd)
        .unionByName(words)
    )
