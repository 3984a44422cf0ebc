"""Text normalization primitives as pure Catalyst column expressions.

The reference delegates to the ``rigour``/``normality`` libraries (Rust
cores) for name/text normalization. Those are not re-implemented
byte-for-byte; the semantics (lowercase, diacritic folding, non-alphanumeric
splitting, legal-form and stop-token removal) are expressed with built-in
``pyspark.sql.functions`` so the whole tokenize stage stays inside
whole-stage codegen — no Python in the 100 TB hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Latin diacritic fold map — covers latin-1/latin-2 letters; characters with
# no mapping pass through (consistent with fold-to-ascii best effort).
_ACCENTS_SRC = "àáâãäåāăąèéêëēĕėęěìíîïĩīĭįıòóôõöøōŏőùúûüũūŭůűųýÿŷñńņňçćĉċčšśŝşžźżđďğĝłřŕŗţťÀÁÂÃÄÅĀĂĄÈÉÊËĒĔĖĘĚÌÍÎÏĨĪĬĮÒÓÔÕÖØŌŎŐÙÚÛÜŨŪŬŮŰŲÝŸŶÑŃŅŇÇĆĈĊČŠŚŜŞŽŹŻĐĎĞĜŁŘŔŖŢŤ"
_ACCENTS_DST = "aaaaaaaaaeeeeeeeeeiiiiiiiiioooooooooouuuuuuuuuuyyynnnncccccsssszzzdggglrrrttAAAAAAAAAEEEEEEEEEIIIIIIIIOOOOOOOOOUUUUUUUUUUYYYNNNNCCCCCSSSSZZZDDGGLRRRTT"

# Common legal-form tokens dropped from name-part tokens (the reference tags
# these NamePartTag.LEGAL via rigour and skips them — tokenizer.py:81-82).
LEGAL_FORMS = [
    "gmbh", "mbh", "ltd", "llc", "inc", "corp", "co", "ag", "sa", "plc",
    "bv", "nv", "oy", "ab", "as", "kg", "kgaa", "ooo", "zao", "oao",
    "pjsc", "ojsc", "jsc", "llp", "lp", "srl", "spa", "sarl", "sas",
    "limited", "incorporated", "corporation", "company", "holdings",
    "holding", "group", "ug",
]

# Minimal multi-language stop tokens for name parts / words (the reference
# uses rigour's is_stopword — tokenizer.py:106-107).
STOP_TOKENS = [
    "the", "and", "von", "van", "der", "den", "de", "di", "da", "del",
    "la", "le", "les", "el", "al", "of", "for", "und", "und", "dem",
    "mr", "mrs", "ms", "dr", "herr", "frau",
]


def fold_ascii(col: Column) -> Column:
    """Best-effort diacritic folding, JVM-side via translate()."""
    return F.translate(col, _ACCENTS_SRC, _ACCENTS_DST)


def norm_text(col: Column) -> Column:
    """Lowercase, fold diacritics, collapse non-alphanumerics to spaces."""
    lowered = F.lower(fold_ascii(col))
    return F.trim(F.regexp_replace(lowered, r"[^a-z0-9]+", " "))


def name_tokens(col: Column) -> Column:
    """Array of normalized name tokens (split on non-alphanumerics)."""
    return F.filter(F.split(norm_text(col), " "), lambda t: t != "")


def clean_identifier(col: Column) -> Column:
    """Identifier normalization: strip separators, uppercase (approximates
    rigour's StrictFormat.normalize — reference tokenizer.py:114-117)."""
    cleaned = F.upper(F.regexp_replace(col, r"[^A-Za-z0-9]+", ""))
    return F.when(F.length(cleaned) >= 4, cleaned)


def name_fingerprint(col: Column) -> Column:
    """T5 — sorted-token name fingerprint: normalize, drop legal forms,
    sort distinct tokens, join. Reference: matching/compat.py:28-42 and
    blocker/tokenizer.py:87-91 (sorted concat variant)."""
    toks = F.array_distinct(
        F.filter(name_tokens(col), lambda t: ~t.isin(*LEGAL_FORMS))
    )
    return F.array_join(F.array_sort(toks), "")
