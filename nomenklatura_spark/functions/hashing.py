"""Deterministic md5-derived pseudo-randomness.

The repo-wide stand-in for seeded RNG: a cluster-size- and
partition-order-independent uniform bucket derived from a content hash,
replayable as ANSI SQL (``CAST(('0x' || substr(md5(...), 1, 15)) AS
BIGINT) % m``), so every sampling decision an operator makes is
verifiable by the DuckDB oracle and stable across engines, retries and
repartitionings.  Used by the mix sampler (``doc_sample_mix``), the
classifier's train/eval split and DSIR's Gumbel keys — keep the
15-hex-char width and pmod semantics aligned with the SQL replays.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_bucket(prefix: str, col: Column, mod: int) -> Column:
    """Uniform integer bucket in ``[0, mod)`` keyed on ``prefix:value``.

    15 hex chars parse into a non-negative BIGINT (< 16^15 < 2^63), so
    the pmod is a plain remainder on every engine."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix + ":"), col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(mod),
    )
