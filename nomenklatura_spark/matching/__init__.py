"""Matching algorithms and the by-name registry.

Mirrors the reference's ``nomenklatura.matching`` surface
(``matching/__init__.py:11-30``): callers address a scoring algorithm by
its stable NAME string; each algorithm is a ``pairs DataFrame → scored
DataFrame`` callable over the assembled pair frame
(``operators/pairs.py`` columns: l_/r_ property arrays).

The two regression models (``regression-v1``, ``er-unstable``) need a
fitted model — build their scorer with
``matching.train.score_regression`` after ``train_logistic``; the
registry maps their names to a factory raising a helpful error when
called without training, so ``get_algorithm`` still resolves every
reference name.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

from nomenklatura_spark.matching.logic import score_pairs_logic_v1
from nomenklatura_spark.matching.name_based import (
    score_pairs_name_based,
    score_pairs_name_qualified,
)
from nomenklatura_spark.matching.names_v2 import score_pairs_logic_v2
from nomenklatura_spark.matching.ofac import score_pairs_ofac

Scorer = Callable[[DataFrame], DataFrame]


def _needs_model(name: str) -> Scorer:
    def _raise(pairs: DataFrame) -> DataFrame:
        raise ValueError(
            f"algorithm {name!r} is a regression model — fit it with "
            "matching.train.train_logistic and score with "
            "matching.train.score_regression"
        )

    return _raise


ALGORITHMS: dict[str, Scorer] = {
    "logic-v1": score_pairs_logic_v1,
    "logic-v2": score_pairs_logic_v2,
    "ofac": score_pairs_ofac,
    "name-based": score_pairs_name_based,
    "name-qualified": score_pairs_name_qualified,
    "regression-v1": _needs_model("regression-v1"),
    "er-unstable": _needs_model("er-unstable"),
}

DEFAULT_ALGORITHM = "logic-v1"


def get_algorithm(name: str) -> Optional[Scorer]:
    """Scoring callable for a reference algorithm name, or None."""
    return ALGORITHMS.get(name)


__all__ = [
    "ALGORITHMS",
    "DEFAULT_ALGORITHM",
    "get_algorithm",
    "score_pairs_logic_v1",
    "score_pairs_logic_v2",
    "score_pairs_name_based",
    "score_pairs_name_qualified",
    "score_pairs_ofac",
]
