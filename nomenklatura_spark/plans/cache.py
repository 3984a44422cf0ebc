"""Per-(session, corpus) memoization for persisted relations.

``functools.lru_cache`` is the wrong tool for memoizing *persisted*
DataFrames: eviction drops the Python reference but the executor block
cache still holds the persisted partitions (Spark's ``CacheManager``
keys cached data on the logical plan and holds it until an explicit
``unpersist``), so a long-lived session that touches more corpora than
``maxsize`` accumulates orphaned cache entries executor memory can
never reclaim.  ``plan_cache`` is an LRU with the same signature
contract, plus:

- eviction **unpersists** every cached frame inside the evicted value
  (DataFrames, or tuples/lists of DataFrames — the match-inputs and
  codebook memoizers return tuples);
- every instance registers itself so :func:`clear_plan_caches` can
  tear down the whole working set (end of a serving batch, or a test
  asserting the block cache returns to its baseline).

The memoized value is an immutable query plan; rebuilding it per call
would re-pay parquet listing + py4j plan construction + the persisted
relation itself, which is why these are session-scoped caches at all
(the reference materializes the same relations as DuckDB tables once
per run, ``nomenklatura/blocker/index.py``).
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Any, Callable

from pyspark.sql import DataFrame

_REGISTRY: list["PlanCache"] = []


def _unpersist_value(value: Any) -> None:
    """Release every persisted DataFrame reachable in a cached value.

    ``unpersist`` on a never-persisted frame is a harmless no-op, so
    this is safe for memoizers that cache bare (unpersisted) plans."""
    if isinstance(value, DataFrame):
        value.unpersist()
    elif isinstance(value, (tuple, list)):
        for item in value:
            _unpersist_value(item)


class PlanCache:
    """LRU memoizer whose eviction path unpersists the evicted value."""

    def __init__(self, maxsize: int = 8) -> None:
        self.maxsize = maxsize
        self._data: OrderedDict[tuple, Any] = OrderedDict()
        _REGISTRY.append(self)

    def __call__(self, fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args):
            key = args
            if key in self._data:
                self._data.move_to_end(key)
                return self._data[key]
            value = fn(*args)
            self._data[key] = value
            while len(self._data) > self.maxsize:
                _, evicted = self._data.popitem(last=False)
                _unpersist_value(evicted)
            return value

        wrapper.cache = self  # type: ignore[attr-defined]
        return wrapper

    def __len__(self) -> int:
        return len(self._data)

    def clear(self) -> None:
        while self._data:
            _, evicted = self._data.popitem(last=False)
            _unpersist_value(evicted)


def plan_cache(maxsize: int = 8) -> PlanCache:
    return PlanCache(maxsize=maxsize)


def clear_plan_caches() -> None:
    """Unpersist and drop every memoized relation in the process —
    returns the Spark block cache to its pre-session baseline (modulo
    persists owned by live plans the caller still holds)."""
    for cache in _REGISTRY:
        cache.clear()
