"""nomenklatura_spark — a PySpark-native entity-resolution / data-integration
analytics engine with the query and data-processing capabilities of
opensanctions/nomenklatura, re-expressed Spark-first.

Design (see SURVEY.md for the full blueprint):

- The fundamental record is the *statement* (a 13-column triple-store row,
  reference: ``nomenklatura/db.py:193-214``); here it is a DataFrame with a
  fixed StructType, partitioned by ``dataset``.
- The blocking index (reference: ``nomenklatura/blocker/index.py``) is a set
  of SQL aggregations + a token self-join; it ports to Spark SQL nearly
  verbatim and is the scalability core (candidate generation bounded by the
  dynamic-stopword pair-cost budget).
- The resolver (reference: ``nomenklatura/resolver``) is an edge table plus
  connected components; implemented as iterative DataFrame label propagation.
- Matching features (reference: ``nomenklatura/matching``) are column
  expressions where possible, Arrow-batched pandas UDFs where not.

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from nomenklatura_spark.plans.cache import clear_plan_caches  # noqa: F401
from nomenklatura_spark.session import get_spark  # noqa: F401
