"""Query registry: every SURVEY.md §2 operator as a (Spark, oracle-SQL) pair.

Importing this package populates ``REGISTRY``; ``__spark_entry__.py``
exposes it to the driver, and ``tools/check.py`` + tests verify each
pair locally against DuckDB with the exact driver semantics
(row count + schema + order-insensitive value hash).
"""

from flirt_consume_spark.queries.base import REGISTRY, QuerySpec  # noqa: F401

# Import for side effect: each module registers its query keys.
from flirt_consume_spark.queries import relational  # noqa: F401,E402
from flirt_consume_spark.queries import windows  # noqa: F401,E402
from flirt_consume_spark.queries import temporal  # noqa: F401,E402
from flirt_consume_spark.queries import scalar  # noqa: F401,E402
from flirt_consume_spark.queries import streaming  # noqa: F401,E402
from flirt_consume_spark.queries import llm  # noqa: F401,E402
from flirt_consume_spark.queries import extras  # noqa: F401,E402
from flirt_consume_spark.queries import shapes  # noqa: F401,E402
from flirt_consume_spark.queries import pipeline  # noqa: F401,E402
