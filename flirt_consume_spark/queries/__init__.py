"""Query registry: every SURVEY.md §2 operator as a (Spark, oracle-SQL) pair.

Importing this package populates ``REGISTRY``; ``__spark_entry__.py``
exposes it to the driver, and ``tools/check.py`` + tests verify each
pair locally against DuckDB with the exact driver semantics
(row count + schema + order-insensitive value hash).
"""

from flirt_consume_spark.queries.base import REGISTRY, QuerySpec  # noqa: F401

# Import for side effect: each module registers its query keys.
#
# Order matters to external verifiers that sample REGISTRY in insertion
# order with a bounded window of 50: round-4 verified the first 50 keys
# (llm/extras/shapes/pipeline/streaming/windows-head), so round-5
# rotates the never-externally-checked corpus/evolution/analytics keys
# (12) to the front, followed by relational/temporal/scalar (38) whose
# last driver rows predate the round-4 loader changes — exactly filling
# the 50-key window. The round-5 `advanced` keys are brand-new (zero
# external rows) so they take the very front.
from flirt_consume_spark.queries import mixture  # noqa: F401,E402
from flirt_consume_spark.queries import lifecycle  # noqa: F401,E402
from flirt_consume_spark.queries import sketches  # noqa: F401,E402
from flirt_consume_spark.queries import robust  # noqa: F401,E402
from flirt_consume_spark.queries import advanced  # noqa: F401,E402
from flirt_consume_spark.queries import corpus  # noqa: F401,E402
from flirt_consume_spark.queries import evolution  # noqa: F401,E402
from flirt_consume_spark.queries import analytics  # noqa: F401,E402

# Round-5 late additions: registered AFTER the 50-key driver window
# (which this round must spend on the 12 corpus/evolution/analytics
# keys plus the early round-5 batch) — these rotate forward next round.
from flirt_consume_spark.queries import retrieval  # noqa: F401,E402
from flirt_consume_spark.queries import governance  # noqa: F401,E402
from flirt_consume_spark.queries import relational  # noqa: F401,E402
from flirt_consume_spark.queries import temporal  # noqa: F401,E402
from flirt_consume_spark.queries import scalar  # noqa: F401,E402
from flirt_consume_spark.queries import windows  # noqa: F401,E402
from flirt_consume_spark.queries import llm  # noqa: F401,E402
from flirt_consume_spark.queries import extras  # noqa: F401,E402
from flirt_consume_spark.queries import shapes  # noqa: F401,E402
from flirt_consume_spark.queries import pipeline  # noqa: F401,E402
from flirt_consume_spark.queries import streaming  # noqa: F401,E402
