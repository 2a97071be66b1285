"""Query registry: every implemented operator exposed as a named query.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered via
``@query(name, oracle=...)``; the oracle is the ANSI-SQL equivalent run
by DuckDB in the driver's differential check. Queries without an oracle
(LSH dedup, streaming, ML — non-SQL-expressible) get a rows-only check.

Import side effects populate the registry.
"""

from lab3_lakehouse_spark.queries.registry import ORACLES, QUERIES, query  # noqa: F401
from lab3_lakehouse_spark.queries import parity  # noqa: F401, E402
from lab3_lakehouse_spark.queries import relational  # noqa: F401, E402
from lab3_lakehouse_spark.queries import llmdata  # noqa: F401, E402
from lab3_lakehouse_spark.queries import streamml  # noqa: F401, E402
from lab3_lakehouse_spark.queries import temporal  # noqa: F401, E402
from lab3_lakehouse_spark.queries import analytics  # noqa: F401, E402
from lab3_lakehouse_spark.queries import mutation  # noqa: F401, E402
