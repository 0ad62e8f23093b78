"""Query surface: every operator from SURVEY.md §2 gets a registered query.

Importing this package populates the registry consumed by
``__spark_entry__.py`` (``queries()`` / ``oracle_sql()``).
"""

from cses2humio_spark.queries.registry import QUERIES, ORACLES, query  # noqa: F401

# Modules self-register on import.
from cses2humio_spark.queries import relational  # noqa: E402,F401
from cses2humio_spark.queries import analytics  # noqa: E402,F401
from cses2humio_spark.queries import logs  # noqa: E402,F401
from cses2humio_spark.queries import llm  # noqa: E402,F401
from cses2humio_spark.queries import connector  # noqa: E402,F401
from cses2humio_spark.queries import training  # noqa: E402,F401
from cses2humio_spark.queries import profiling  # noqa: E402,F401
from cses2humio_spark.queries import mining  # noqa: E402,F401
from cses2humio_spark.queries import hql_queries  # noqa: E402,F401
