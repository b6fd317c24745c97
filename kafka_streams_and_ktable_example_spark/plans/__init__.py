"""Query catalog: every SURVEY.md §2 capability as a (spark_fn, oracle_sql) pair."""

from .catalog import Query, REGISTRY, register, queries, oracle_sql, headline_queries

# importing the modules populates REGISTRY
from . import ktable_queries  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import relational_more  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import dedup_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import sampling_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401
from . import advanced_queries  # noqa: E402,F401
from . import extra_queries  # noqa: E402,F401
from . import research_queries  # noqa: E402,F401
from . import scale_queries  # noqa: E402,F401
from . import maintenance_queries  # noqa: E402,F401
from . import round3_queries  # noqa: E402,F401
from . import frontier_queries  # noqa: E402,F401
from . import frontier2_queries  # noqa: E402,F401

__all__ = [
    "Query",
    "REGISTRY",
    "register",
    "queries",
    "oracle_sql",
    "headline_queries",
]
