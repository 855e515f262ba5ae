from .registry import REGISTRY, Query, query

# Importing the query modules populates REGISTRY via the @query decorator.
from . import relational  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import control  # noqa: E402,F401
from . import extensions  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import partsupp  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import membership  # noqa: E402,F401
from . import source_edges  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "query"]
