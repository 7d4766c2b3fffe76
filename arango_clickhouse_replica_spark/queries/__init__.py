from .registry import QUERIES, Query, query

# Importing these modules populates the registry.
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import dsl_queries  # noqa: E402,F401
from . import scalar_fns  # noqa: E402,F401
from . import cdc_queries  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import multimodal_queries  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import text_lm  # noqa: E402,F401
from . import quality_filters  # noqa: E402,F401
from . import retrieval  # noqa: E402,F401
from . import embed_ops  # noqa: E402,F401
from . import gopher_filters  # noqa: E402,F401

__all__ = ["QUERIES", "Query", "query"]
