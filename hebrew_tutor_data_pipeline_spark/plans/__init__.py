from .catalog import CATALOG, QuerySpec, bench_queries, oracle_map, query_map  # noqa: F401
from . import catalog_ml  # noqa: F401  (registers the ML/text queries)
from . import catalog_hebrew  # noqa: F401  (registers the corpus/domain queries)

__all__ = ["CATALOG", "QuerySpec", "bench_queries", "oracle_map", "query_map"]
