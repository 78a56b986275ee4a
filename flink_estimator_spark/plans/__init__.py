from .registry import QUERIES, QuerySpec, get_queries, get_oracle_sql, query  # noqa: F401

# importing the modules populates the registry
from . import simple, medium, analytic, tpch_more, advanced, window_tvf, whatif, diagnostics, streaming_runtime, capstone  # noqa: F401,E402
from ..operators import dedup, similarity, textstats, multimodal, jpeg, skew, mixing, scd, sampling, fuzzy, timeseries, cleaning, incremental, sequence, chunking, sketches, retrieval, graph, bloom, bpe, classifier, pq  # noqa: F401,E402
