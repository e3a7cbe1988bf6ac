"""LLM-data-pipeline catalog entries (dedup, text analysis,
similarity/ANN, multimodal plumbing, curation) — the thin aggregation
module left after the r12 family split (VERDICT r11 ask #4).

The family modules live in the queries package and register into the
shared QUERIES dict on import, in the original monolith order; the
re-export loop keeps every helper importable as
``graphql_api_etl_spark.queries_llm.<name>`` exactly as before.
"""

from __future__ import annotations

from graphql_api_etl_spark.queries import llm_dedup_text_sim  # noqa: E402
from graphql_api_etl_spark.queries import llm_curation  # noqa: E402
from graphql_api_etl_spark.queries import llm_retrieval  # noqa: E402
from graphql_api_etl_spark.queries import llm_tokenize_mm  # noqa: E402

import sys as _sys

_pkg = _sys.modules[__name__]
_seen: dict[str, str] = {}
for _m in (llm_dedup_text_sim, llm_curation, llm_retrieval, llm_tokenize_mm):
    for _k in _m.__catalog_exports__:
        if _k in _seen:
            raise ValueError(
                f"cross-module catalog name collision: {_k} defined in both "
                f"{_seen[_k]} and {_m.__name__}"
            )
        _seen[_k] = _m.__name__
        setattr(_pkg, _k, getattr(_m, _k))
del _pkg, _seen, _m, _k, _sys
