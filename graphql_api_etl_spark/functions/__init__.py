"""Scalar/column expression library — the engine's public function
surface, re-exported from the operator modules that define them.

All are native Column expressions (JVM-side, codegen-friendly; no
Python UDFs — SURVEY.md §2.9 policy). Grouped by reference family:

- strings/casts (X1–X9):  int_string, zip5, first_last_name,
  normalize_email  (ETL:262–263, 331–332, 616–657, 642)
- text analysis:          tokens, norm_text, token_count, marker_hits
- hashing/dedup:          shingles, shingle_hash, hamming64
- vectors:                dot, norm, cosine, as_double
"""

from graphql_api_etl_spark.operators.dedup import (
    hamming64,
    shingle_hash,
    shingles,
)
from graphql_api_etl_spark.operators.similarity import as_double, cosine, dot, norm
from graphql_api_etl_spark.operators.text import (
    marker_hits,
    norm_text,
    token_count,
    tokens,
)
from graphql_api_etl_spark.operators.transform import (
    first_last_name,
    int_string,
    normalize_email,
    zip5,
)

__all__ = [
    "as_double",
    "cosine",
    "dot",
    "first_last_name",
    "hamming64",
    "int_string",
    "marker_hits",
    "norm",
    "norm_text",
    "normalize_email",
    "shingle_hash",
    "shingles",
    "token_count",
    "tokens",
    "zip5",
]
