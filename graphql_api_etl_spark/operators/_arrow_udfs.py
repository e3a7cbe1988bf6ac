"""Arrow-vectorized pandas UDFs.

Kept in a module WITHOUT ``from __future__ import annotations``:
pandas_udf derives the UDF signature from real (non-string) type
hints, and PEP-563 stringified annotations break that resolution.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def arrow_cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    x = np.vstack(a.values).astype(np.float64)
    y = np.vstack(b.values).astype(np.float64)
    num = np.einsum("ij,ij->i", x, y)
    den = np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
    return pd.Series(num / den)


@pandas_udf("long")
def gzip_len_udf(texts: pd.Series) -> pd.Series:
    """Deflate length per row (zlib level 6) — the compressibility
    quality signal's Python stage."""
    import zlib

    return texts.map(lambda t: len(zlib.compress((t or "").encode("utf-8"), 6)))
