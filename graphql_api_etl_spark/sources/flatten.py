"""Nested-struct flattening (reference S4).

The reference flattens GraphQL connection responses with
``pd.json_normalize(nodes_list, sep="_")`` (ETL:218), producing columns
like ``node_id``, ``node_label_name``, ``node_parent_isTop``. Spark keeps
nesting as ``StructType``; this helper performs the equivalent
arbitrary-depth flatten as a pure projection (zero shuffle, fully
codegen'd — Catalyst collapses it into the scan's ReadSchema, so at
100 TB the unflattened struct fields are never even read unless used).

Arrays (e.g. the ``children.edges`` connection, ETL:1027–1042) are NOT
exploded by default — that would change cardinality; they stay as
``ArrayType`` columns, matching json_normalize's behavior of leaving
lists in place. Pass ``explode_arrays=True`` for connection-unnesting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten(df: DataFrame, sep: str = "_", explode_arrays: bool = False) -> DataFrame:
    """Recursively flatten all StructType columns into ``parent<sep>child``
    columns, replicating ``pd.json_normalize(sep=...)`` naming."""
    while True:
        if explode_arrays:
            arr = next(
                (f for f in df.schema.fields if isinstance(f.dataType, T.ArrayType)
                 and isinstance(f.dataType.elementType, T.StructType)),
                None,
            )
            if arr is not None:
                others = [c for c in df.columns if c != arr.name]
                df = df.select(*others, F.explode_outer(F.col(arr.name)).alias(arr.name))
                continue
        struct_fields = [f for f in df.schema.fields if isinstance(f.dataType, T.StructType)]
        if not struct_fields:
            return df
        cols: list[F.Column] = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                for sub in f.dataType.fields:
                    cols.append(F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{sep}{sub.name}"))
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)
