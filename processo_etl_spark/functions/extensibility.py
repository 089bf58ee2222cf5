"""User extensibility: the sanctioned escape hatches, Arrow-batched.

The reference's escape hatch is ``df.apply(..., axis=1)`` — row-at-a-time
Python (reference dag.py:106–113, 162; SURVEY §2.10).  This engine
eliminated every internal use (native Column expressions throughout);
what remains is the USER-facing extension surface, and it is
Pandas-UDF-only by policy:

- ``@pandas_udf`` scalar: Arrow column batches in/out, 10–100× over
  row-at-a-time ``udf()``; still ~an order slower than staying JVM-side,
  so reach for it only when no builtin composition expresses the logic.
- ``applyInPandas`` / ``mapInPandas``: whole-group / whole-partition
  batches for logic that genuinely needs a dataframe at once (see
  ml/multimodal.py, streaming/jobs.sessionize_stateful).

``register_example_udfs`` doubles as the how-to template and as test
subject: each example has a native-expression twin asserted equal in
tests/test_functions.py, demonstrating the parity methodology users
should follow for their own extensions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def softclip_score(v: pd.Series) -> pd.Series:
    """Example scalar Pandas UDF: smooth-clip a score into [0, 1]
    (1/(1+exp(-4(x-0.5))) — a shape with no single builtin)."""
    import numpy as np

    return 1.0 / (1.0 + np.exp(-4.0 * (v.astype(float) - 0.5)))


@pandas_udf("long")
def byte_length_utf8(s: pd.Series) -> pd.Series:
    """Example with a native twin (``F.octet_length``) used by the parity
    test — write your UDF, then prove it against a builtin on the domain
    where both are defined."""
    return s.str.encode("utf-8").str.len().astype("int64")


def register_example_udfs(spark: SparkSession) -> None:
    """Expose the examples to SQL users: ``SELECT softclip_score(x) …``."""
    spark.udf.register("softclip_score", softclip_score)
    spark.udf.register("byte_length_utf8", byte_length_utf8)


def native_softclip(c) -> F.Column:
    """JVM-side twin of softclip_score — the form to PREFER in pipelines;
    the UDF exists to demonstrate the extension mechanism."""
    col = F.col(c) if isinstance(c, str) else c
    return 1.0 / (1.0 + F.exp(-4.0 * (col.cast("double") - 0.5)))
