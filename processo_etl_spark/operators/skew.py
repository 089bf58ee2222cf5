"""Skew mitigation: salted join for hot keys.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py) — it splits oversized shuffle partitions at runtime
with zero code change.  Salting is the explicit fallback for the cases
AQE can't fix: a *single* key so hot that even a split partition's build
side explodes, or a broadcast that doesn't fit.

``salted_join``: the big (skewed) side gets a random salt in [0, n);
the small side is exploded n× so every (key, salt) pair exists — the
join key becomes (key, salt), spreading each hot key over n tasks.
Cost: small side replicated n× (choose n ≈ skew factor, not cores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Row-level results are identical to ``big.join(small, on, how)`` for
    'inner' and 'left' joins (each big row carries exactly one salt and
    meets exactly one replica of its key).
    """
    keys = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn(
        SALT_COL, F.floor(F.rand(seed) * n_salts).cast("int")
    )
    small_exploded = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_exploded, on=[*keys, SALT_COL], how=how)
    return out.drop(SALT_COL)
