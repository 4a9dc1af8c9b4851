"""Skew-mitigation: salted joins.

AQE's skew-join split handles moderate skew automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); salting is
the explicit tool for pathological hot keys: the skewed (large) side gets
a random salt in [0, n), the other side is replicated n× with every salt
value, and the join key becomes (key, salt) — one hot key fans out across
n tasks.  Join semantics for inner/left joins are unchanged (each left
row still matches exactly the same right rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__mrfs_salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Column,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join ``skewed`` (hot-keyed, salted randomly) with ``small``
    (replicated across all salts) on ``on`` AND matching salt."""
    skewed_s = skewed.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int")
    )
    small_r = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return skewed_s.join(
        small_r, on & (skewed_s[SALT_COL] == small_r[SALT_COL]), how
    ).drop(SALT_COL)
