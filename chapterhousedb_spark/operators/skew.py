"""Skew-handling utilities: salted join for hot keys.

First line of defense is AQE: `spark.sql.adaptive.skewJoin.enabled`
(on in build_session) splits oversized shuffle partitions at runtime.
AQE cannot help when a single KEY is hot in a shuffle hash join whose
other side cannot be broadcast: every row of that key hashes to one
task. Salting fixes that shape explicitly: the skewed (fact) side gets
a uniform salt in [0, salt), the small-but-not-broadcastable (dim) side
is replicated once per salt value, and the join key becomes
(key, salt) — the hot key now spreads over `salt` tasks.

Cost model: dim side shuffles `salt` times its size; fact side is
unchanged. Choose salt ~ (hot-key row count / target rows per task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join fact (skewed on `on`) with dim, spreading each key over
    `salt` reduce tasks. Result equals fact.join(dim, on, how) exactly;
    only the physical distribution changes.

    `how` supports inner/left joins (the fact side must be preserved —
    for right/full joins salt the other side instead).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    f_salted = fact.withColumn(
        "__salt", F.floor(F.rand(seed) * salt).cast("int")
    )
    d_salted = dim.withColumn(
        "__salt", F.explode(F.expr(f"sequence(CAST(0 AS INT), CAST({salt - 1} AS INT))"))
    )
    out = f_salted.join(d_salted, [on, "__salt"], how)
    return out.drop("__salt")
