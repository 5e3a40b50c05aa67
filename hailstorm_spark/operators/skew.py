"""Skew-handling operators: salted large-large joins.

The reference ships `data/skewdata.txt` (≥12k of its 13k rows are the
word 'hello') as its adversarial input but has no mitigation — a hash
grouping sends every 'hello' to one bolt instance
(reference src/Hailstorm/Topology/HardcodedTopology.hs:33-34). On Spark,
skewed *aggregations* are already fine (map-side partial aggregation
compresses the hot key before the shuffle), and AQE's skew-join rule
(spark.sql.adaptive.skewJoin) splits oversized partitions at runtime.
Salting remains the explicit tool for the case AQE can't fix: a
large-large equi-join where one key's rows exceed a single task's
memory no matter how partitions are split on the OTHER side's build
rows — replicate the build side per salt so the hot key's probe rows
divide across `salt` independent tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    salt_from: Column | None = None,
) -> DataFrame:
    """Equi-join with the hot-key pressure split across ``salt`` tasks.

    probe side: each row gets a deterministic salt in [0, salt) (from
    ``salt_from`` if given — any well-distributed column expression —
    else a hash of the whole row); build side: every row is replicated
    once per salt value (an ``explode`` of a literal range — a flatMap,
    NOT a shuffle; the build side grows ×salt, which is why salt stays
    small). The join key becomes (key, salt): rows of one hot key now
    land in ``salt`` different partitions instead of one.

    Result set is identical to ``probe.join(build, on, how)`` — salting
    only changes data placement. Supported ``how``: inner/left (the
    build-replication trick preserves exactly these semantics).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how}")
    if salt_from is None:
        salt_from = F.hash(*[F.col(c) for c in probe.columns])
    p = probe.withColumn("__salt", F.pmod(salt_from, F.lit(salt)).cast("int"))
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    joined = p.join(b, [on, "__salt"], how)
    return joined.drop("__salt")
