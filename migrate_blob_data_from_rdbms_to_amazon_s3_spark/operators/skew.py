"""Skew-handling join utility: salted repartition join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions — demonstrated plan-level
by tests/test_skew.py::test_aqe_skew_join_splits_hot_partition
(SortMergeJoin(skew=true) on the same hot-key fixture, results identical).
Salting is the explicit fallback for the cases AQE can't fix: skewed
AGGREGATION (OptimizeSkewedJoin only splits join partitions — see
plans/analytics.q_salted_hot_key_agg for the two-phase salted agg), and
joins whose output partitioning a same-key downstream op needs (AQE skips
the split there to avoid an extra shuffle). The hot key's rows land on
`n_salts` reducers instead of one.

Mechanics: the probe (big, skewed) side gets a uniform random salt in
[0, n_salts); the build side is replicated n_salts times (explode), so
(key, salt) matches exactly once per original pair. Results are identical
to the plain join — only the shuffle distribution changes. Replication
multiplies the build side n_salts x: keep it for the moderate-size side
or pre-filter to the known-hot keys (targeted salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join `probe ⋈ build` on column `on`, spreading each probe key
    over `n_salts` reducers. Semantics identical to `probe.join(build, on,
    how)` for row-level join types (inner/left)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_probe = probe.withColumn(
        "_salt", (F.rand(seed) * n_salts).cast("int")
    )
    replicated_build = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        salted_probe.join(replicated_build, [on, "_salt"], how)
        .drop("_salt")
    )
