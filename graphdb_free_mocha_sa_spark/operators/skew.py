"""Skew-aware join helper (SCALE.md; SURVEY §4 concurrency/skew notes).

AQE's skew-join splitting (enabled in the session factory) handles most
runtime skew by splitting oversized partitions. This explicit salted join
covers the case AQE cannot: a *broadcast-ineligible* join where one side has
a handful of pathological hot keys known in advance (e.g. a celebrity node
in the quad graph — a predicate or subject occurring 10^8 times at 100 TB).

Mechanics: the skewed side gets a random salt in [0, factor); the other
side is replicated once per salt value (explode), so each hot key's rows
spread over ``factor`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(skewed: DataFrame, other: DataFrame, on: str,
                factor: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on column ``on`` with salt spreading.

    ``skewed`` rows get one random salt; ``other`` rows are exploded
    ``factor``× (one copy per salt). Result equals the plain join; the
    shuffle for any single key fans out over ``factor`` partitions.
    """
    salted = skewed.withColumn(
        "__salt", (F.rand(seed=42) * factor).cast("int"))
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
    out = salted.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
