"""Join operators (absent from the reference — SURVEY §2.7 gap list).

The reference has **no joins**; this module supplies the standard
equi-join surface a lakehouse query engine needs, with scale-aware
strategy selection:

- ``equi_join``     — inner/left/right/full/semi/anti on named keys.
- ``broadcast_dim`` — explicit broadcast hint for small dimensions.
- ``star_join``     — fact ⋈ many dims, broadcasting every dim whose
  name is in ``catalog.SMALL_DIMS`` (region/nation/… stay broadcastable
  even at TPC-H SF100k; the fact side never shuffles for them).
- ``skew_salted_join`` — explicit salting fallback for a hot key when
  AQE skew-join splitting isn't enough.

Scale notes: with AQE on (session.py) Spark picks broadcast-hash vs
sort-merge from *runtime* sizes and splits skewed partitions; the
explicit ``F.broadcast`` hints here are for dims we know are small by
contract, which saves AQE the first wrong-sized shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_TYPES = ("inner", "left", "right", "full", "left_semi", "left_anti", "cross")


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | list,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    if how not in JOIN_TYPES:
        raise ValueError(f"how must be one of {JOIN_TYPES}")
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def broadcast_dim(dim: DataFrame) -> DataFrame:
    return F.broadcast(dim)


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, str | Sequence[str] | list, str]],
    small_dim_names: Sequence[str] = (),
) -> DataFrame:
    """Join a fact table against a sequence of ``(dim, on, name)`` triples.

    Dims listed in ``small_dim_names`` get a broadcast hint; the rest are
    left to AQE. Join order is as given — put the most selective dim
    first so downstream joins see fewer fact rows (Catalyst/CBO may still
    reorder inner joins).
    """
    out = fact
    small = set(small_dim_names)
    for dim, on, name in dims:
        d = F.broadcast(dim) if name in small else dim
        out = out.join(d, on=on, how="inner")
    return out


def skew_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join for a skewed single-key join.

    Left rows get a random-ish salt in [0, salt_buckets); the right side
    is replicated ``salt_buckets``× with every salt value, and the join
    key becomes (key, salt) — spreading a hot key across reducers.
    Exact for inner/left joins (each left row matches exactly the same
    right rows as before). Prefer AQE skew-join; use this when one key
    alone exceeds a single executor's memory.
    """
    salted_left = left.withColumn(
        "__salt", (F.crc32(F.col(on).cast("string")) + F.monotonically_increasing_id()) % salt_buckets
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    salted_right = right.select("*", salts).withColumn("__salt", F.col("__salt").cast("long"))
    out = salted_left.join(salted_right, on=[on, "__salt"], how=how)
    return out.drop("__salt")
