"""Shared determinism helpers for the query catalog.

Cross-engine float policy: aggregate outputs are rounded with an
expression that is the SAME IEEE-754 computation in Spark and in the
oracle SQL — ``floor(x*10⁴ + 0.5) / 10⁴`` — so both engines produce
bit-identical doubles even at half-way points, where Spark's
BigDecimal-based ``round()`` and DuckDB's scaled ``std::round`` can
legitimately disagree. (Plain ``round`` is NOT cross-engine stable;
see tests/test_oracle_parity.py history.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round4(col: Column) -> Column:
    """Deterministic 4-decimal rounding (half-up toward +inf)."""
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def sql_round4(expr: str) -> str:
    """The oracle-SQL twin of :func:`round4` — same IEEE ops, same result.

    The CAST keeps the division in DOUBLE on *both* engines: DuckDB's
    ``floor(double)`` is already DOUBLE (cast is a no-op), but Spark SQL's
    ``floor(double)`` returns BIGINT and ``BIGINT / 10000.0`` with a
    decimal literal would yield DECIMAL — the round-1 driver-hash failure
    mode for every query routed through ``spark.sql`` (grouping_sets /
    Q17). With the cast, both engines divide the exactly-represented
    integer by 10000.0 in IEEE double → bit-identical.
    """
    return f"CAST(floor(({expr}) * 10000.0 + 0.5) AS DOUBLE) / 10000.0"


def scratch_dir(prefix: str) -> str:
    """Scratch root for registry queries that materialize a persisted
    index tier (BM25 postings, IVF-PQ codes, media signatures) before
    probing it. Honors ``$SPARK_GRAFT_SCRATCH`` when set; otherwise a
    driver-local tempdir.

    LOCAL-MODE ASSUMPTION (documented, deliberate): the default
    tempdir is only readable by executors because local[*] runs them
    in the driver's process — the sandbox this catalog is verified in.
    On a real cluster, point ``SPARK_GRAFT_SCRATCH`` at shared storage
    (HDFS / s3a / NFS) so the executors that write and later probe the
    tier can all reach it; in production the store would live
    permanently next to the corpus tier and the build would not run
    inside the query at all (the in-query build is what makes these
    registry entries self-contained for the differential gate)."""
    import os
    import tempfile

    root = os.environ.get("SPARK_GRAFT_SCRATCH")
    if root:
        os.makedirs(root, exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir=root or None)
