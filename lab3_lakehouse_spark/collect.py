"""Guarded driver-side materialization (SURVEY §2.1 S6).

The reference's one abandonment of distributed execution is
``df.toPandas()`` of a whole gold table (``etl_pipeline.py:151``) — at
100 TB that's an OOM, not a hand-off. The engine's ML path stays in
``spark.ml`` (ml/regression.py); when a pandas exit is genuinely wanted
(plots, small exports), it goes through a row-count guard that fails
fast instead of collecting until the driver dies.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


class DriverCollectGuard(ValueError):
    """Raised when a guarded collect would exceed its row budget."""


def to_pandas_guarded(df: DataFrame, max_rows: int = 1_000_000) -> pd.DataFrame:
    """Arrow-enabled ``toPandas`` with a hard row budget.

    The probe is ``limit(max_rows + 1).count()`` — it stops scanning
    after max_rows+1 rows instead of counting the full table, so the
    guard itself is cheap even on a 100 TB input.
    """
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise DriverCollectGuard(
            f"result exceeds the driver budget of {max_rows} rows; "
            "aggregate further or raise max_rows explicitly"
        )
    return df.toPandas()
