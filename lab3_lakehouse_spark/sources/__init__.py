from lab3_lakehouse_spark.sources import ingest, medallion  # noqa: F401
