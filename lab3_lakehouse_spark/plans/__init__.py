from lab3_lakehouse_spark.plans import analysis  # noqa: F401
