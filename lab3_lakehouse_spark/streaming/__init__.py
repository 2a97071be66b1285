from lab3_lakehouse_spark.streaming import windows  # noqa: F401
