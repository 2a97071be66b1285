from lab3_lakehouse_spark.ml import regression  # noqa: F401
