from oarphpy_spark.sources.archive import archive_df  # noqa: F401
