from cses2humio_spark.sources.catalog import TABLES, load_table, load_tables  # noqa: F401
