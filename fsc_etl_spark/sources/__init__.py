from fsc_etl_spark.sources.readers import load_tables, read_csv, read_parquet_table  # noqa: F401
from fsc_etl_spark.sources.writers import write_partitioned  # noqa: F401
