from project_bigdata_spark.sources.registry import TABLES, load_table, write_partitioned_parquet

__all__ = ["TABLES", "load_table", "write_partitioned_parquet"]
