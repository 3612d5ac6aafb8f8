from project_bigdata_spark.plans.catalog import QUERIES, QuerySpec, query

__all__ = ["QUERIES", "QuerySpec", "query"]
