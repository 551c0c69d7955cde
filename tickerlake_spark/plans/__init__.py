from tickerlake_spark.plans.catalog import QUERIES, QuerySpec, load_table, oracle_map, query_map

__all__ = ["QUERIES", "QuerySpec", "load_table", "oracle_map", "query_map"]
