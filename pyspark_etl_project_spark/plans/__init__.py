from pyspark_etl_project_spark.plans.registry import all_queries, all_oracle_sql

__all__ = ["all_queries", "all_oracle_sql"]
