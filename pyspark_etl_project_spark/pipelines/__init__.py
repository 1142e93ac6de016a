from pyspark_etl_project_spark.pipelines.common import empty_mart, run_load
from pyspark_etl_project_spark.pipelines.csv_pipeline import csv_transform
from pyspark_etl_project_spark.pipelines.json_pipeline import json_transform
from pyspark_etl_project_spark.pipelines.xml_pipeline import xml_transform

__all__ = ["empty_mart", "run_load", "csv_transform", "json_transform", "xml_transform"]
