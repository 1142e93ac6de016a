from pyspark_etl_project_spark.sources.csv_source import read_csv_tickets
from pyspark_etl_project_spark.sources.json_source import json_records_df, read_json_interactions
from pyspark_etl_project_spark.sources.xml_source import parse_xml_records

__all__ = [
    "read_csv_tickets",
    "read_json_interactions",
    "json_records_df",
    "parse_xml_records",
]
