from pyspark_etl_project_spark.operators.dedup import keep_latest
from pyspark_etl_project_spark.operators.cdc import cdc_classify
from pyspark_etl_project_spark.operators.lookup import prepare_dimension, lookup_join
from pyspark_etl_project_spark.operators.scd2 import scd2_merge
from pyspark_etl_project_spark.operators.watermark import max_watermark, latest_version_per_key
from pyspark_etl_project_spark.operators.audit import load_audit_metrics

__all__ = [
    "keep_latest",
    "cdc_classify",
    "prepare_dimension",
    "lookup_join",
    "scd2_merge",
    "max_watermark",
    "latest_version_per_key",
    "load_audit_metrics",
]
