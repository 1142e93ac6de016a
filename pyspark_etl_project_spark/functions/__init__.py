from pyspark_etl_project_spark.functions.hashing import row_fingerprint, source_system_identifier
from pyspark_etl_project_spark.functions.normalize import (
    duration_to_seconds,
    rating_words_to_score,
    rating_ten_to_five,
    yes_no_to_flag,
    true_false_to_flag,
    validity_flag,
)

__all__ = [
    "row_fingerprint",
    "source_system_identifier",
    "duration_to_seconds",
    "rating_words_to_score",
    "rating_ten_to_five",
    "yes_no_to_flag",
    "true_false_to_flag",
    "validity_flag",
]
