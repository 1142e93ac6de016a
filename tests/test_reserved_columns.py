"""Reserved internal staging names fail loudly instead of silently
destroying caller columns (functions/reserved.py).

Before round 16 these collisions were silent: keep_latest would drop a
caller's ``_rn`` column, asof_join would EMIT a caller's ``_side``
column with engine-internal lit(1) values. Same latent class as the
dedup_lines_in_doc separator defect — reachable only through inputs no
internal caller produces, therefore invisible to the oracle gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _raises_reserved(fn):
    with pytest.raises(ValueError, match="reserved internal"):
        fn()


def test_keep_latest_rejects_rn_collision(spark):
    from pyspark_etl_project_spark.operators.dedup import keep_latest

    df = spark.createDataFrame([(1, 2, "x")], "k int, _rn int, v string")
    _raises_reserved(lambda: keep_latest(df, keys="k", order_by="v"))
    # The max_by arm never stages on the caller's frame — it must keep
    # accepting the same input (the struct round-trips user columns).
    out = keep_latest(df, keys="k", order_by="v", use_max_by=True).collect()
    assert out[0]["_rn"] == 2


def test_latest_version_per_key_rejects_rn_collision(spark):
    from pyspark_etl_project_spark.operators.watermark import (
        latest_version_per_key)

    df = spark.createDataFrame([(1, 5, 9)], "k int, ver int, _rn int")
    _raises_reserved(lambda: latest_version_per_key(df, "k", "ver"))


def test_asof_join_rejects_staging_collisions(spark):
    from pyspark_etl_project_spark.operators.joins import asof_join

    right = spark.createDataFrame([(1, 10, "p")],
                                  "k int, ts int, payload string")
    for bad in ("_ts", "_side", "_m", "_r_payload"):
        left = spark.createDataFrame([(1, 11, 7)],
                                     f"k int, ts int, `{bad}` int")
        _raises_reserved(lambda left=left: asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_cols=["payload"]))


def test_range_join_rejects_bucket_collision(spark):
    from pyspark_etl_project_spark.operators.joins import range_join

    pts = spark.createDataFrame([(5, 1)], "p int, _bucket int")
    iv = spark.createDataFrame([(0, 10)], "s int, e int")
    _raises_reserved(lambda: range_join(pts, iv, "p", "s", "e", 4))
    _raises_reserved(lambda: range_join(
        iv.selectExpr("s as p"), pts.selectExpr("p as s", "p+1 as e",
                                                "_bucket"),
        "p", "s", "e", 4))


def test_salted_join_rejects_salt_collision(spark):
    from pyspark_etl_project_spark.operators.joins import salted_join

    big = spark.createDataFrame([(1, 0)], "k int, _salt int")
    small = spark.createDataFrame([(1,)], "k int")
    _raises_reserved(lambda: salted_join(big, small, "k"))
    _raises_reserved(lambda: salted_join(small, big, "k"))


def test_dense_row_number_rejects_pid_collision(spark):
    from pyspark_etl_project_spark.operators.scd2 import dense_row_number

    df = spark.createDataFrame([(1, 2)], "k int, _dense_pid int")
    _raises_reserved(lambda: dense_row_number(df, ["k"], "pos"))


def test_deterministic_shuffle_rejects_key_collision(spark):
    from pyspark_etl_project_spark.extensions.layout import (
        deterministic_shuffle)

    df = spark.createDataFrame([(1, "x")], "id int, _shuffle_key string")
    _raises_reserved(lambda: deterministic_shuffle(df, "id", seed=1))


def test_guard_is_plan_build_time_and_noop_for_clean_frames(spark):
    """The guard must cost nothing at runtime (list check at plan build)
    and leave clean-frame behavior untouched."""
    from pyspark_etl_project_spark.operators.dedup import keep_latest

    df = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")],
                               "k int, o int, v string")
    out = keep_latest(df, keys="k", order_by="o").collect()
    assert [(r["k"], r["o"], r["v"]) for r in out] == [(1, 2, "b")]
