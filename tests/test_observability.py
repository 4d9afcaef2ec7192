"""df.observe(): accumulator-style metrics collected DURING a job — no
second pass over the data.  At 100 TB a pipeline cannot afford a
separate count()/sum() job per stage for monitoring; observations ride
the existing action."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from fletcher_spark.io import load_tables
from tests.conftest import SF_DIR


def test_observe_rides_existing_action(spark):
    li = load_tables(spark, SF_DIR)["lineitem"]
    obs = Observation("li_stats")
    df = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
    ).filter(F.col("l_quantity") > 0)
    df.write.mode("overwrite").format("noop").save()

    got = obs.get
    assert got["n_rows"] == li.count()
    expected_sum = li.agg(F.round(F.sum("l_quantity"), 4)).collect()[0][0]
    assert abs(got["sum_qty"] - expected_sum) < 1e-6
    assert got["n_discounted"] > 0
