"""Sessionization + scaler edge tests."""

import datetime as dt

from pyspark.sql import functions as F


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp"
    )


def test_sessionize_gap_boundaries(spark):
    from ml4logs_spark.operators import windows

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, t0),
        ("c1", 1, t0 + dt.timedelta(seconds=10)),
        ("c1", 2, t0 + dt.timedelta(seconds=5000)),   # > 1h gap -> new session
        ("c1", 3, t0 + dt.timedelta(seconds=5030)),
        ("c2", 0, t0),                                 # other conv independent
    ]
    out = (
        windows.with_sessions(_turns(spark, rows), gap_seconds=3600)
        .select("conv_id", "turn_idx", "session_idx").toPandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    assert out[out.conv_id == "c1"].session_idx.tolist() == [0, 0, 1, 1]
    assert out[out.conv_id == "c2"].session_idx.tolist() == [0]


def test_session_stats_duration(spark):
    from ml4logs_spark.operators import windows

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, t0),
        ("c1", 1, t0 + dt.timedelta(seconds=60)),
        ("c1", 2, t0 + dt.timedelta(seconds=9000)),
    ]
    s = windows.session_stats(_turns(spark, rows), gap_seconds=3600).toPandas()
    s = s.sort_values("session_idx")
    assert s.n_turns.tolist() == [2, 1]
    assert s.duration_s.tolist() == [60.0, 0.0]


def test_standardize_degenerate_and_split(spark):
    from ml4logs_spark.operators import features as feat

    # conv-a (md5 '9') is train; conv-d ('e') apply-only
    df = spark.createDataFrame(
        [("conv-a", 2.0), ("conv-a", 4.0), ("conv-d", 100.0)],
        "conv_id string, v double",
    )
    out = feat.standardize(df, "v", keys=[]).toPandas().sort_values("v")
    # mu=3, sd=sqrt(2) from train only; apply row z-scored with train stats
    import math
    assert abs(out.v_z.tolist()[0] - (2 - 3) / math.sqrt(2)) < 1e-9
    assert abs(out.v_z.tolist()[2] - (100 - 3) / math.sqrt(2)) < 1e-9

    # all-train constant column -> sd 0 -> z 0, not NaN
    c = spark.createDataFrame([("conv-a", 5.0), ("conv-b", 5.0)], "conv_id string, v double")
    z = feat.standardize(c, "v", keys=[]).toPandas()
    assert (z.v_z == 0.0).all()
