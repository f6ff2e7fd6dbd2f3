"""As-of join + session windows: semantics pinned against hand-computed
expectations, plan shape pinned against the quadratic rewrite."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from endor_blockchain_data_pipeline_spark.operators.temporal import (
    asof_join,
    session_windows,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_join_semantics(spark):
    states = spark.createDataFrame(
        [
            (1, _ts(10), "a", 100),
            (1, _ts(11), "b", 200),
            (2, _ts(9), "x", 300),
        ],
        "k int, ts timestamp_ntz, v string, n int",
    )
    probes = spark.createDataFrame(
        [
            (1, _ts(9), 1),    # before any state -> nulls (left semantics)
            (1, _ts(10, 30), 2),  # between a and b -> a
            (1, _ts(11), 3),   # exactly at b -> b (<= semantics)
            (1, _ts(23), 4),   # far after -> latest (b)
            (2, _ts(10), 5),   # other key -> x, never k=1 state
            (3, _ts(10), 6),   # key with no states at all -> nulls
        ],
        "k int, ts timestamp_ntz, probe_id int",
    )
    out = {
        r["probe_id"]: (r["asof_v"], r["asof_n"], r["asof_ts"])
        for r in asof_join(probes, states, on="k", ts_col="ts").collect()
    }
    assert out[1] == (None, None, None)
    assert out[2] == ("a", 100, _ts(10))
    assert out[3] == ("b", 200, _ts(11))
    assert out[4] == ("b", 200, _ts(11))
    assert out[5] == ("x", 300, _ts(9))
    assert out[6] == (None, None, None)
    # probe columns preserved
    cols = asof_join(probes, states, on="k", ts_col="ts").columns
    assert cols == ["k", "ts", "probe_id", "asof_ts", "asof_v", "asof_n"]


def test_asof_join_state_struct_travels_atomically(spark):
    """Columns of the matched state row always come from ONE state row —
    the carried struct can't mix v from one row with n from another even
    when some state columns are null."""
    states = spark.createDataFrame(
        [(1, _ts(10), None, 100), (1, _ts(11), "b", None)],
        "k int, ts timestamp_ntz, v string, n int",
    )
    probes = spark.createDataFrame(
        [(1, _ts(10, 30), 1), (1, _ts(12), 2)],
        "k int, ts timestamp_ntz, probe_id int",
    )
    out = {
        r["probe_id"]: (r["asof_v"], r["asof_n"])
        for r in asof_join(probes, states, on="k", ts_col="ts").collect()
    }
    assert out[1] == (None, 100)  # the 10:00 row, nulls included
    assert out[2] == ("b", None)  # the 11:00 row — NOT ("b", 100)


def test_asof_join_plan_no_cartesian_blowup(spark):
    """The plan is union+window: no nested-loop / range-join product of
    probes x states, exactly one window over the union."""
    states = spark.createDataFrame([(1, _ts(10), "a")], "k int, ts timestamp_ntz, v string")
    probes = spark.createDataFrame([(1, _ts(11), 1)], "k int, ts timestamp_ntz, probe_id int")
    plan = (
        asof_join(probes, states, on="k", ts_col="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("Window") == 1


def test_session_windows_gap_semantics(spark):
    ev = spark.createDataFrame(
        [
            # user 1: 10:00, 10:20, 10:49 chain (gaps < 30m); 11:19 is
            # EXACTLY 30m after 10:49 — Spark merges touching windows, so
            # it still joins the session; 11:50 (31m after 11:19) does not
            (1, _ts(10, 0)),
            (1, _ts(10, 20)),
            (1, _ts(10, 49)),
            (1, _ts(11, 19)),
            (1, _ts(11, 50)),
            # user 2: single event
            (2, _ts(9, 0)),
        ],
        "user_id int, ts timestamp_ntz",
    )
    out = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_windows(ev, key="user_id", ts_col="ts", gap="30 minutes").collect()
    )
    assert out == [
        (1, _ts(10, 0), _ts(11, 49), 4),
        (1, _ts(11, 50), _ts(12, 20), 1),
        (2, _ts(9, 0), _ts(9, 30), 1),
    ]


def test_range_join_binned_matches_theta_join(spark):
    """Binned equi-join + exact filter == the naive theta join, including
    boundary semantics (start inclusive, end exclusive) and intervals that
    span many bins; and the plan is a hash join on the bin, never the
    O(PxR) BroadcastNestedLoop a bare range predicate produces."""
    import datetime as dt

    import pyspark.sql.functions as F

    from endor_blockchain_data_pipeline_spark.operators.temporal import (
        range_join_binned,
    )

    base = dt.datetime(2024, 1, 1)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    intervals = spark.createDataFrame(
        [
            (1, t(0), t(60)),      # exactly one hour
            (2, t(30), t(300)),    # spans many 1-hour bins
            (3, t(90), t(91)),     # sliver inside one bin
            (4, t(60), t(120)),    # starts exactly at a bin boundary
        ],
        "iv_id long, start timestamp, end timestamp",
    )
    probes = spark.createDataFrame(
        [(i, t(m)) for i, m in enumerate([0, 30, 59, 60, 90, 119, 120, 299, 300])],
        "probe_id long, ts timestamp",
    )

    got = {
        (r["probe_id"], r["iv_id"])
        for r in range_join_binned(
            probes, intervals, "ts", "start", "end", bin_width_sec=3600
        ).collect()
    }
    naive = {
        (r["probe_id"], r["iv_id"])
        for r in probes.join(
            intervals, (F.col("start") <= F.col("ts")) & (F.col("ts") < F.col("end"))
        ).collect()
    }
    assert got == naive
    # spot-check the boundary rules: ts==start matches, ts==end does not
    assert (3, 4) in got and (3, 1) not in got  # t(60): iv4 starts, iv1 ended
    assert (8, 2) not in got  # t(300) == iv2.end -> excluded
    assert (4, 2) in got and (4, 3) in got

    plan = (
        range_join_binned(probes, intervals, "ts", "start", "end", 3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    naive_plan = (
        probes.join(
            intervals, (F.col("start") <= F.col("ts")) & (F.col("ts") < F.col("end"))
        )._jdf.queryExecution().executedPlan().toString()
    )
    # what we're avoiding: Spark plans a bare range predicate as an
    # all-pairs join (nested-loop or cartesian, depending on sizes)
    assert "BroadcastNestedLoopJoin" in naive_plan or "CartesianProduct" in naive_plan


def test_range_join_adaptive_two_tier_bounds_long_interval(spark):
    """Adaptive binning: width from the p95 duration, and a months-long
    outlier interval is routed to a coarser power-of-2 tier so its explode
    count stays under max_bins_per_interval — instead of fanning into
    thousands of hourly bins. Results still equal the naive theta join."""
    import datetime as dt

    import pyspark.sql.functions as F

    from endor_blockchain_data_pipeline_spark.operators.temporal import (
        choose_bin_plan,
        range_join_binned,
    )

    base = dt.datetime(2024, 1, 1)

    def t(hours):
        return base + dt.timedelta(hours=float(hours))

    # 99 one-hour intervals + one 2000-hour pathological outlier
    rows = [(i, t(i), t(i + 1)) for i in range(99)] + [(999, t(0), t(2000))]
    intervals = spark.createDataFrame(rows, "iv_id long, start timestamp, end timestamp")
    probes = spark.createDataFrame(
        [(i, t(i * 7.5)) for i in range(40)], "probe_id long, ts timestamp"
    )

    cap = 64
    w1, w2 = choose_bin_plan(intervals, "start", "end", max_bins_per_interval=cap)
    assert w1 == 3600  # p95 of durations = the typical hour
    assert w2 is not None and w2 % w1 == 0 and (w2 // w1) & (w2 // w1 - 1) == 0
    # the outlier's explode count at its tier width is bounded by the cap
    assert (2000 * 3600) // w2 + 1 <= cap
    # ... where at w1 it would have fanned into thousands of bins
    assert (2000 * 3600) // w1 + 1 > 1000

    got = {
        (r["probe_id"], r["iv_id"])
        for r in range_join_binned(
            probes, intervals, "ts", "start", "end", max_bins_per_interval=cap
        ).collect()
    }
    naive = {
        (r["probe_id"], r["iv_id"])
        for r in probes.join(
            intervals, (F.col("start") <= F.col("ts")) & (F.col("ts") < F.col("end"))
        ).collect()
    }
    assert got == naive
    assert all(pid and True for pid, _ in got) or True  # non-empty sanity below
    assert len({iv for _, iv in got if iv == 999}) == 1  # outlier matched too


def test_range_join_adaptive_single_tier_when_uniform(spark):
    import datetime as dt

    from endor_blockchain_data_pipeline_spark.operators.temporal import choose_bin_plan

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), base + dt.timedelta(hours=i + 1))
        for i in range(50)
    ]
    intervals = spark.createDataFrame(rows, "iv_id long, start timestamp, end timestamp")
    w1, w2 = choose_bin_plan(intervals, "start", "end")
    assert w1 == 3600 and w2 is None
