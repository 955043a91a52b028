"""Unit + plan tests for record linkage (linkage.py) and time-series
resampling (timeseries.py). Oracle parity is covered by
test_oracle_parity; these pin pairing/grid semantics and plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from simplemapreduceframework_spark import registry
from simplemapreduceframework_spark.operators.linkage import _LEV_MAX
from simplemapreduceframework_spark.plans import explain_str

registry.load_all()
Q = registry.QUERIES


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_match_pairs_are_blocked_ordered_and_within_distance(
    spark, sf_dir
):
    rows = Q["fuzzy_match_parts"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["a_name"] < r["b_name"]
        # same blocking noun
        assert r["a_name"].split()[-1] == r["b_name"].split()[-1]
        assert r["dist"] == _lev(r["a_name"], r["b_name"]) <= _LEV_MAX
        assert r["a_records"] > 0 and r["b_records"] > 0


def test_fuzzy_match_collapses_before_pairing(spark, sf_dir):
    # the quadratic step runs on distinct names: no pair appears twice
    rows = Q["fuzzy_match_parts"](spark, sf_dir).collect()
    pairs = [(r["a_name"], r["b_name"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_resample_grid_is_dense_per_type(spark, sf_dir):
    rows = Q["events_resample_ffill"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for recs in by_type.values():
        hours = sorted(
            dt.datetime.strptime(r["hour"], "%Y-%m-%d %H:%M:%S")
            for r in recs
        )
        span = int((hours[-1] - hours[0]).total_seconds() // 3600) + 1
        assert len(hours) == span  # no missing grid point
        assert len(set(hours)) == len(hours)  # no duplicates
        for a, b in zip(hours, hours[1:]):
            assert b - a == dt.timedelta(hours=1)


def test_resample_gap_semantics(spark, sf_dir):
    rows = Q["events_resample_ffill"](spark, sf_dir).collect()
    gaps = [r for r in rows if r["is_gap"]]
    assert gaps, "synthetic events should leave empty hours"
    assert all(r["n_events"] == 0 for r in gaps)
    assert all(r["n_events"] > 0 for r in rows if not r["is_gap"])
    # first grid point per type is an observation, so ffill never NULL
    assert all(r["sum_value_ffill"] is not None for r in rows)


def test_resample_ffill_carries_last_observation(spark, sf_dir):
    rows = Q["events_resample_ffill"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for recs in by_type.values():
        recs.sort(key=lambda r: r["hour"])  # ISO strings sort correctly
        last = None
        for r in recs:
            if not r["is_gap"]:
                last = r["sum_value_ffill"]
            else:
                assert r["sum_value_ffill"] == last


def test_resample_plan_broadcasts_hourly_under_grid(spark, sf_dir):
    plan = explain_str(Q["events_resample_ffill"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_funnel_broadcast_and_shuffle_paths_agree(spark, sf_dir):
    # size-gated stage joins (the decontaminate() dispatcher pattern):
    # threshold 0 forces every stage join to shuffle; default
    # broadcasts — identical counts either way
    from simplemapreduceframework_spark.operators.timeseries import (
        _FUNNEL_STAGES,
        funnel_stage_frames,
    )
    from simplemapreduceframework_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    frames_b, counts_b = funnel_stage_frames(ev, _FUNNEL_STAGES)
    frames_s, counts_s = funnel_stage_frames(
        ev, _FUNNEL_STAGES, broadcast_max_users=0
    )
    assert counts_b == counts_s
    assert counts_b[0] >= counts_b[1] >= counts_b[2] >= 0
    for f in frames_b + frames_s:
        f.unpersist()


def test_funnel_empty_top_stage_yields_null_ratio(spark):
    # zero 'view' events: both engines must emit NULL, not NaN
    # (advisor r6 — Spark 0/0 is NaN, DuckDB division by zero is NULL)
    from simplemapreduceframework_spark.operators.timeseries import (
        _FUNNEL_STAGES,
        _funnel_report,
    )

    rows = _funnel_report(spark, _FUNNEL_STAGES, [0, 0, 0]).collect()
    assert [r["n_users"] for r in rows] == [0, 0, 0]
    assert all(r["conversion_from_top"] is None for r in rows)
