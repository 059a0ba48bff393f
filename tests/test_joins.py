"""Temporal join semantics + plan-shape gates (operators/joins.py)."""

from __future__ import annotations

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

from webhookdb_spark.operators.joins import asof_join, range_join

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def ts(sec: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def _left(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def _right(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_asof_backward_picks_latest_prior_and_nulls_when_none(spark):
    left = _left(spark, [(1, 7, ts(100)), (2, 7, ts(10)), (3, 8, ts(50))])
    right = _right(
        spark,
        [(90, 7, ts(20), 1.0), (91, 7, ts(60), 2.0), (92, 9, ts(1), 9.0)],
    )
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, key="user_id", ts="ts", right_cols=("event_id", "value")
        ).collect()
    }
    assert out[1].event_id_r == 91 and out[1].value_r == 2.0  # latest <= 100
    assert out[2].event_id_r is None and out[2].ts_r is None  # nothing <= 10
    assert out[3].event_id_r is None  # user 8 has no right rows


def test_asof_equal_timestamp_is_a_match(spark):
    left = _left(spark, [(1, 7, ts(100))])
    right = _right(spark, [(90, 7, ts(100), 1.0)])
    out = asof_join(
        left, right, key="user_id", ts="ts", right_cols=("event_id",)
    ).collect()[0]
    assert out.event_id_r == 90  # <= semantics, matching ASOF JOIN


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _left(spark, [(1, 7, ts(1000)), (2, 7, ts(130))])
    right = _right(spark, [(90, 7, ts(100), 1.0)])
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, key="user_id", ts="ts",
            right_cols=("event_id",), tolerance_seconds=60,
        ).collect()
    }
    assert out[1].event_id_r is None  # 900s stale > 60s horizon
    assert out[2].event_id_r == 90  # 30s fresh


def test_asof_null_right_column_stays_with_its_row(spark):
    """A matched right row whose carried column is NULL must carry that
    NULL — not inherit an older row's value for just that field (the
    per-column last(ignorenulls) bug ADVICE r4 flagged)."""
    left = _left(spark, [(1, 7, ts(100))])
    right = _right(
        spark, [(90, 7, ts(20), 5.0), (91, 7, ts(60), None)]
    )
    out = asof_join(
        left, right, key="user_id", ts="ts", right_cols=("event_id", "value")
    ).collect()[0]
    assert out.event_id_r == 91
    assert out.ts_r == ts(60)
    assert out.value_r is None  # from row 91, not row 90's 5.0


def test_asof_plan_is_one_keyed_shuffle_no_cross_product(spark):
    from tests.test_plans import plan_of

    left = _left(spark, [(1, 7, ts(100))])
    right = _right(spark, [(90, 7, ts(20), 1.0)])
    p = plan_of(
        asof_join(left, right, key="user_id", ts="ts", right_cols=("event_id",))
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert len(re.findall(r"hashpartitioning\(user_id", p)) >= 1, p


def test_range_join_boundaries_and_cross_cell_dedup(spark):
    points = spark.createDataFrame(
        [(7, ts(0)), (7, ts(299)), (7, ts(300)), (7, ts(150))],
        "user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, ts(0), ts(300), 1)],
        "user_id long, start_ts timestamp, end_ts timestamp, iid long",
    )
    out = range_join(
        points, intervals, key="user_id", grid_seconds=300,
        interval_cols=("iid",),
    ).collect()
    hit_ts = sorted(r.ts for r in out)
    # [start, end): 0 and 299 and 150 in; 300 out; no duplicate pairs
    assert hit_ts == [ts(0), ts(150), ts(299)]
    assert len(out) == len(set((r.ts, r.iid_i) for r in out))


def test_range_join_rejects_interval_wider_than_grid(spark):
    points = spark.createDataFrame([(7, ts(10))], "user_id long, ts timestamp")
    intervals = spark.createDataFrame(
        [(7, ts(0), ts(2000), 1)],
        "user_id long, start_ts timestamp, end_ts timestamp, iid long",
    )
    with pytest.raises(Exception, match="wider than grid"):
        range_join(
            points, intervals, key="user_id", grid_seconds=300,
            interval_cols=("iid",),
        ).collect()


def test_asof_forward_picks_earliest_next_and_nulls_when_none(spark):
    left = _left(spark, [(1, 7, ts(100)), (2, 7, ts(300)), (3, 8, ts(50))])
    right = _right(
        spark,
        [(90, 7, ts(120), 1.0), (91, 7, ts(200), 2.0), (92, 9, ts(999), 9.0)],
    )
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, key="user_id", ts="ts",
            right_cols=("event_id", "value"), direction="forward",
        ).collect()
    }
    assert out[1].event_id_r == 90 and out[1].value_r == 1.0  # earliest >= 100
    assert out[2].event_id_r is None  # nothing >= 300
    assert out[3].event_id_r is None  # user 8 has no right rows


def test_asof_forward_equal_timestamp_is_a_match(spark):
    left = _left(spark, [(1, 7, ts(100))])
    right = _right(spark, [(90, 7, ts(100), 1.0)])
    out = asof_join(
        left, right, key="user_id", ts="ts",
        right_cols=("event_id",), direction="forward",
    ).collect()[0]
    assert out.event_id_r == 90


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """Cross-check every direction against pandas merge_asof on a
    randomized-but-fixed corpus — the reference implementation of the
    nearest/tie rules."""
    import pandas as pd

    lrows = [(i, 7 + (i % 3), ts(i * 17 % 400)) for i in range(24)]
    rrows = [
        (100 + i, 7 + (i % 3), ts(i * 23 % 400), float(i)) for i in range(18)
    ]
    left, right = _left(spark, lrows), _right(spark, rrows)
    lpd = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"])
    rpd = pd.DataFrame(rrows, columns=["event_id_r", "user_id", "ts_r", "value_r"])
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.event_id: (r.ts_r, r.value_r)
            for r in asof_join(
                left, right, key="user_id", ts="ts",
                right_cols=("event_id", "value"), direction=direction,
            ).collect()
        }
        want_df = pd.merge_asof(
            lpd.sort_values("ts"),
            rpd.sort_values("ts_r"),
            left_on="ts", right_on="ts_r",
            by="user_id", direction=direction,
        )
        for _, row in want_df.iterrows():
            w_ts = None if pd.isna(row.ts_r) else row.ts_r.to_pydatetime()
            w_val = None if pd.isna(row.value_r) else row.value_r
            assert got[row.event_id] == (w_ts, w_val), (direction, row.event_id)


def test_asof_nearest_tie_goes_backward(spark):
    left = _left(spark, [(1, 7, ts(100))])
    right = _right(spark, [(90, 7, ts(90), 1.0), (91, 7, ts(110), 2.0)])
    out = asof_join(
        left, right, key="user_id", ts="ts",
        right_cols=("event_id", "value"), direction="nearest",
    ).collect()[0]
    assert out.event_id_r == 90  # equidistant -> backward, pandas's rule


def test_interval_overlap_boundaries_and_rejection(spark):
    from webhookdb_spark.operators.joins import interval_overlap_join

    def iv(rows):
        return spark.createDataFrame(
            rows, "user_id long, start_ts timestamp, end_ts timestamp, iid long"
        )

    a = iv([(7, ts(0), ts(100), 1), (7, ts(500), ts(600), 2)])
    b = iv([
        (7, ts(99), ts(150), 10),   # overlaps iid 1 by one second
        (7, ts(100), ts(200), 11),  # touches iid 1 exactly at end: no overlap
        (7, ts(550), ts(560), 12),  # inside iid 2
        (8, ts(0), ts(100), 13),    # other key
    ])
    out = interval_overlap_join(
        a, b, key="user_id", grid_seconds=300,
        a_cols=("iid",), b_cols=("iid",),
    ).collect()
    pairs = sorted((r.iid_a, r.iid_b) for r in out)
    assert pairs == [(1, 10), (2, 12)]

    import pytest as _pt
    wide = iv([(7, ts(0), ts(2000), 9)])
    with _pt.raises(Exception, match="wider than grid"):
        interval_overlap_join(
            wide, b, key="user_id", grid_seconds=300, a_cols=("iid",)
        ).collect()


def test_interval_overlap_rejects_empty_and_inverted_intervals(spark):
    """An empty half-open span [t, t) overlaps nothing; before the
    guard, sequence(start, stop) with stop < start produced a
    DESCENDING 2-cell array that slipped the width bound and the
    residual filter reported the empty interval as overlapping any
    interval containing t."""
    from webhookdb_spark.operators.joins import interval_overlap_join
    import pytest as _pt

    def iv(rows):
        return spark.createDataFrame(
            rows, "user_id long, start_ts timestamp, end_ts timestamp, iid long"
        )

    b = iv([(7, ts(0), ts(200), 10)])
    for bad in ([(7, ts(50), ts(50), 1)], [(7, ts(60), ts(40), 2)]):
        with _pt.raises(Exception, match="empty or inverted"):
            interval_overlap_join(
                iv(bad), b, key="user_id", grid_seconds=300,
                a_cols=("iid",), b_cols=("iid",),
            ).collect()


def test_asof_nearest_subsecond_distances(spark):
    """Nearest must compare in microseconds: prior at t-0.4s vs next at
    t+0.6s picks the prior; whole-second truncation would see 0 vs 0
    (or 0 vs 1 depending on alignment) and could flip the pick."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 0, 0, 10)
    us = datetime.timedelta(microseconds=1)
    left = _left(spark, [(1, 7, base)])
    right = _right(
        spark,
        [
            (90, 7, base - 400_000 * us, 1.0),   # 0.4 s before
            (91, 7, base + 600_000 * us, 2.0),   # 0.6 s after
        ],
    )
    out = asof_join(
        left, right, key="user_id", ts="ts",
        right_cols=("event_id", "value"), direction="nearest",
    ).collect()[0]
    assert out.event_id_r == 90

    # mirrored: prior 0.9 s away, next 0.2 s away -> next wins, though
    # second-truncated distances are 0 for both (tie would go backward)
    right2 = _right(
        spark,
        [
            (92, 7, base - 900_000 * us, 1.0),
            (93, 7, base + 200_000 * us, 2.0),
        ],
    )
    out2 = asof_join(
        left, right2, key="user_id", ts="ts",
        right_cols=("event_id", "value"), direction="nearest",
    ).collect()[0]
    assert out2.event_id_r == 93


def test_fuzzy_link_blocking_semantics(spark):
    """Blocked edit-distance linkage: matches within the threshold that
    share a block are found; matches whose edits touch the block
    suffix are missed (the documented recall contract); short strings
    block on their whole text; the plan is an equi-join, never a
    cross product."""
    from webhookdb_spark.operators.joins import fuzzy_link

    left = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "ab"), (3, "acme corp ltd")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [
            (10, "jonathon smith"),   # 1 edit, mid-string -> found
            (11, "jonathan smitX"),   # 1 edit IN the suffix -> missed
            (12, "ab"),               # exact short-string match
            (13, "acme corpX ltd"),   # 1 edit, suffix shared -> found
            (14, "zzzzzzzzzzzzzz"),
        ],
        "id long, name string",
    )
    got = {(r.left_id, r.right_id): r.dist for r in fuzzy_link(
        left, right, "id", "id", "name", "name", max_dist=1
    ).collect()}
    assert got == {(1, 10): 1, (2, 12): 0, (3, 13): 1}

    plan = fuzzy_link(
        left, right, "id", "id", "name", "name", max_dist=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_fuzzy_link_adaptive_split_bounds_candidates(spark):
    """Cardinality-adaptive blocking (split_threshold): a hot suffix
    shared by the whole corpus would make fixed-length blocking score
    O(n^2) candidate pairs; the split pass re-keys oversize buckets to
    a longer suffix and must (a) cut candidate volume by orders of
    magnitude, (b) still find pairs that share the longer suffix, and
    (c) stay an equi-join. This is the permanent gate for the r7 scale
    finding (22.5M candidates at sf1 from 3-char suffix buckets)."""
    from webhookdb_spark.operators.joins import (
        fuzzy_link,
        fuzzy_link_candidates,
    )

    # 2,000 names, ALL ending "son" -> one 3-char bucket. The 6-char
    # suffix spreads them ~2 per bucket. Two planted distance-1 pairs
    # share their 6-char suffix, so the split must keep finding them.
    rows = [(i, f"name{i:04d}son") for i in range(1000)]
    rows += [(10_000 + i, f"nbme{i:04d}son") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, name string")

    args = (df, df, "id", "id", "name", "name", 1, 3)
    n_fixed = fuzzy_link_candidates(*args).count()
    n_split = fuzzy_link_candidates(*args, 64).count()
    # fixed: ~4M in-bucket pairs (x3 band explode); split: each
    # "NNNson" 6-char bucket holds exactly 2 rows
    assert n_fixed > 1_000_000
    assert n_split < 50_000
    # recall inside the longer suffix survives the split: every
    # nameNNNNson <-> nbmeNNNNson pair is distance 1 and shares its
    # 6-char suffix
    linked = fuzzy_link(*args, split_threshold=64)
    found = {
        (r.left_id, r.right_id)
        for r in linked.where("left_id < right_id").collect()
    }
    assert found == {(i, 10_000 + i) for i in range(1000)}

    plan = (
        fuzzy_link_candidates(*args, 64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_fuzzy_link_deletions_exact_recall(spark):
    """Deletion-neighborhood blocking must find EVERY pair within edit
    distance 1 — equality, substitution (incl. inside any suffix,
    where fixed-suffix blocking misses), insertion, deletion — and
    nothing at distance >= 2."""
    import itertools

    from webhookdb_spark.operators.joins import fuzzy_link_deletions

    names = [
        (1, "martha"), (2, "marsha"),    # substitution mid-string
        (3, "marthas"),                  # insertion at end
        (4, "artha"),                    # deletion at start
        (5, "martha"),                   # exact duplicate
        (6, "marthX"),                   # substitution in the SUFFIX
        (7, "zzzzzz"),                   # far away
        (8, "m"),                        # short string edge
        (9, ""),                         # empty string edge
        (10, "a"),                       # dist 1 from "" and "m"
    ]
    df = spark.createDataFrame(names, "id long, name string")
    got = {
        (r.left_id, r.right_id)
        for r in fuzzy_link_deletions(
            df, df, "id", "id", "name", "name"
        ).collect()
        if r.left_id < r.right_id
    }

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b)
        for (a, na), (b, nb) in itertools.combinations(names, 2)
        if lev(na, nb) <= 1
    }
    assert got == want


def test_golden_record_survivorship_rules(spark):
    """Canonical key = min; text = longest (ties lexicographically
    largest); categorical = majority (ties smallest); numeric = max;
    singleton entities pass through."""
    from webhookdb_spark.operators.joins import golden_records

    rows = [
        # entity 1: three members
        (1, 10, "ann", 5, 100.0),
        (1, 11, "anne", 5, 250.0),
        (1, 12, "anna", 7, 50.0),    # 'anne' and 'anna' same length
        # entity 2: singleton
        (2, 20, "bob", 9, -10.0),
    ]
    df = spark.createDataFrame(
        rows, "ent long, k long, name string, nat int, bal double")
    got = {r.ent: r for r in golden_records(
        df, "ent", "k", "name", "nat", "bal").collect()}
    g1 = got[1]
    assert g1.canonical_key == 10
    # longest: anne/anna tie at 4 chars -> lexicographically larger: anne
    assert g1.survived_text == "anne"
    # nations {5:2, 7:1} -> majority 5
    assert g1.survived_cat == 5
    assert g1.max_num == 250.0 and g1.n_members == 3 and g1.n_cat_distinct == 2
    g2 = got[2]
    assert (g2.canonical_key, g2.survived_text, g2.survived_cat,
            g2.max_num, g2.n_members) == (20, "bob", 9, -10.0, 1)
