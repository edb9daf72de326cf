import duckdb
import pytest
from pyspark.sql import functions as F

from miru_spark.operators import aggregates, analytics, latest, reco, trending
from miru_spark.query.filters import FieldFilter, Filter


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in ["events", "orders", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_distincts(events, ddb):
    flt = Filter("and", [FieldFilter("event_type", values=["click", "error"])])
    got = [r["value"] for r in aggregates.distincts(events, "event_type", flt=flt).collect()]
    exp = [
        r[0]
        for r in ddb.sql(
            "SELECT DISTINCT event_type FROM events WHERE event_type IN ('click','error') ORDER BY 1"
        ).fetchall()
    ]
    assert got == exp


def test_distinct_count_and_uniques(events, ddb):
    got = aggregates.distinct_count(events, "user_id").collect()[0]["n_distinct"]
    exp = ddb.sql("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert got == exp

    got_u = {
        (r["event_type"], r["n_distinct"])
        for r in aggregates.uniques(events, "user_id", "event_type").collect()
    }
    exp_u = set(
        ddb.sql(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert got_u == exp_u


def test_aggregate_counts(events, ddb):
    got = {
        (r["event_type"], r["n_collapsed"], r["latest_time"], r["oldest_time"], r["latest_id"])
        for r in aggregates.aggregate_counts(events, "event_type", "ts", "event_id").collect()
    }
    exp = set(
        ddb.sql(
            """WITH ranked AS (
                 SELECT *, row_number() OVER (
                   PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events)
               SELECT event_type, count(*), max(ts), min(ts),
                      max(CASE WHEN rn = 1 THEN event_id END)
               FROM ranked GROUP BY 1"""
        ).fetchall()
    )
    assert got == exp


def test_waveform_dense(events, ddb):
    lo, hi, nb = "2024-01-01", "2024-03-01", 12
    got = {(r["bucket"], r["n"]) for r in analytics.waveform(events, "ts", lo, hi, nb).collect()}
    exp = dict(
        ddb.sql(
            f"""SELECT least(greatest(floor((epoch(ts) - epoch(TIMESTAMP '{lo}'))
                       / ((epoch(TIMESTAMP '{hi}') - epoch(TIMESTAMP '{lo}')) / {nb})), 0), {nb - 1})::INT AS b,
                       count(*) FROM events
                WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}' GROUP BY 1"""
        ).fetchall()
    )
    assert len(got) == nb
    for b, n in got:
        assert n == exp.get(b, 0), b


def test_metrics_and_anomaly(events, ddb):
    got = {
        (r["bucket_ts"], round(r["sum_value"], 6), round(r["avg_value"], 6), r["n"])
        for r in analytics.metrics(events, "ts", "value", bucket="day").collect()
    }
    exp = {
        (t, round(s, 6), round(a, 6), n)
        for t, s, a, n in ddb.sql(
            "SELECT date_trunc('day', ts)::TIMESTAMP, sum(value), avg(value), count(*) FROM events GROUP BY 1"
        ).fetchall()
    }
    assert got == exp

    rows = analytics.anomaly(events, "ts", "value", bucket="day", sigma=1.5).collect()
    assert rows
    zs = [abs(r["zscore"]) for r in rows]
    flagged = [r for r in rows if r["is_anomaly"]]
    assert all(abs(r["zscore"]) > 1.5 for r in flagged)
    assert all(not r["is_anomaly"] for r in rows if abs(r["zscore"]) <= 1.5)
    assert max(zs) > 0


def test_stumptown_tail(events, ddb):
    flt = Filter("and", [FieldFilter("event_type", values=["error"])])
    got = [r["event_id"] for r in analytics.stumptown_tail(events, "ts", "event_id", 5, flt=flt).collect()]
    exp = [
        r[0]
        for r in ddb.sql(
            "SELECT event_id FROM events WHERE event_type='error' ORDER BY ts DESC, event_id DESC LIMIT 5"
        ).fetchall()
    ]
    assert got == exp


def test_trending(events, ddb):
    got = [
        (r["term"], r["recent_n"], r["total_n"])
        for r in trending.trending(events, "event_type", "ts", "2024-01-15", k=5).collect()
    ]
    exp = ddb.sql(
        """SELECT event_type, sum(CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) rn,
                  count(*) tn
           FROM events GROUP BY 1
           ORDER BY rn * 1.0 / tn DESC, rn DESC, event_type LIMIT 5"""
    ).fetchall()
    assert got == [(t, rn, tn) for t, rn, tn in exp]


def test_peakdet():
    series = [0, 1, 3, 1, 0, 2, 5, 2, 0]
    maxtab, mintab = trending.peakdet(series, 1.5)
    assert maxtab == [(2, 3), (6, 5)]
    assert mintab == [(4, 0)]


def test_waveform_peaks(spark):
    rows = [("a", b, float(n)) for b, n in enumerate([0, 1, 4, 1, 0, 3, 0])] + [
        ("b", b, float(n)) for b, n in enumerate([5, 0, 0, 0, 0, 0, 6])
    ]
    wf = spark.createDataFrame(rows, "term string, bucket int, n double")
    got = {
        (r["term"], r["peak_bucket"], r["peak_n"])
        for r in trending.waveform_peaks(wf, "term", "bucket", "n", 1.5).collect()
    }
    assert ("a", 2, 4.0) in got and ("a", 5, 3.0) in got
    assert ("b", 0, 5.0) in got


def test_latest_by(events, ddb):
    got = {
        (r["user_id"], r["event_id"])
        for r in latest.latest_by(events, "user_id", "ts", "event_id").select("user_id", "event_id").collect()
    }
    exp = set(
        ddb.sql(
            """SELECT user_id, event_id FROM (
                 SELECT user_id, event_id, row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events) WHERE rn = 1"""
        ).fetchall()
    )
    assert got == exp


def test_collaborative_filter(spark):
    rows = [
        ("u1", "i1"), ("u1", "i2"),
        ("u2", "i1"), ("u2", "i3"), ("u2", "i4"),
        ("u3", "i2"), ("u3", "i3"),
        ("u4", "i9"),
    ]
    df = spark.createDataFrame(rows, "user string, item string")
    got = [(r["item"], r["score"]) for r in reco.collaborative_filter(df, "user", "item", "u1", k=5).collect()]
    # contributors: u2 (shares i1 -> 1), u3 (shares i2 -> 1); candidates:
    # i3 (u2:1 + u3:1 = 2), i4 (u2:1)
    assert got == [("i3", 2), ("i4", 1)]


def test_filter_tree_pbutnotq(events, ddb):
    flt = Filter(
        "pButNotQ",
        [FieldFilter("event_type", values=["click", "view"]), FieldFilter("event_type", values=["view"])],
    )
    from miru_spark.query.filters import apply_filter

    got = apply_filter(events, flt).count()
    exp = ddb.sql(
        "SELECT count(*) FROM events WHERE event_type IN ('click','view') AND event_type NOT IN ('view')"
    ).fetchone()[0]
    assert got == exp


def test_filter_array_overlap(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c"]), (3, ["b", "c"])], "id int, tags array<string>"
    )
    from miru_spark.query.filters import apply_filter

    flt = Filter("and", [FieldFilter("tags", values=["b"])])
    assert {r["id"] for r in apply_filter(df, flt).collect()} == {1, 3}
    flt2 = Filter("and", [FieldFilter("tags", prefixes=["c"])])
    assert {r["id"] for r in apply_filter(df, flt2).collect()} == {2, 3}


def test_gather_features(events, ddb):
    got = {
        (r["user_id"], r["event_type"], r["n"], r["rank"])
        for r in aggregates.gather_features(events, "user_id", ["event_type"], k=2).collect()
    }
    exp = set(
        ddb.sql(
            """WITH c AS (SELECT user_id, event_type, count(*) n FROM events GROUP BY 1,2),
               r AS (SELECT *, row_number() OVER (
                       PARTITION BY user_id ORDER BY n DESC, event_type) rank FROM c)
               SELECT user_id, event_type, n, rank FROM r WHERE rank <= 2"""
        ).fetchall()
    )
    assert got == exp


def test_strut_score(events, ddb):
    model = {"event_type": {"purchase": 3.0, "click": 0.5}}
    got = [
        (r["event_id"], r["score"])
        for r in aggregates.strut_score(events, "event_id", model, k=15).collect()
    ]
    exp = ddb.sql(
        """SELECT event_id, (CASE event_type WHEN 'purchase' THEN 3.0
             WHEN 'click' THEN 0.5 ELSE 0.0 END)::DOUBLE
           FROM events ORDER BY 2 DESC, event_id LIMIT 15"""
    ).fetchall()
    assert got == [tuple(e) for e in exp]

    got_max = aggregates.strut_score(events, "event_id", model, strategy="max", k=5).collect()
    assert all(r["score"] == 3.0 for r in got_max)


def test_catwalk_fit(events, ddb):
    from pyspark.sql import functions as F

    got = [
        (r["feature"], r["value"], r["numerator"], r["denominator"], r["weight"])
        for r in aggregates.catwalk_fit(
            events, ["event_type"], F.col("value") > 10
        ).collect()
    ]
    exp = ddb.sql(
        """SELECT 'event_type' AS feature, event_type AS val,
                  sum(CASE WHEN value > 10 THEN 1 ELSE 0 END) AS numerator,
                  count(*) AS denominator,
                  sum(CASE WHEN value > 10 THEN 1 ELSE 0 END)::DOUBLE / count(*) AS weight
           FROM events GROUP BY 1, 2 ORDER BY val"""
    ).fetchall()
    assert got == [tuple(e) for e in exp]


def test_catwalk_fit_incremental_matches_full(events, tmp_path):
    """Watermarked delta fit + additive merge == one-shot full fit (the
    lastId-versioned Strut model cache, StrutModelScorer.java:208-238),
    and an unchanged corpus refresh is a pure cache read."""
    import json

    from pyspark.sql import functions as F

    cache = str(tmp_path / "catwalk_cache")
    cols = ["event_type", "user_id"]
    pos = F.col("value") > 10

    first = events.filter(F.col("event_id") <= 300)
    aggregates.catwalk_fit_incremental(first, cols, pos, cache, id_col="event_id")
    with open(cache + "/meta.json") as f:
        wm1 = json.load(f)["last_doc_id"]
    assert wm1 == first.agg(F.max("event_id")).collect()[0][0]

    inc = aggregates.catwalk_fit_incremental(
        events, cols, pos, cache, id_col="event_id").collect()
    full = aggregates.catwalk_fit(events, cols, pos).collect()
    assert sorted(map(tuple, inc)) == sorted(map(tuple, full))

    # idempotent refresh: watermark unchanged, model unchanged
    again = aggregates.catwalk_fit_incremental(
        events, cols, pos, cache, id_col="event_id").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, inc))


def test_catwalk_incremental_commit_protocol(events, tmp_path):
    """Crash-safety + guards of the watermarked model cache: a replayed
    refresh after a simulated pre-commit crash double-counts nothing
    (meta.json is the single commit point), an empty first fit returns an
    empty model instead of crashing, and a refresh under a different
    model config is rejected (unmergeable partial sums)."""
    import json
    import os
    import shutil

    import pytest
    from pyspark.sql import functions as F

    cols = ["event_type"]
    pos = F.col("value") > 10

    # empty first call: no model committed, empty model returned
    cache0 = str(tmp_path / "empty_cache")
    out = aggregates.catwalk_fit_incremental(
        events.filter(F.lit(False)), cols, pos, cache0, id_col="event_id")
    assert out.count() == 0
    assert not os.path.exists(cache0 + "/meta.json")

    cache = str(tmp_path / "crash_cache")
    first = events.filter(F.col("event_id") <= 300)
    aggregates.catwalk_fit_incremental(first, cols, pos, cache, id_col="event_id")
    with open(cache + "/meta.json") as f:
        meta1 = json.load(f)

    # simulate a crash AFTER the delta model parquet was written but
    # BEFORE the meta.json commit: an orphan epoch dir appears, meta
    # still points at epoch 1 — the replayed refresh must recompute the
    # same delta from the committed watermark and sweep the orphan
    orphan = cache + "/model-000099"
    shutil.copytree(cache + "/" + meta1["model_rel"], orphan)
    replayed = aggregates.catwalk_fit_incremental(
        events, cols, pos, cache, id_col="event_id").collect()
    full = aggregates.catwalk_fit(events, cols, pos).collect()
    assert sorted(map(tuple, replayed)) == sorted(map(tuple, full))
    assert not os.path.exists(orphan)

    # config drift: different positive predicate on the same cache raises
    with pytest.raises(ValueError, match="different"):
        aggregates.catwalk_fit_incremental(
            events.withColumn("event_id", F.col("event_id") + 10_000),
            cols, F.col("value") > 20, cache, id_col="event_id")


def test_catwalk_fit_feeds_strut(events):
    """fit -> weights_dict -> strut_score roundtrip is consistent."""
    from pyspark.sql import functions as F

    model_df = aggregates.catwalk_fit(events, ["event_type"], F.col("value") > 10)
    weights = aggregates.catwalk_weights(model_df)
    assert set(weights) == {"event_type"}
    assert all(0.0 <= w <= 1.0 for w in weights["event_type"].values())
    scored = aggregates.strut_score(events, "event_id", weights, k=5).collect()
    assert len(scored) == 5
    best = max(weights["event_type"].values())
    assert scored[0]["score"] == best


def test_filter_array_columns_authz(spark):
    """Multi-valued (authz-style) fields: any-element match + prefix,
    and pButNotQ over them — the reference's authz-bitmap OR."""
    from miru_spark.query.filters import apply_filter

    df = spark.createDataFrame(
        [
            (1, ["grp:eng", "site:a"], ["x", "y"]),
            (2, ["grp:sales"], ["y"]),
            (3, ["grp:eng", "grp:sales"], ["z"]),
            (4, [], ["x"]),
        ],
        "id long, authz array<string>, tags array<string>",
    )
    allowed = Filter(field_filters=[FieldFilter("authz", values=["grp:eng"])])
    assert {r["id"] for r in apply_filter(df, allowed).collect()} == {1, 3}

    pfx = Filter(field_filters=[FieldFilter("authz", prefixes=["site:"])])
    assert {r["id"] for r in apply_filter(df, pfx).collect()} == {1}

    p_not_q = Filter(
        op="pButNotQ",
        field_filters=[
            FieldFilter("tags", values=["x", "y"]),
            FieldFilter("authz", values=["grp:sales"]),
        ],
    )
    assert {r["id"] for r in apply_filter(df, p_not_q).collect()} == {1, 4}

    empty = Filter(field_filters=[FieldFilter("authz")])
    assert apply_filter(df, empty).count() == 0  # empty term set -> empty


def test_inbox_read_state(spark):
    """READ/UNREAD/MARK_ALL_READ fold: latest covering mark wins,
    default unread (MiruReadTracker.java:21-76 semantics)."""
    from datetime import datetime

    from miru_spark.operators import inbox

    t = lambda s: datetime.fromisoformat(f"2024-01-01 00:0{s}:00")
    ev = spark.createDataFrame(
        [(1, 10, t(1)), (1, 11, t(2)), (1, 12, t(3)), (2, 20, t(1)), (2, 21, t(2))],
        "user_id long, event_id long, ts timestamp",
    )
    marks = spark.createDataFrame(
        [
            # user 1: mark-all-read up to t2 (covers 10, 11), then explicit unread of 10
            (1, "mark_all_read", None, t(2), t(4)),
            (1, "unread", 10, None, t(5)),
            # user 2: targeted read of 21
            (2, "read", 21, None, t(4)),
        ],
        "user long, mark string, target_id long, up_to_ts timestamp, mark_ts timestamp",
    )
    state = {
        (r["user_id"], r["event_id"]): r["read"]
        for r in inbox.resolve_read_state(ev, marks).collect()
    }
    assert state == {
        (1, 10): False,  # unread mark came after mark_all_read
        (1, 11): True,   # covered by mark_all_read
        (1, 12): False,  # after the all-read watermark -> default unread
        (2, 20): False,  # never covered
        (2, 21): True,   # targeted read
    }
    counts = {
        r["user_id"]: r["n_unread"] for r in inbox.unread_counts(ev, marks).collect()
    }
    assert counts == {1: 2, 2: 1}


def test_inbox_tie_break_unread_wins(spark):
    from datetime import datetime

    from miru_spark.operators import inbox

    t0 = datetime.fromisoformat("2024-01-01 00:00:00")
    t9 = datetime.fromisoformat("2024-01-01 00:09:00")
    ev = spark.createDataFrame([(1, 10, t0)], "user_id long, event_id long, ts timestamp")
    marks = spark.createDataFrame(
        [(1, "read", 10, None, t9), (1, "unread", 10, None, t9)],
        "user long, mark string, target_id long, up_to_ts timestamp, mark_ts timestamp",
    )
    got = inbox.resolve_read_state(ev, marks).collect()[0]
    assert got["read"] is False


def test_waveforms_named_single_scan(events, ddb):
    """Multi-filter waveforms equal per-filter waveform calls, one scan."""
    from miru_spark.operators.analytics import waveform, waveforms

    named = {
        "clicks": Filter("and", [FieldFilter("event_type", values=["click"])]),
        "views": Filter("and", [FieldFilter("event_type", values=["view"])]),
    }
    lo, hi, nb = "2024-01-01", "2024-02-01", 10
    multi = {
        (r["name"], r["bucket"]): r["n"]
        for r in waveforms(events, "ts", lo, hi, nb, named).collect()
    }
    for nm, flt in named.items():
        single = {
            r["bucket"]: r["n"] for r in waveform(events, "ts", lo, hi, nb, flt=flt).collect()
        }
        assert {b: multi[(nm, b)] for b in single} == single
    # one scan of events in the plan
    plan = (
        waveforms(events, "ts", lo, hi, nb, named)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("events.parquet") == 1


def test_aggregate_counts_paging(events):
    full = aggregates.aggregate_counts(events, "user_id", "ts", "event_id", k=20).collect()
    p1 = aggregates.aggregate_counts(events, "user_id", "ts", "event_id", k=10).collect()
    p2 = aggregates.aggregate_counts(
        events, "user_id", "ts", "event_id", k=10, start_from=10
    ).collect()
    assert [r["user_id"] for r in p1 + p2] == [r["user_id"] for r in full]

    # keyset cursor (after=) returns the same page 2 as the numeric offset
    cur = (p1[-1]["latest_time"], p1[-1]["user_id"])
    p2k = aggregates.aggregate_counts(
        events, "user_id", "ts", "event_id", k=10, after=cur
    ).collect()
    assert p2k == p2

    # paging must not add an unpartitioned row_number window (single-task
    # global sort at scale): the only Window is the per-pivot latest-doc one
    plan = (
        aggregates.aggregate_counts(
            events, "user_id", "ts", "event_id", k=10, after=cur)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") == 1

    # offset past the end -> empty page, not an error
    assert aggregates.aggregate_counts(
        events, "user_id", "ts", "event_id", k=10, start_from=10**6
    ).collect() == []


def test_trending_strategies(events, ddb):
    """Slope/total/max strategies match a closed-form oracle; PEAKS
    counts Billauer peaks at the reference threshold."""
    import numpy as np

    from miru_spark.operators.trending import peakdet, trending_strategies

    lo, hi, nb = "2024-01-01", "2024-02-01", 20
    got = trending_strategies(events, "event_type", "ts", lo, hi, nb, k=10).collect()
    by_strategy = {}
    for r in got:
        by_strategy.setdefault(r["strategy"], []).append((r["term"], r["score"]))

    # python oracle waveforms
    rows = ddb.sql(
        f"""SELECT event_type, least(greatest(floor((epoch(ts) - epoch(TIMESTAMP '{lo}'))
               / ((epoch(TIMESTAMP '{hi}') - epoch(TIMESTAMP '{lo}')) / {nb})), 0), {nb - 1})::INT b,
               count(*) n
            FROM events WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}' GROUP BY 1, 2"""
    ).fetchall()
    waves = {}
    for term, b, n in rows:
        waves.setdefault(term, np.zeros(nb))[b] = n
    x = np.arange(nb)

    def slope(y):
        return float(((nb * (x * y).sum()) - x.sum() * y.sum()) / (nb * (x * x).sum() - x.sum() ** 2))

    exp_leader = sorted(((t, float(w.sum())) for t, w in waves.items()),
                        key=lambda p: (-p[1], p[0]))
    assert by_strategy["LEADER"] == exp_leader[: len(by_strategy["LEADER"])]
    exp_hp = sorted(((t, float(w.max())) for t, w in waves.items()), key=lambda p: (-p[1], p[0]))
    assert by_strategy["HIGHEST_PEAK"] == exp_hp[: len(by_strategy["HIGHEST_PEAK"])]
    for term, s in by_strategy["LINEAR_REGRESSION"]:
        assert abs(s - slope(waves[term])) < 1e-9, term

    bucket95 = float(np.percentile(np.maximum.reduce(list(waves.values())), 95))
    for term, s in by_strategy["PEAKS"]:
        w = waves[term]
        expected = len(peakdet(w.tolist(), w.max() / 6.0 + bucket95 / 100.0)[0])
        assert s == float(expected), term


def test_aggregate_counts_unread_flags(spark):
    """read_state wiring: per-pivot unread counts against resolved marks
    (the reference's unread flags, AggregateCounts.java:194-201)."""
    from datetime import datetime

    from miru_spark.operators import inbox

    t = lambda s: datetime.fromisoformat(f"2024-01-01 00:0{s}:00")
    ev = spark.createDataFrame(
        [(1, 10, t(1), "inbox"), (1, 11, t(2), "inbox"), (1, 12, t(3), "sent"),
         (2, 20, t(1), "inbox")],
        "user_id long, event_id long, ts timestamp, folder string",
    )
    marks = spark.createDataFrame(
        [(1, "read", 10, None, t(4))],
        "user long, mark string, target_id long, up_to_ts timestamp, mark_ts timestamp",
    )
    state = inbox.resolve_read_state(ev, marks)
    got = {
        r["folder"]: (r["n_collapsed"], r["n_unread"], r["any_unread"])
        for r in aggregates.aggregate_counts(
            ev, "folder", "ts", "event_id", read_state=state
        ).collect()
    }
    # inbox: 10 read, 11 unread, 20 unread -> 2 unread of 3
    assert got["inbox"] == (3, 2, True)
    assert got["sent"] == (1, 1, True)
