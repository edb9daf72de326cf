"""Plugin protocol (SURVEY §2.12): build_fragment/merge/is_done — the
MiruPlugin / Question.askLocal / AnswerMerger / AnswerEvaluator shape
(MiruPlugin.java, Question.java, MiruService.java:101-194)."""

from pyspark.sql import functions as F

from miru_spark.plugin import (
    DistinctCountPlugin,
    Plugin,
    TopKSearchPlugin,
    TrendingPlugin,
    solve,
)


def _slices(df, col, cuts):
    lo = None
    out = []
    for hi in [*cuts, None]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(col) >= lo)
        if hi is not None:
            cond = cond & (F.col(col) < hi)
        out.append(df.filter(cond))
        lo = hi
    return out


def test_protocol_conformance():
    assert isinstance(DistinctCountPlugin("x"), Plugin)
    assert isinstance(TrendingPlugin("t", "ts", "a", "b", 4), Plugin)
    assert isinstance(TopKSearchPlugin(5), Plugin)


def test_distinct_count_plugin_matches_global(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plugin = DistinctCountPlugin("user_id")
    got = solve(plugin, _slices(ev, "event_id", [100, 300])).collect()[0]["n_distinct"]
    want = ev.select(F.countDistinct("user_id")).collect()[0][0]
    assert got == want


def test_trending_plugin_matches_single_slice(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plugin = TrendingPlugin("event_type", "ts", "2024-01-01 00:00:00",
                            "2024-01-31 00:00:00", 10, k=5)
    sliced = solve(plugin, _slices(ev, "event_id", [200])).collect()
    whole = solve(plugin, [ev]).collect()
    assert [(r["term"], r["total"], r["rank"]) for r in sliced] == [
        (r["term"], r["total"], r["rank"]) for r in whole]


def test_topk_plugin_merge_and_early_stop(spark):
    rows = [(i, float(100 - i)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    plugin = TopKSearchPlugin(5)
    out = solve(plugin, _slices(df, "doc_id", [10, 20]), check_done_each=True).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == [
        (i, float(100 - i)) for i in range(5)]
    # evaluator: first slice already holds k results -> done
    assert plugin.is_done(plugin.build_fragment(df.filter(F.col("doc_id") < 10)))
