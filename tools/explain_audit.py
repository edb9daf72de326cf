"""Physical-plan audit: assert the plans we want at 100 TB scale.

Checks, per headline query:
- term predicates reach the parquet scan (PushedFilters on postings);
- small sides broadcast (BroadcastHashJoin / BroadcastExchange), big
  sides never build-side of a shuffle join;
- scans are columnar (Batched: true) and aggregates have map-side
  partial stages (AQE hides codegen wrappers until execution, so those
  two markers stand in for WholeStageCodegen);
- no accidental CartesianProduct (the ANN crossJoin against a broadcast
  query batch compiles to BroadcastNestedLoopJoin — intended).

Usage: python tools/explain_audit.py [sf_dir]
Exits non-zero if a MUST marker is missing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    import __spark_entry__ as E
    from miru_spark.session import get_spark

    spark = get_spark("explain_audit", cores=8, shuffle_partitions=8)
    failures = []

    def check(name, df, must=(), must_not=()):
        p = plan_of(df)
        for m in must:
            if m not in p:
                failures.append(f"{name}: missing {m}")
        for m in must_not:
            if m in p:
                failures.append(f"{name}: unexpected {m}")
        print(f"-- {name}: "
              + ", ".join(f"{m}={'Y' if m in p else 'N'}" for m in set(must) | set(must_not)))

    r = E._reader(spark, sf_dir)

    # postings term lookup: pushdown is what makes query latency
    # independent of index size
    check(
        "postings_term_scan",
        r.blocks(terms=["spark", "query"]),
        must=["PushedFilters", "Batched: true"],
    )

    from miru_spark.query.bm25 import search

    # all-text-term boolean queries must take the FUSED single-pass plan:
    # the coverage filter (array_contains over leaf bits) is its marker,
    # and the per-leaf candidate SortMergeJoins of the general plan are gone
    check(
        "bm25_index_search",
        search(r, "spark AND query", k=10),
        must=["BroadcastHashJoin", "PushedFilters", "TakeOrderedAndProject",
              "array_contains"],
        must_not=["CartesianProduct"],
    )

    # positional phrase: term filter must reach the positions parquet
    # scan, and the whole plan stays index-side (no text relation)
    check(
        "bm25_phrase_positional",
        E.q_bm25_phrase_positional(spark, sf_dir),
        must=["PushedFilters", "TakeOrderedAndProject"],
        must_not=["CartesianProduct"],
    )

    # batch serving with NON-FLAT shapes (round 5): phrase + fielded +
    # NOT queries must share the flat queries' postings decode — the
    # whole batch plan reads the postings relation ONCE (the text-plan
    # phrase verify runs over coverage-passed candidates, not postings)
    from miru_spark.query.bm25 import search_batch

    tdf = E._read(spark, sf_dir, "documents")

    def _decodes(p):
        # the postings DECODE kernel is the expensive pass; raw FileScan
        # line counts mislead here because Spark's dynamic-partition-
        # pruning subquery on the doclens sidecar REPRINTS the postings
        # subtree (SubqueryAdaptiveBroadcast with broadcast reuse — no
        # second read at runtime), so count the decode kernels instead
        return p.count("MapInPandas _decode")

    # (1) flat + fielded + NOT batch: all three shapes fold into the
    # single coverage aggregation over ONE shared postings decode
    plan_mix = plan_of(search_batch(
        r, {"a": "spark AND query", "f": "lang:en AND spark",
            "n": "spark NOT merge"}, k=10, block_prune=False))
    n_mix = _decodes(plan_mix)
    # (2) adding a PHRASE must not add a decode either: the text verify
    # runs over the coverage-passed candidates (the coverage subtree is
    # referenced twice; its exchange is AQE-reused at runtime), and the
    # positions plan reads the positions sidecar, never postings
    plan_ph = plan_of(search_batch(
        r, {"a": "spark AND query", "p": 'data AND "table hash"'},
        k=10, text_df=tdf, block_prune=False))
    n_ph = _decodes(plan_ph)
    print(f"-- bm25_batch_shared: decodes mix={n_mix} phrase={n_ph} "
          f"(want 1 each), CartesianProduct="
          f"{'Y' if 'CartesianProduct' in plan_mix + plan_ph else 'N'}")
    if n_mix != 1:
        failures.append(
            f"bm25_batch_shared: {n_mix} postings decodes in "
            "flat+fielded+NOT batch (want 1)")
    if n_ph != 1:
        failures.append(
            f"bm25_batch_shared: {n_ph} postings decodes in phrase "
            "batch (want 1)")
    if "CartesianProduct" in plan_mix + plan_ph:
        failures.append("bm25_batch_shared: CartesianProduct")

    check(
        "q1_pricing",
        E.q_q1_pricing(spark, sf_dir),
        must=["Batched: true", "PushedFilters", "partial_"],
        must_not=["CartesianProduct"],
    )

    check(
        "reco_cf",
        E.q_reco_cf(spark, sf_dir),
        must=["BroadcastHashJoin"],
        must_not=["CartesianProduct"],
    )

    check(
        "ann_cosine_topk",
        E.q_ann_cosine_topk(spark, sf_dir),
        must=["BroadcastNestedLoopJoin"],  # corpus scan x broadcast query batch
        must_not=["CartesianProduct", "SortMergeJoin"],
    )

    check(
        "ngram_jaccard",
        E.q_ngram_jaccard(spark, sf_dir),
        must=["Batched: true", "partial_"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # marks side must broadcast (a per-user trickle vs the event stream):
    # the user equality is the hash key and the coverage condition rides
    # along as an extra join predicate — BroadcastHashJoin, never a
    # shuffle of the event stream for the join itself
    check(
        "inbox_unread",
        E.q_inbox_unread(spark, sf_dir),
        must=["BroadcastHashJoin", "partial_"],
        must_not=["CartesianProduct", "SortMergeJoin"],
    )

    # model fit must be ONE scan of events (melt via explode, no union
    # of per-feature scans) with map-side partial aggregation
    plan = plan_of(E.q_catwalk_model(spark, sf_dir))
    n_scans = plan.count("events.parquet")
    if n_scans != 1:
        failures.append(f"catwalk_model: expected 1 events scan, found {n_scans}")
    print(f"-- catwalk_model: single_scan={'Y' if n_scans == 1 else 'N'}, "
          f"partial_={'Y' if 'partial_' in plan else 'N'}")
    if "partial_" not in plan:
        failures.append("catwalk_model: missing partial_ aggregation")

    # phrase plan: pushed term filters feed the posting AND; the verify
    # join against the source table must hash-join (broadcast or shuffle,
    # keyed on doc_id), never a nested-loop over the corpus
    check(
        "bm25_phrase",
        E.q_bm25_phrase(spark, sf_dir),
        must=["PushedFilters", "TakeOrderedAndProject"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # per-domain cap + hash sample: columnar scans, no corpus-wide
    # collect; the cap's window sort partitions by key (bounded state)
    check(
        "domain_cap",
        E.q_domain_cap(spark, sf_dir),
        must=["Batched: true"],
        must_not=["CartesianProduct"],
    )

    from miru_spark.pipeline.sampling import sample_by_hash

    check(
        "sample_hash",
        sample_by_hash(E._read(spark, sf_dir, "documents"), "doc_id", 0.25, seed=7),
        must=["Batched: true"],
        must_not=["CartesianProduct", "Exchange"],  # pure filter: NO shuffle
    )

    # connected components: the star rounds are bounded joins/aggs — the
    # final plan (post-iteration) must stay hash-joined, no cartesian
    check(
        "dedup_components",
        E.q_dedup_components(spark, sf_dir),
        must=["Batched: true"],
        must_not=["CartesianProduct"],
    )

    # sequence packing: exactly ONE exchange (the bucket groupBy);
    # the greedy pack itself is bucket-local (FlatMapGroupsInPandas)
    plan = plan_of(E.q_pack_sequences(spark, sf_dir))
    n_ex = plan.count("Exchange")
    print(f"-- pack_sequences: exchanges={n_ex}, "
          f"grouped_pandas={'Y' if 'FlatMapGroupsInPandas' in plan else 'N'}")
    if n_ex != 1:
        failures.append(f"pack_sequences: expected 1 Exchange, found {n_ex}")
    if "FlatMapGroupsInPandas" not in plan:
        failures.append("pack_sequences: missing FlatMapGroupsInPandas")
    if "CartesianProduct" in plan:
        failures.append("pack_sequences: unexpected CartesianProduct")

    from miru_spark.query.bm25 import search_wand

    check(
        "bm25_wand_or",
        search_wand(r, ["spark", "query"], k=10, mode="or"),
        must=["PushedFilters", "TakeOrderedAndProject"],
        must_not=["CartesianProduct"],
    )

    print()
    if failures:
        print("PLAN AUDIT FAILURES:")
        for f in failures:
            print("  " + f)
        return 1
    print("PLAN AUDIT OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
