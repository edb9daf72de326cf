"""CLI smoke tests: the spark-submit entry points (§2.3 query sinks —
the reference's query endpoints return JSON answers the same way,
``FullTextInjectable`` -> HTTP JSON). Run in-process against the shared
session (get_spark's getOrCreate picks it up) with patched argv."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cli_index(spark, tmp_path_factory):
    import scripts.build_index as b

    out = str(tmp_path_factory.mktemp("cli") / "idx")
    argv = [
        "build_index.py", "--input", os.path.join(SF, "documents.parquet"),
        "--output", out, "--shards", "2", "--stored-cols", "lang,source",
        "--cores", "8", "--overwrite",
    ]
    old = sys.argv
    sys.argv = argv
    try:
        b.main()
    finally:
        sys.argv = old
    return out


def test_build_cli_writes_valid_index(spark, cli_index):
    from miru_spark.index.reader import IndexReader

    r = IndexReader(spark, cli_index)
    assert r.stats["n_docs"] == 500
    assert r.stats["n_terms"] > 0


@pytest.mark.parametrize("extra", [[], ["--wand"], ["--wand", "--or"]])
def test_query_cli_json_sink(spark, cli_index, capsys, extra):
    import scripts.query_index as q

    # the WAND path takes a FLAT term list (tokenized verbatim); the
    # parsed-grammar path gets the boolean form — same AND semantics
    qstr = "spark join" if extra else "spark AND join"
    argv = ["query_index.py", "--index", cli_index,
            "--query", qstr, "-k", "5", "--cores", "8", *extra]
    old = sys.argv
    sys.argv = argv
    try:
        q.main()
    finally:
        sys.argv = old
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["query"] == qstr
    assert len(out["hits"]) == 5
    # the JSON sink must agree with the library call
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search

    if "--or" in extra:
        direct = search(IndexReader(spark, cli_index), "spark OR join", k=5).collect()
    else:
        direct = search(IndexReader(spark, cli_index), "spark AND join", k=5).collect()
    assert [h["doc_id"] for h in out["hits"]] == [r["doc_id"] for r in direct]


def test_query_cli_keyset_paging(spark, cli_index, capsys):
    import scripts.query_index as q

    def run(argv):
        old = sys.argv
        sys.argv = ["query_index.py", *argv]
        try:
            q.main()
        finally:
            sys.argv = old
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    p1 = run(["--index", cli_index, "--query", "spark", "-k", "3", "--cores", "8"])
    last = p1["hits"][-1]
    p2 = run(["--index", cli_index, "--query", "spark", "-k", "3", "--cores", "8",
              "--after", f"{last['score']},{last['doc_id']}"])
    ids1 = {h["doc_id"] for h in p1["hits"]}
    ids2 = {h["doc_id"] for h in p2["hits"]}
    assert ids1.isdisjoint(ids2) and len(ids2) == 3


def test_compact_cli(spark, cli_index, capsys):
    import json as _json

    import scripts.compact_index as c

    old = sys.argv
    sys.argv = ["compact_index.py", "--index", cli_index,
                "--target-docs", "1000", "--cores", "8"]
    try:
        c.main()
    finally:
        sys.argv = old
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["shards"]["n_shards"] == 1  # 2 shards fit one 1000-doc target
    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search

    assert len(search(IndexReader(spark, cli_index), "spark", k=5).collect()) == 5


def test_load_corpus_bare_relative_dir_is_a_path(spark, tmp_path, monkeypatch):
    """A separator-free parquet DIRECTORY name that exists on disk must
    resolve as a path (pre-existing script behavior), not a catalog
    table — existence disambiguates."""
    from miru_spark.sources import is_table_identifier, load_corpus

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "pages_dir"))
    monkeypatch.chdir(tmp_path)
    assert not is_table_identifier("pages_dir")
    assert load_corpus(spark, "pages_dir").count() == 1


def test_load_corpus_resolution(spark, tmp_path):
    """Path sources read parquet; table identifiers resolve through the
    session catalog (the Iceberg deployment path — snapshot options pass
    through as catalog read options); snapshot options on a raw parquet
    path fail loudly."""
    import pytest as _pytest

    from miru_spark.sources import is_table_identifier, load_corpus

    df = spark.createDataFrame([(1, "a b"), (2, "c d")], "doc_id long, text string")
    pq = str(tmp_path / "pages.parquet")
    df.write.mode("overwrite").parquet(pq)

    assert load_corpus(spark, pq).count() == 2
    df.createOrReplaceTempView("pages_src_test")
    assert load_corpus(spark, "pages_src_test").count() == 2
    assert is_table_identifier("wh.db.pages")
    assert not is_table_identifier("/data/pages.parquet")
    assert not is_table_identifier("pages.parquet")
    with _pytest.raises(ValueError, match="catalog table"):
        load_corpus(spark, pq, snapshot_id=123)
    with _pytest.raises(ValueError, match="unknown corpus format"):
        load_corpus(spark, pq, fmt="orc")


def test_query_cli_batch_file(spark, cli_index, capsys, tmp_path):
    """--queries-file: one shared-scan job answers every query; the JSON
    sink agrees with per-query search() for each entry."""
    import scripts.query_index as q

    qf = tmp_path / "queries.json"
    qf.write_text(json.dumps({"a": "spark AND join", "b": "scan OR merge"}))
    old = sys.argv
    sys.argv = ["query_index.py", "--index", cli_index,
                "--queries-file", str(qf), "-k", "4", "--cores", "8"]
    try:
        q.main()
    finally:
        sys.argv = old
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["queries"] == 2 and set(out["hits"]) == {"a", "b"}

    from miru_spark.index.reader import IndexReader
    from miru_spark.query.bm25 import search

    r = IndexReader(spark, cli_index)
    for qid, qs in [("a", "spark AND join"), ("b", "scan OR merge")]:
        direct = search(r, qs, k=4).collect()
        assert [h["doc_id"] for h in out["hits"][qid]] == \
            [x["doc_id"] for x in direct]


def test_query_cli_batch_lines(spark, cli_index, capsys, tmp_path):
    import scripts.query_index as q

    qf = tmp_path / "queries.txt"
    qf.write_text("spark AND join\nscan OR merge\n")
    old = sys.argv
    sys.argv = ["query_index.py", "--index", cli_index,
                "--queries-file", str(qf), "-k", "3", "--cores", "8"]
    try:
        q.main()
    finally:
        sys.argv = old
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["hits"]) == {"q0000", "q0001"}
    assert all(len(v) == 3 for v in out["hits"].values())


def test_query_cli_batch_json_array_and_flag_conflict(spark, cli_index, capsys, tmp_path):
    import scripts.query_index as q

    qf = tmp_path / "queries_arr.json"
    qf.write_text(json.dumps(["spark AND join", "scan OR merge"]))
    old = sys.argv
    sys.argv = ["query_index.py", "--index", cli_index,
                "--queries-file", str(qf), "-k", "2", "--cores", "8"]
    try:
        q.main()
    finally:
        sys.argv = old
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["hits"]) == {"q0000", "q0001"}

    # --wand/--or/--after conflict with batch mode: loud argparse error
    sys.argv = ["query_index.py", "--index", cli_index,
                "--queries-file", str(qf), "--wand", "--cores", "8"]
    try:
        with pytest.raises(SystemExit):
            q.main()
    finally:
        sys.argv = old
    capsys.readouterr()


def test_query_cli_gather_single_and_batch(spark, cli_index, capsys, tmp_path):
    """--gather joins stored doc-store columns onto the top-k in both
    single and batch mode (lazy gather: join after the limit)."""
    import scripts.query_index as q

    def run(argv):
        old = sys.argv
        sys.argv = ["query_index.py", *argv]
        try:
            q.main()
        finally:
            sys.argv = old
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = run(["--index", cli_index, "--query", "spark AND join",
               "-k", "3", "--cores", "8", "--gather", "lang,source"])
    assert all("lang" in h and "source" in h for h in out["hits"])

    qf = tmp_path / "qb.txt"
    qf.write_text("spark AND join\n")
    outb = run(["--index", cli_index, "--queries-file", str(qf),
                "-k", "3", "--cores", "8", "--gather", "lang"])
    hits = outb["hits"]["q0000"]
    assert len(hits) == 3 and all("lang" in h for h in hits)
    # gather never perturbs the ranking
    assert [h["doc_id"] for h in hits] == [h["doc_id"] for h in out["hits"]]
