import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from miru_spark.session import get_spark

    s = get_spark("miru_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ["SPARK_GRAFT_SF_DIR"]


@pytest.fixture(scope="session")
def corpus(spark):
    """Deterministic synthetic web-page corpus (FIXTURES.md §1 shape):
    (url, warc_ts, html, text, lang, doc_id). Zipfian vocab with a
    guaranteed head term to exercise skew handling."""
    import numpy as np

    rng = np.random.default_rng(7)
    vocab = [f"w{i:05d}" for i in range(200)]
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    probs /= probs.sum()
    rows = []
    n = 600
    for i in range(n):
        length = max(5, int(rng.lognormal(3.0, 0.6)))
        words = list(rng.choice(vocab, size=length, p=probs))
        if rng.random() < 0.6:
            words.insert(int(rng.integers(0, len(words))), "the0")  # head term
        text = " ".join(words)
        lang = "en" if rng.random() > 0.05 else ("de" if rng.random() < 0.5 else "fr")
        rows.append(
            (
                f"https://host{i % 7}.example/p/{i:06d}",
                f"2024-03-{(i % 28) + 1:02d} 12:00:00",
                ("<html><body>" + text + "</body></html>").encode(),
                text,
                lang,
                i,
            )
        )
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary, text string, lang string, doc_id long"
    )
    from pyspark.sql import functions as F

    return df.withColumn("warc_ts", F.to_timestamp("warc_ts")).cache()


@pytest.fixture(scope="session")
def built_index(spark, corpus, tmp_path_factory):
    from miru_spark.index.builder import build_index

    out = str(tmp_path_factory.mktemp("index") / "idx")
    meta = build_index(
        spark, corpus, out,
        stored_cols=["url", "lang", "warc_ts"],
        n_shards=3, block_bits=7,  # tiny blocks (128 docs) to exercise multi-block paths
        overwrite=True,
    )
    return meta
