import numpy as np
import pytest
from pyspark.sql import functions as F

from miru_spark.pipeline import ann, dedup, multimodal, text


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
        (3, "completely different text about spark and distributed joins"),
        (4, "Spark and distributed joins, a completely different text about!"),  # norm-near of 3
        (5, "the quick brown fox jumps over the lazy dog again and again "),  # ws variant of 0
        (6, "singleton document with unique content entirely its own"),
    ]
    return spark.createDataFrame(base, "id long, text string")


def test_exact_dedup(docs_with_dups):
    groups = dedup.exact_duplicate_groups(docs_with_dups, "id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["ids"] == [0, 1]
    kept = sorted(r["id"] for r in dedup.exact_dedup(docs_with_dups, "id", "text").collect())
    assert kept == [0, 2, 3, 4, 5, 6]


def _py_shingles(txt, n=3):
    from miru_spark.analysis.tokenizer import tokenize

    toks = tokenize(txt)
    if len(toks) >= n:
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    return {" ".join(toks)} if toks else set()


def test_ngram_jaccard_pairs(docs_with_dups):
    rows = docs_with_dups.collect()
    texts = {r["id"]: r["text"] for r in rows}
    exp = []
    ids = sorted(texts)
    for i in ids:
        for j in ids:
            if i < j:
                a, b = _py_shingles(texts[i]), _py_shingles(texts[j])
                jac = len(a & b) / len(a | b)
                if jac >= 0.5:
                    exp.append((i, j, round(jac, 6)))
    got = [
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            docs_with_dups, "id", "text", threshold=0.5
        ).collect()
    ]
    assert got == sorted(exp)
    assert (0, 1) in {(a, b) for a, b, _ in got}
    assert (0, 5) in {(a, b) for a, b, _ in got}


def test_ngram_jaccard_prefix_filter_matches_naive(spark):
    """AllPairs prefix filtering is exact: identical output to the naive
    inverted-index self-join on the real documents table, including the
    hot-shingle cap interaction and lower thresholds (more pairs)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for thr, cap in [(0.8, 100), (0.5, 100), (0.8, None)]:
        fast = dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=thr, max_shingle_df=cap,
            prefix_filter=True,
        ).collect()
        naive = dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=thr, max_shingle_df=cap,
            prefix_filter=False,
        ).collect()
        assert [tuple(r) for r in fast] == [tuple(r) for r in naive], (thr, cap)


def test_ngram_jaccard_release_contract(docs_with_dups):
    """release() unpersists the ACTUALLY-persisted relations (the base
    shingle relation even when the hot-shingle prune rebinds on top of
    it) — no pinned executor storage after the caller is done."""
    for cap in (None, 100):
        ret = dedup.ngram_jaccard_pairs(
            docs_with_dups, "id", "text", threshold=0.5, max_shingle_df=cap
        )
        ret.collect()
        for c in ret._miru_cached:
            assert c.storageLevel.useMemory or c.storageLevel.useDisk, cap
        ret.release()
        for c in ret._miru_cached:
            assert not (c.storageLevel.useMemory or c.storageLevel.useDisk), cap


def test_ngram_jaccard_degenerate_threshold_empty(docs_with_dups):
    """threshold > 1.0 drives the AllPairs prefix length negative; the
    clamped slice returns the rank-filter semantics (empty), not an
    error."""
    assert dedup.ngram_jaccard_pairs(
        docs_with_dups, "id", "text", threshold=1.5
    ).collect() == []


def test_minhash_lsh_finds_near_dups(docs_with_dups):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs_with_dups, "id", "text", num_perm=64, bands=16, verify_threshold=0.4
        ).collect()
    }
    assert (0, 1) in pairs  # exact dups always collide
    assert (0, 5) in pairs
    assert (3, 6) not in pairs and (0, 3) not in pairs  # unrelated stay apart


def test_minhash_signature_deterministic(docs_with_dups):
    s1 = {r["id"]: r["signature"] for r in dedup.minhash_signatures(docs_with_dups, "id", "text").collect()}
    s2 = {r["id"]: r["signature"] for r in dedup.minhash_signatures(docs_with_dups, "id", "text").collect()}
    assert s1 == s2
    assert s1[0] == s1[1]  # identical text -> identical signature


def test_simhash_pairs(docs_with_dups):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(docs_with_dups, "id", "text", max_hamming=10).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert pairs.get((0, 5)) == 0  # whitespace variant -> same tokens
    assert (0, 2) in pairs  # one-word swap -> small hamming
    assert (0, 6) not in pairs


def test_ann_cosine_topk_vs_numpy(spark, sf_dir):
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann.cosine_topk(vecs, queries, k=5).collect()

    pdf = vecs.toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in range(3):
        qvec = mat_n[ids == qid][0]
        cos = mat_n @ qvec
        order = sorted(zip(-cos, ids), key=lambda t: (t[0], t[1]))
        exp = [(int(i), round(float(-c), 6)) for c, i in order if i != qid][:5]
        g = [(r["vec_id"], r["cos"]) for r in got if r["query_id"] == qid]
        assert [i for i, _ in g] == [i for i, _ in exp]
        for (gi, gc), (ei, ec) in zip(g, exp):
            assert abs(gc - ec) < 1e-4


def test_ann_lsh_recall(spark, sf_dir):
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dim = len(vecs.select("embedding").first()["embedding"])
    exact = ann.cosine_topk(vecs, queries, k=10).collect()
    # near-random vectors have low-cosine neighbors: use shallow buckets
    # (4 bits) and more tables so per-neighbor collision prob stays high
    approx = ann.lsh_topk(vecs, queries, k=10, dim=dim, n_bits=4, n_tables=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q]) for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # bucketed path finds most true neighbors


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today quite swiftly"),
            (1, "x"),
            (2, "!!! ??? ### $$$"),
        ],
        "id long, text string",
    )
    stats = {r["id"]: r for r in text.token_stats(df, "id", "text").collect()}
    assert stats[0]["n_tokens"] == 12
    assert stats[0]["bpe_tokens"] == sum(-(-len(w) // 4) for w in
        "the quick brown fox jumps over the lazy dog today quite swiftly".split())
    assert stats[1]["n_tokens"] == 1
    assert stats[2]["n_tokens"] == 0

    q = {r["id"]: r["quality"] for r in text.quality_score(df, "id", "text").collect()}
    assert q[0] == 1.0
    assert q[1] < 1.0
    assert q[2] <= 0.25


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog went to the market and it was good for them"),
            (1, "der hund und die katze sind nicht auf der wiese mit dem ball"),
            (2, "le chat et le chien sont dans la maison pour la nuit"),
            (3, "zzz qqq www"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lang_guess"] for r in text.lang_id(df, "id", "text").collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "und"}


def test_fingerprints(docs_with_dups):
    fp = {r["id"]: (r["digest"], r["norm_digest"]) for r in text.fingerprint(docs_with_dups, "id", "text").collect()}
    assert fp[0][0] == fp[1][0]  # exact dup
    assert fp[0][0] != fp[5][0]  # trailing whitespace differs
    assert fp[0][1] == fp[5][1]  # ...but normalized fingerprint matches
    w = text.winnow_fingerprints(docs_with_dups, "id", "text", k=3, window=2)
    rows = w.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], set()).add(r["fp"])
    assert by_id[0] == by_id[1]
    assert len(by_id[0] & by_id[2]) > 0  # near-dup shares fingerprints


def test_multimodal_meta_and_decode(spark):
    rows = [
        (0, b"\xff\xd8\xff" + b"a" * 100),
        (1, b"\x89PNG\r\n\x1a\n" + b"b" * 50),
        (2, b"plain bytes payload"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, data binary")
    meta = {r["id"]: r for r in multimodal.binary_meta(df, "id", "data").collect()}
    assert meta[0]["sniffed_type"] == "image/jpeg"
    assert meta[1]["sniffed_type"] == "image/png"
    assert meta[2]["sniffed_type"] == "application/octet-stream"
    assert meta[3]["n_bytes"] == 0
    assert meta[0]["n_bytes"] == 103
    import hashlib

    assert meta[2]["sha1"] == hashlib.sha1(b"plain bytes payload").hexdigest()

    with pytest.raises(NotImplementedError):
        multimodal.decode_features(df, "id", "data")

    feats = {r["id"]: r["features"] for r in multimodal.decode_features(df, "id", "data", decoder="fake").collect()}
    assert len(feats[0]) == 8
    assert abs(sum(feats[0]) - 1.0) < 1e-9
    assert feats[3] == [0.0] * 8

    frames = multimodal.frame_sample(df, "id", "data", frame_bytes=32, every=2).collect()
    f0 = [r for r in frames if r["id"] == 0]
    assert [r["frame_no"] for r in f0] == [0, 2]
    assert f0[0]["frame"] == bytes((b"\xff\xd8\xff" + b"a" * 100)[:32])


def test_multimodal_auto_decoder(spark):
    """decoder='auto' registers the real Pillow path when the library is
    importable and resolves to the loud stub otherwise — the stub stays
    honest, an environment WITH codecs gets real decoding free."""
    try:
        import PIL.Image  # noqa: F401
        have_pillow = True
    except ImportError:
        have_pillow = False
    assert multimodal._resolve_decoder("auto") == (
        "pillow" if have_pillow else "stub")
    assert multimodal._resolve_decoder("fake") == "fake"
    df = spark.createDataFrame([(0, b"not an image")], "id long, data binary")
    if not have_pillow:
        with pytest.raises(NotImplementedError):
            multimodal.decode_features(df, "id", "data", decoder="auto")
        with pytest.raises(ImportError):
            multimodal.decode_features(df, "id", "data", decoder="pillow")
    else:
        # undecodable payload -> zero vector, not a crash
        feats = multimodal.decode_features(
            df, "id", "data", decoder="auto").collect()
        assert feats[0]["features"] == [0.0] * 8


def test_connected_components_topologies(spark):
    """Chain (worst case for label propagation), clique, singleton pair,
    and an isolated edge — all must resolve to min-id components within
    the round budget."""
    from miru_spark.pipeline.dedup import connected_components

    edges = [
        # a 10-node chain 100-101-...-109
        *[(100 + i, 100 + i + 1) for i in range(9)],
        # a 4-clique
        (200, 201), (200, 202), (200, 203), (201, 202), (201, 203), (202, 203),
        # one isolated pair, reversed order
        (301, 300),
        # self-loop must be ignored
        (400, 400),
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    for i in range(10):
        assert got[100 + i] == 100
    for i in range(4):
        assert got[200 + i] == 200
    assert got[300] == 300 and got[301] == 300
    assert 400 not in got  # self-loops contribute no component


def test_dedup_components_and_canonical(spark):
    """Duplicated texts cluster; unique docs stay singletons; canonical
    keeps the min id with the right cluster size."""
    from miru_spark.pipeline.dedup import dedup_canonical, dedup_components

    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "alpha beta gamma delta epsilon zeta eta theta",   # dup of 0
        2: "alpha beta gamma delta epsilon zeta eta iota",    # near-dup of 0/1
        3: "completely different words entirely here now ok", # singleton
        4: "unrelated content again nothing shared at all",   # singleton
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    comps = {r["doc_id"]: r["component"] for r in
             dedup_components(df, "doc_id", "text", threshold=0.5).collect()}
    assert comps[0] == comps[1] == comps[2] == 0
    assert comps[3] == 3 and comps[4] == 4
    canon = dedup_canonical(df, "doc_id", "text", threshold=0.5).collect()
    assert len(canon) == 1
    assert canon[0]["component"] == 0 and canon[0]["keep_doc"] == 0 and canon[0]["n_docs"] == 3


def test_ivf_topk_recall_and_determinism(spark, sf_dir):
    """IVF-flat probe path: deterministic across runs, recall vs the
    exact scan high at nprobe=8/32 on the fixture embeddings."""
    from miru_spark.pipeline.ann import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, q, k=10, query_id_col="vec_id")
    a = ivf_topk(emb, q, k=10, query_id_col="vec_id", dim=dim,
                 n_centroids=32, nprobe=8, iters=4)
    b = ivf_topk(emb, q, k=10, query_id_col="vec_id", dim=dim,
                 n_centroids=32, nprobe=8, iters=4)
    ra = [(r["query_id"], r["vec_id"], r["rank"]) for r in a.collect()]
    rb = [(r["query_id"], r["vec_id"], r["rank"]) for r in b.collect()]
    assert ra == rb  # deterministic end-to-end (seeded init, GEMM argmax)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    got = set((q_, v_) for q_, v_, _ in ra)
    recall = len(ex & got) / len(ex)
    assert recall >= 0.6, recall
    # full probe (nprobe = n_centroids) must equal the exact scan
    full = ivf_topk(emb, q, k=10, query_id_col="vec_id", dim=dim,
                    n_centroids=8, nprobe=8, iters=2)
    assert {(r["query_id"], r["vec_id"], r["rank"]) for r in full.collect()} == \
           {(r["query_id"], r["vec_id"], r["rank"]) for r in exact.collect()}


def test_sampling_deterministic_and_composable(spark):
    from miru_spark.pipeline.sampling import cap_per_key, sample_by_hash

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37).alias("src")
    )
    a = {r["doc_id"] for r in sample_by_hash(df, "doc_id", 0.3, seed=1).collect()}
    b = {r["doc_id"] for r in sample_by_hash(df, "doc_id", 0.3, seed=1).collect()}
    assert a == b and 0.25 < len(a) / 4000 < 0.35
    # a sample is invariant to partitioning (pure function of the key)
    c = {r["doc_id"] for r in
         sample_by_hash(df.repartition(13), "doc_id", 0.3, seed=1).collect()}
    assert a == c
    # nested sampling with independent seeds composes ~multiplicatively
    inner = sample_by_hash(sample_by_hash(df, "doc_id", 0.5, seed=1),
                           "doc_id", 0.5, seed=2)
    assert 0.2 < inner.count() / 4000 < 0.3

    capped = cap_per_key(df, "src", 5, order_col="doc_id")
    per = capped.groupBy("src").count().collect()
    assert all(r["count"] == 5 for r in per)
    # deterministic winners: the 5 LOWEST ids per key
    got = sorted(r["doc_id"] for r in capped.filter(F.col("src") == 0).collect())
    assert got == [0, 37, 74, 111, 148]


def test_pack_sequences_greedy_and_deterministic(spark):
    import numpy as _np

    from miru_spark.pipeline.pack import pack_sequences
    from miru_spark.pipeline.sampling import hash_bucket

    rng = _np.random.default_rng(11)
    n = 3000
    toks = rng.integers(10, 400, size=n)
    df = spark.createDataFrame(
        [(int(i), int(t)) for i, t in enumerate(toks)], "doc_id long, n long")
    out = pack_sequences(df, "doc_id", "n", budget=512, n_buckets=8).collect()
    assert len(out) == n

    # python oracle: greedy first-fit in id order per bucket
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", (hash_bucket("doc_id", 0) % 8).alias("b")).collect()
    }
    expect = {}
    state = {}
    for i in sorted(buckets):
        b = buckets[i]
        seq, acc = state.get(b, (0, 0))
        if acc + toks[i] > 512 and acc > 0:
            seq, acc = seq + 1, 0
        expect[i] = (b, seq, acc)
        state[b] = (seq, acc + int(toks[i]))
    got = {r["id"]: (r["bucket"], r["seq"], r["tok_offset"]) for r in out}
    assert got == expect

    # invariants: fit within budget (except oversized docs), offsets consistent
    for r in out:
        assert r["tok_offset"] + r["n_tokens"] <= 512 or r["tok_offset"] == 0

    # partitioning-invariant (pure function of ids)
    out2 = pack_sequences(df.repartition(17), "doc_id", "n",
                          budget=512, n_buckets=8).collect()
    assert got == {r["id"]: (r["bucket"], r["seq"], r["tok_offset"]) for r in out2}


def test_pack_sequences_oversized_doc_packs_alone(spark):
    from miru_spark.pipeline.pack import pack_sequences

    df = spark.createDataFrame(
        [(1, 100), (2, 999), (3, 100)], "doc_id long, n long")
    out = {r["id"]: r for r in
           pack_sequences(df, "doc_id", "n", budget=512, n_buckets=1).collect()}
    big = out[2]
    assert big["tok_offset"] == 0  # oversized doc opens its own sequence
    assert len({r["seq"] for r in out.values() if r["seq"] == big["seq"]}) == 1
    assert out[1]["seq"] != big["seq"] and out[3]["seq"] != big["seq"]


def test_repetition_signals_python_oracle(spark):
    from collections import Counter

    from miru_spark.analysis.tokenizer import tokenize
    from miru_spark.pipeline.text import repetition_signals

    docs = [
        (1, "a b c a b c a b c"),          # heavy repetition
        (2, "one two three four five"),    # no repetition
        (3, "x"),                          # shorter than any n-gram
        (4, ""),                           # empty
        (5, "spam spam spam spam"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: r for r in
           repetition_signals(df, "doc_id", "text").collect()}

    def grams(toks, n):
        return [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    for i, t in docs:
        toks = tokenize(t)
        for n, col in ((3, "dup_3gram_frac"), (2, "dup_2gram_frac")):
            g = grams(toks, n)
            exp = round(1.0 - len(set(g)) / len(g), 6) if g else 0.0
            assert got[i][col] == exp, (i, col)
        g2 = grams(toks, 2)
        exp_top = round(Counter(g2).most_common(1)[0][1] / len(g2), 6) if g2 else 0.0
        assert got[i]["top_2gram_frac"] == exp_top, i
    assert got[1]["dup_3gram_frac"] > 0.5 and got[2]["dup_2gram_frac"] == 0.0


def test_boilerplate_ngrams_detects_template(spark):
    from miru_spark.pipeline.text import boilerplate_ngrams

    chrome = "home about contact privacy terms"
    rows = [(i, f"{chrome} unique{i} body{i} text{i} words{i} here{i}")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = boilerplate_ngrams(df, "doc_id", "text", n=5, min_doc_frac=0.5)
    got = {r["ngram"]: r["df"] for r in out.collect()}
    assert got.get(chrome) == 40  # the template 5-gram in every doc
    assert all(v > 20 for v in got.values())


def test_lm_score_orders_typicality(spark):
    import math

    from miru_spark.pipeline.text import lm_score

    # corpus of common-word docs + one spammy outlier with rare tokens
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((99, "zxqj vvkw qqpz zzzz xxxx"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["cross_entropy"] for r in
           lm_score(df, "doc_id", "text").collect()}
    assert got[99] > got[0] + 1.0  # outlier is much less typical

    # exact python oracle for one doc
    from collections import Counter

    from miru_spark.analysis.tokenizer import tokenize
    all_toks = [t for _, x in rows for t in tokenize(x)]
    cf = Counter(all_toks)
    total, vocab = sum(cf.values()), len(cf)
    toks0 = tokenize(rows[0][1])
    exp = sum(-math.log2((cf[t] + 0.5) / (total + 0.5 * (vocab + 1)))
              for t in toks0) / len(toks0)
    assert abs(got[0] - exp) < 1e-6


def test_lm_score_external_model(spark):
    from miru_spark.pipeline.text import lm_score

    docs = spark.createDataFrame([(1, "alpha beta"), (2, "gamma delta")],
                                 "doc_id long, text string")
    model = spark.createDataFrame([("alpha", 90), ("beta", 10)], "term string, cf long")
    got = {r["id"]: r["cross_entropy"] for r in
           lm_score(docs, "doc_id", "text", lm_df=model).collect()}
    # doc 2's terms are unseen under the model -> strictly worse
    assert got[2] > got[1]


def test_temperature_sample_flattens_sources(spark):
    from miru_spark.pipeline.sampling import temperature_sample

    # skewed sources: head 4000 docs, tail 400
    df = spark.range(0, 4400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 4000, "head").otherwise("tail").alias("src"),
    )
    out = temperature_sample(df, "doc_id", "src", alpha=0.3, total_rate=0.5)
    got = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    # alpha<1 boosts the tail's SHARE vs its raw share (400/4400 = 9%)
    share_tail = got["tail"] / (got["head"] + got["tail"])
    assert share_tail > 0.2
    # tail rate caps at 1 -> tail kept (almost) fully; head downsampled
    assert got["tail"] > 350 and got["head"] < 4000 * 0.6

    # deterministic + partitioning-invariant
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in temperature_sample(
        df.repartition(13), "doc_id", "src", alpha=0.3, total_rate=0.5).collect()}
    assert a == b


def test_temperature_sample_alpha_one_is_plain_rate(spark):
    from miru_spark.pipeline.sampling import sample_by_hash, temperature_sample

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("src"))
    # alpha=1: target == data distribution -> every source rate == total_rate
    a = {r["doc_id"] for r in temperature_sample(
        df, "doc_id", "src", alpha=1.0, total_rate=0.4, seed=5).collect()}
    b = {r["doc_id"] for r in sample_by_hash(df, "doc_id", 0.4, seed=5).collect()}
    assert a == b


def test_pii_scrub(spark):
    rows = [
        (0, "reach me at jane.doe+spam@mail.example.org thanks"),
        (1, "call +1 (555) 010-4242 or 555-010-9999 now"),
        (2, "server at 192.168.1.77 and 10.0.0.1 responded"),
        (3, "no pii here at all"),
        (4, "mixed: bob@x.co from 172.16.254.3 dial 555 010 1234"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in text.pii_scrub(df, "doc_id", "text").collect()}
    assert got[0]["n_email"] == 1 and "[EMAIL]" in got[0]["text"]
    assert "@" not in got[0]["text"].replace("[EMAIL]", "")
    assert got[1]["n_phone"] == 2 and got[1]["text"].count("[PHONE]") == 2
    assert got[2]["n_ipv4"] == 2 and got[2]["text"].count("[IP]") == 2
    assert got[3]["text"] == "no pii here at all"
    assert (got[4]["n_email"], got[4]["n_phone"], got[4]["n_ipv4"]) == (1, 1, 1)


def test_decontaminate(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),      # contains bench 5-gram
            (1, "one two three four five six seven"),                  # clean
            (2, "x y alpha beta gamma delta epsilon tail words here"), # shares bench 5-gram
            (3, "short text"),                                         # clean (short)
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "prefix alpha beta gamma delta epsilon suffix")], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"]
        for r in text.decontaminate(corpus, "doc_id", "text", bench, n=5).collect()
    )
    assert kept == [1, 3]
    # plan shape: the benchmark side must broadcast (no corpus shuffle)
    plan = (
        text.decontaminate(corpus, "doc_id", "text", bench, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_duplicate_spans_semantics(spark):
    """ExactSubstr span detection (Lee et al. 2021): exact-dup docs flag
    whole-doc spans, a partially shared run flags exactly the shared
    window, unique docs are absent, islands merge overlapping grams."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta unique0 tail0"),
        (1, "prefix1 alpha beta gamma delta epsilon zeta eta theta tail1"),
        (2, "totally different words here nothing repeated at all okay"),
        (3, "alpha beta gamma delta epsilon zeta eta theta unique0 tail0"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in dedup.duplicate_spans(df, "doc_id", "text", min_len=4).collect()
    }
    # docs 0/3: all 7 4-grams duplicated -> one [0, 10) span; doc 1: the
    # 8-token shared run alpha..theta at positions 1..8 -> 5 grams, [1, 9)
    assert got == {(0, 0, 10, 7), (1, 1, 9, 5), (3, 0, 10, 7)}

    # keep_first: the globally-first occurrence (doc 0) is exempt; the
    # later occurrences (docs 1 and 3) still flag
    got_kf = {
        (r["id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(
            df, "doc_id", "text", min_len=4, keep_first=True).collect()
    }
    assert got_kf == {(1, 1, 9), (3, 0, 10)}


def test_strip_duplicate_spans(spark):
    """Token-space removal: flagged spans vanish, clean docs and
    docs shorter than min_len pass through untouched."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta unique0 tail0"),
        (1, "prefix1 alpha beta gamma delta epsilon zeta eta theta tail1"),
        (2, "totally different words here nothing repeated at all okay"),
        (3, "alpha beta gamma delta epsilon zeta eta theta unique0 tail0"),
        (4, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["text_clean"], r["n_tokens"], r["removed_tokens"])
        for r in dedup.strip_duplicate_spans(df, "doc_id", "text", min_len=4).collect()
    }
    assert got[0] == ("", 10, 10)
    assert got[1] == ("prefix1 tail1", 10, 8)
    assert got[2] == ("totally different words here nothing repeated at all okay", 9, 0)
    assert got[4] == ("tiny", 1, 0)


def test_duplicate_spans_plan_shape(spark):
    """Scale shape: the islands window is partitioned by doc (no global
    sort), and no cartesian product appears anywhere in the plan."""
    rows = [(i, f"w{i} x y z alpha beta gamma delta") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = (
        dedup.duplicate_spans(df, "doc_id", "text", min_len=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # the islands window is partitioned (by doc id), never a
    # single-partition global window
    assert "Window" in plan
    import re as _re

    for m in _re.finditer(r"Window .*", plan):
        assert "id#" in m.group(0), m.group(0)


# ---------------------------------------------------------------------
# split_corpus / epoch_shuffle (train/val/test wall + epoch ordering)
# ---------------------------------------------------------------------

def test_split_corpus_total_disjoint_deterministic(spark):
    from miru_spark.pipeline.sampling import split_corpus

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = split_corpus(df, "doc_id", w, seed=3)
    rows = {r["doc_id"]: r["split"] for r in got.collect()}
    assert len(rows) == 2000  # total: every row gets exactly one split
    from collections import Counter
    c = Counter(rows.values())
    assert set(c) <= set(w)
    assert c["train"] > c["val"] and c["train"] > c["test"]
    assert abs(c["train"] / 2000 - 0.8) < 0.06  # md5 buckets are uniform
    # pure function of the key: identical under any partitioning
    rows2 = {r["doc_id"]: r["split"]
             for r in split_corpus(df.repartition(13), "doc_id", w, seed=3).collect()}
    assert rows == rows2
    # a different seed re-deals
    rows3 = {r["doc_id"]: r["split"]
             for r in split_corpus(df, "doc_id", w, seed=4).collect()}
    assert rows != rows3


def test_split_corpus_validates_weights(spark):
    from miru_spark.pipeline.sampling import split_corpus

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        split_corpus(df, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="non-negative"):
        split_corpus(df, "doc_id", {"a": 1.5, "b": -0.5})


def test_split_corpus_membership_is_keyed(spark):
    """The same key lands in the same split in two differently-shaped
    relations — the no-leakage property randomSplit cannot give."""
    from miru_spark.pipeline.sampling import split_corpus

    w = {"train": 0.7, "test": 0.3}
    a = spark.range(500).withColumnRenamed("id", "doc_id")
    b = a.withColumn("feature", F.col("doc_id") * 2).repartition(7)
    sa = {r["doc_id"]: r["split"] for r in split_corpus(a, "doc_id", w).collect()}
    sb = {r["doc_id"]: r["split"] for r in split_corpus(b, "doc_id", w).collect()}
    assert sa == sb


def test_epoch_shuffle_deterministic_per_epoch(spark):
    from miru_spark.pipeline.sampling import epoch_shuffle

    df = spark.range(300).withColumnRenamed("id", "doc_id")
    e0 = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", epoch=0).collect()]
    e0b = [r["doc_id"] for r in
           epoch_shuffle(df.repartition(11), "doc_id", epoch=0).collect()]
    e1 = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", epoch=1).collect()]
    assert e0 == e0b                      # reproducible across partitionings
    assert sorted(e0) == sorted(e1) == list(range(300))  # permutations
    assert e0 != e1                       # epochs are independent draws
    assert e0 != list(range(300))         # actually shuffled


def test_epoch_shuffle_key_matches_md5(spark):
    import hashlib

    from miru_spark.pipeline.sampling import epoch_shuffle

    df = spark.createDataFrame([(42,), (7,)], "doc_id long")
    got = {r["doc_id"]: r["shuffle_key"]
           for r in epoch_shuffle(df, "doc_id", epoch=3, seed=5).collect()}
    for k in (42, 7):
        exp = int(hashlib.md5(f"{k}:5:3".encode()).hexdigest()[:8], 16)
        assert got[k] == exp


def test_duplicate_spans_locale_tokenization(spark):
    """ExactSubstr over a non-ASCII corpus needs the index analyzer: the
    frozen ASCII default tokenizes CJK to nothing (no spans, nothing
    stripped — text preserved), while locale='ja' detects and strips the
    duplicated run."""
    seg = "線形 代数 の 基礎 を 学ぶ こと は 大切 です"
    rows = [(0, f"{seg} 一"), (1, f"二 {seg}"), (2, "全然 違う 文章 です ね")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # ASCII default: zero tokens per doc -> no spans at all
    assert dedup.duplicate_spans(df, "doc_id", "text", min_len=4).count() == 0
    got = {
        r["id"]: r["removed_tokens"]
        for r in dedup.strip_duplicate_spans(
            df, "doc_id", "text", min_len=4, locale="ja").collect()
    }
    assert got[0] > 0 and got[1] > 0 and got[2] == 0
    # untouched docs keep a non-empty token stream under the locale
    clean = {
        r["id"]: r["text_clean"]
        for r in dedup.strip_duplicate_spans(
            df, "doc_id", "text", min_len=4, locale="ja").collect()
    }
    assert clean[2] != ""


def test_canonical_url_rules(spark):
    """Case, default ports, trailing slash, tracking params, param
    order, and fragments all normalize away; non-scheme://  values pass
    through verbatim with a NULL host; :8080 and userinfo survive."""
    from miru_spark.pipeline.web import canonical_url

    rows = [
        (0, "HTTPS://WWW.Example.COM:443/p/1/?utm_source=x&b=2&a=1#frag"),
        (1, "http://example.com:80"),
        (2, "http://user@Host.com:8080/a//"),
        (3, "not a url"),
        (4, "https://h.co/path?gclid=1&utm_campaign=z"),
        (5, "https://h.co/path"),
    ]
    got = {
        r["id"]: (r["url_canon"], r["host"])
        for r in canonical_url(
            spark.createDataFrame(rows, "id long, url string"), "url"
        ).collect()
    }
    assert got[0] == ("https://www.example.com/p/1?a=1&b=2", "www.example.com")
    assert got[1] == ("http://example.com", "example.com")
    assert got[2] == ("http://user@host.com:8080/a", "host.com")
    assert got[3] == ("not a url", None)
    # all-tracking query drops its '?' entirely; idempotent with [5]
    assert got[4] == got[5] == ("https://h.co/path", "h.co")
    # idempotence: canonicalizing the canonical form is a fixpoint
    again = canonical_url(
        spark.createDataFrame(
            [(i, u) for i, (u, _) in got.items()], "id long, url string"),
        "url",
    )
    assert {r["id"]: r["url_canon"] for r in again.collect()} == {
        i: u for i, (u, _) in got.items()}


def test_paragraph_dedup_keep_first(spark):
    """A paragraph repeated across docs keeps only its globally-first
    (id, pos) occurrence; per-doc order is preserved; all-duplicate and
    empty docs return '' with correct counts."""
    from miru_spark.pipeline.web import paragraph_dedup

    rows = [
        (0, "alpha beta\n\nshared footer\nunique one"),
        (1, "gamma delta\nshared footer\n\nunique two"),
        (2, "shared footer"),
        (3, ""),
    ]
    got = {
        r["id"]: (r["text_clean"], r["n_paragraphs"], r["removed_paragraphs"])
        for r in paragraph_dedup(
            spark.createDataFrame(rows, "id long, text string"), "id", "text"
        ).collect()
    }
    assert got[0] == ("alpha beta\nshared footer\nunique one", 3, 0)
    assert got[1] == ("gamma delta\nunique two", 3, 1)
    assert got[2] == ("", 1, 1)
    assert got[3] == ("", 0, 0)


def test_dedup_family_locale_tokenization(spark):
    """The whole dedup family tokenizes through the analyzer registry:
    a CJK corpus produces NO shingle/signature structure under the
    frozen ASCII default (every doc is token-empty, which must not make
    them all 'similar' to each other via real content), while
    locale='ja' finds the real near-dup pair."""
    from miru_spark.pipeline import dedup

    seg = "線形 代数 の 基礎 を 学ぶ こと は 大切 です 本当 に"
    rows = [(0, seg), (1, seg + " 一"), (2, "全く 別 の 話題 です ね 今日 は 晴れ です よ ね")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # ja path: docs 0/1 are Jaccard-similar, doc 2 is not
    pairs = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.5, locale="ja").collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]
    comps = {
        r["doc_id"]: r["component"]
        for r in dedup.dedup_components(
            df, "doc_id", "text", n=3, threshold=0.5, locale="ja").collect()
    }
    assert comps[0] == comps[1] != comps[2]
    # signatures honor the locale too: ja signatures differ between the
    # two distinct docs; ASCII-default signatures collapse (no tokens)
    sig = {r["id"]: tuple(r["signature"]) for r in
           dedup.minhash_signatures(df, "doc_id", "text", locale="ja").collect()}
    assert sig[0] != sig[2]
    sim = {r["id"]: r["simhash"] for r in
           dedup.simhash_signatures(df, "doc_id", "text", locale="ja").collect()}
    assert sim[0] != sim[2]
    sim_ascii = {r["id"]: r["simhash"] for r in
                 dedup.simhash_signatures(df, "doc_id", "text").collect()}
    assert sim_ascii[0] == sim_ascii[2]  # token-empty docs: no signal


def test_text_ops_locale_tokenization(spark):
    """token_stats/quality/fingerprint/repetition honor locale= (the
    analyzer registry): a CJK doc has zero tokens under the ASCII
    default but real counts (and the locale's stopword list) under ja."""
    from miru_spark.pipeline import text

    rows = [(0, "東京タワーは東京の名所です"), (1, "plain ascii text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    default = {r["id"]: r["n_tokens"] for r in
               text.token_stats(df, "doc_id", "text").collect()}
    ja = {r["id"]: r["n_tokens"] for r in
          text.token_stats(df, "doc_id", "text", locale="ja").collect()}
    assert default[0] == 0 and ja[0] > 0
    assert default[1] == ja[1] == 4  # ASCII text: same stream either way
    fp_d = {r["id"]: r["norm_digest"] for r in
            text.fingerprint(df, "doc_id", "text").collect()}
    fp_j = {r["id"]: r["norm_digest"] for r in
            text.fingerprint(df, "doc_id", "text", locale="ja").collect()}
    assert fp_d[0] != fp_j[0] and fp_d[1] == fp_j[1]
    rep = {r["id"]: r["n_tokens"] for r in
           text.repetition_signals(df, "doc_id", "text", locale="ja").collect()}
    assert rep[0] > 0


def test_canonical_url_idempotent_grid(spark):
    """Idempotence over a combinatorial URL grid: canonicalizing twice
    equals canonicalizing once (every rule is a fixpoint rewrite), and
    host extraction agrees between the two passes."""
    import itertools

    from miru_spark.pipeline.web import canonical_url

    schemes = ["http", "HTTPS", "ftp"]
    auths = ["Example.com", "a.B.co:443", "x.io:80", "u:p@Host.net:8080"]
    paths = ["", "/", "/A/b/", "//d//"]
    queries = ["", "?b=2&a=1", "?utm_x=1&a=%20z", "?gclid=1", "?a=1&a=0"]
    frags = ["", "#F"]
    rows = [
        (i, f"{s}://{a}{p}{q}{f}")
        for i, (s, a, p, q, f) in enumerate(
            itertools.product(schemes, auths, paths, queries, frags))
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    once = canonical_url(df, "url").select(
        "id", F.col("url_canon").alias("u1"), F.col("host").alias("h1"))
    twice = canonical_url(
        once.select("id", F.col("u1").alias("url")), "url"
    ).select("id", F.col("url_canon").alias("u2"), F.col("host").alias("h2"))
    bad = (
        once.join(twice, "id")
        .filter((F.col("u1") != F.col("u2")) | (F.col("h1") != F.col("h2")))
        .collect()
    )
    assert bad == [], bad[:5]


def test_dedup_family_string_ids(spark):
    """url-keyed corpora are a first-class id shape (the crawl pipeline
    falls back to key='url' when no numeric id exists): signatures,
    banding, and connected components must carry string ids through
    instead of null-casting them (review r3)."""
    rows = [
        ("https://a.example/1", "the quick brown fox jumps over the lazy dog"),
        ("https://a.example/2", "the quick brown fox jumps over the lazy dog"),
        ("https://b.example/1", "completely different text about spark shuffles here"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    sigs = {r["id"]: r["signature"]
            for r in dedup.minhash_signatures(df, "url", "text").collect()}
    assert set(sigs) == {u for u, _ in rows}
    assert sigs["https://a.example/1"] == sigs["https://a.example/2"]
    pairs = dedup.minhash_lsh_pairs(df, "url", "text", verify_threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("https://a.example/1", "https://a.example/2") in got
    sh = {r["id"]: r["simhash"]
          for r in dedup.simhash_signatures(df, "url", "text").collect()}
    assert sh["https://a.example/1"] == sh["https://a.example/2"]
    comps = {r["doc_id"]: r["component"]
             for r in dedup.dedup_components(df, "url", "text", threshold=0.8,
                                             max_shingle_df=None).collect()}
    assert None not in comps and None not in comps.values()
    assert comps["https://a.example/1"] == comps["https://a.example/2"]
    assert comps["https://b.example/1"] != comps["https://a.example/1"]


def test_simhash_pairs_recall_complete_for_radius(docs_with_dups):
    """Banding must be recall-complete for the REQUESTED radius: every
    pair with hamming <= max_hamming appears (pigeonhole over
    max_hamming+1 bands — the old fixed 4-band split silently dropped
    qualifying pairs past hamming 3)."""
    sigs = {r["id"]: r["simhash"]
            for r in dedup.simhash_signatures(docs_with_dups, "id", "text").collect()}
    for h in (3, 6, 10):
        want = {
            (a, b): bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
            for a in sigs for b in sigs if a < b
        }
        want = {p: d for p, d in want.items() if d <= h}
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in dedup.simhash_pairs(
                   docs_with_dups, "id", "text", max_hamming=h).collect()}
        assert got == want, (h, got, want)
