from miru_spark.analysis.tokenizer import STOPWORDS_EN, extract_text, tokenize


def test_tokenize_basic():
    assert tokenize("Hello, World! 42x") == ["hello", "world", "42x"]
    assert tokenize("") == []
    assert tokenize(None) == []


def test_tokenize_stopwords():
    assert tokenize("the quick and the dead", use_stopwords=True) == ["quick", "dead"]
    assert "the" in STOPWORDS_EN


def test_tokenize_deterministic():
    s = "Some TEXT with  MIXED   case\tand\nwhitespace"
    assert tokenize(s) == tokenize(s)


def test_extract_text_byte_identical():
    html = b"<html><head><title>T</title></head><body>Hello <b>world</b>!</body></html>"
    t1 = extract_text(html)
    t2 = extract_text(bytes(html))
    assert t1 == t2 == "T Hello world !"


def test_extract_text_invalid_utf8():
    assert extract_text(b"<p>caf\xff</p>") == "caf�"
    assert extract_text(None) == ""


def test_extract_then_tokenize_matches_plain_text():
    text = "spark join filter window"
    html = ("<html><body>" + text + "</body></html>").encode()
    assert tokenize(extract_text(html)) == tokenize(text)


def test_jvm_tokens_col_parity(spark):
    """tokens_col (JVM codegen twin) must tokenize identically to the
    Python tokenizer — doclen in the doc store depends on it."""
    from pyspark.sql import functions as F

    from miru_spark.analysis.tokenizer import tokens_col

    texts = [
        "Hello, World! 42x", "", "the quick AND the dead",
        "a-b_c d.e", "  spaced   out  ", "42 7 42",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = df.select("i", tokens_col(F.col("text")).alias("jvm")).collect()
    for r in rows:
        assert list(r["jvm"]) == tokenize(texts[r["i"]]), texts[r["i"]]
    stop = df.select("i", tokens_col(F.col("text"), use_stopwords=True).alias("jvm")).collect()
    for r in stop:
        assert list(r["jvm"]) == tokenize(texts[r["i"]], use_stopwords=True)
