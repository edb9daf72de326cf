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
