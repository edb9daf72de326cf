from miru_spark.analysis.tokenizer import (  # noqa: F401
    STOPWORDS_EN,
    extract_text,
    extract_text_udf,
    tokenize,
    tokenize_udf,
)
