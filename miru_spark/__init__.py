"""miru_spark — a from-scratch PySpark-native analytics/search engine.

Re-expresses the query and data-processing capabilities of the reference
engine (jivesoftware/miru, a JVM bitmap-index stream/search engine) as an
idiomatic Spark DataFrame stack:

- ``analysis``   : deterministic tokenization / text extraction (the
                   byte-identical-per-url invariant lives here).
- ``index``      : inverted-index build — (term, docId, tf, doclen) postings,
                   delta+varbyte block-max posting lists, doc/term stats,
                   per-shard lineage manifests with checkpointed resume.
                   Reference analogue: miru-service stream/MiruIndexer +
                   LabInvertedIndex ("atomized" Roaring containers).
- ``query``      : query parsing (Lucene-classic-style, default AND), filter
                   AST -> Column trees, BM25 top-k scoring with block-max
                   pruning. Reference analogue: miru-stream-plugins fulltext.
- ``operators``  : miru's secondary query families (distincts, uniques,
                   aggregateCounts, analytics waveforms, trending, reco,
                   anomaly, stumptown) as DataFrame recipes.
- ``pipeline``   : large-scale training-data ops — dedup (exact / MinHash-LSH
                   / SimHash / n-gram Jaccard), ANN similarity search, text
                   quality / language-id / fingerprinting, multimodal binary
                   column plumbing.
- ``streaming``  : Structured Streaming ingest of the index (micro-batch
                   incremental shard builds), miru's sip/WAL analogue.
"""

__version__ = "0.1.0"
