"""opensearch_spark — a PySpark-native full-text index build + BM25 query engine.

A brand-new engine with the query/data-processing capabilities of the
reference (OpenSearch, an Apache-2.0 Lucene-based search engine), re-expressed
Spark-first: DataFrame/SQL plans for everything Catalyst can optimize, and
vectorized Arrow/pandas UDFs only for the genuinely custom pieces (analysis,
posting-block codec, document-at-a-time block-max WAND top-k).

Layout
------
- ``analysis``   — tokenizers/analyzers (reference: ``indices/analysis/AnalysisModule.java``)
- ``index``      — posting-list build, delta+varbyte block codec, manifest/checkpoint
  (reference: ``index/engine/InternalEngine.java``, ``index/codec/``)
- ``scoring``    — Lucene-style SmallFloat norms + LegacyBM25
  (reference: ``index/similarity/SimilarityProviders.java:274-281``)
- ``search``     — query AST/DSL, planner, DAAT top-k with block-max WAND
  (reference: ``search/query/QueryPhase.java``, ``index/query/*Builder.java``)
- ``aggs``       — metric/bucket/pipeline aggregation facade over DataFrame ops
  (reference: ``search/aggregations/``)
- ``functions``  — ingest-processor-equivalent scalar functions
  (reference: ``modules/ingest-common/``)
- ``ml``         — dedup (exact/minhash-LSH/simhash/jaccard), ANN similarity,
  text quality/langid/fingerprint, multimodal plumbing
- ``streaming``  — NRT micro-batch ingest (reference: 1 s refresh ≈ trigger)
"""

__version__ = "0.1.0"
