"""ragstudio_spark — a PySpark-native extraction + chunking analytics engine.

A from-scratch reimplementation of the capabilities of sekkaahmed/ragstudio
(``ragctl``: ingest → detect/route → extract → normalize/repair → profile →
chunk → quality-gate → export), re-expressed as a distributed Spark DataFrame
job over tables of multi-turn transcripts ``(conv_id, turn_idx, role, text,
tool, ts)``.

Layout
------
``kernel/``     pure-Python/pandas text algorithms (no Spark imports). These are
                the vectorized bodies of the pandas UDFs *and* the differential
                test oracle.
``operators/``  Spark DataFrame operators (content-type sniffing, extraction
                routing, normalization, chunking, profiling, strategy
                selection, quality gates, dedup, similarity, text stats).
``pipeline/``   end-to-end jobs: extract+chunk pipeline, lineage/metrics,
                checkpointed resume.
``sources/``    deterministic synthetic transcript generator (distributed,
                seedable) + testdata table readers.
``streaming/``  Structured Streaming variant of the pipeline.

Design rules (scale-first):
  * hot path is shuffle-free: scan → column exprs → pandas UDFs → explode →
    write; chunk_index derives from in-string position, never row order.
  * everything expressible as built-in ``pyspark.sql.functions`` stays JVM-side
    (routing ladders, profiling regexes, quality gate, hashing, aggregation);
    Python appears only in Arrow-batched pandas UDFs (NFKC, line-scan PDF
    repair, HTML boilerplate strip, recursive chunker).
  * deterministic everywhere: md5-derived ids, seeded generators, no clock or
    RNG in the data path.
"""

__version__ = "0.1.0"
