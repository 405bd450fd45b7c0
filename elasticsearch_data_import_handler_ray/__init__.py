"""elasticsearch_data_import_handler_ray — a Ray-Data-native data-processing +
full-text-indexing engine.

A from-scratch rebuild (NOT a port) of the capabilities of
``kohesive/elasticsearch-data-import-handler``: the config-driven relational/ETL
layer the reference expressed in Spark SQL, plus the full-text half (analysis,
inverted index, BM25 top-k) the reference delegated to Elasticsearch — both
re-expressed Ray-Data-first per ``SURVEY.md`` and ``BASELINE.json``.

Layout:
    functions/   pure, process-local kernels (tokenizer, varbyte codec, BM25 math, hashing)
    stages/      ``map_batches`` batch transforms (tokenize, text analysis, dedup, ANN, multimodal)
    sources/     named-Dataset catalog + readers (replaces the reference's JDBC/file temp views)
    index/       inverted-index build / merge / query (segments, manifest, BM25 engine)
    pipelines/   declarative pipeline spec (config-driven, like the reference) + relational ops
    state/       run state: manifest persistence, locking, checkpoints, metrics

Library code NEVER calls ``ray.init``/``ray.shutdown`` (driver contract,
``__ray_entry__.py``).
"""

__version__ = "0.1.0"
