"""PySpark-native n-ary relation-extraction / KG-construction engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference repo ``aurtg/nary-relation-extraction-decomposed``
(see SURVEY.md for the capability inventory; the reference tree at
/root/reference was empty this round — every capability row is bound to
BASELINE.json's north star instead of reference file:line).

Layout
------
- ``session``    : SparkSession builders (AQE + Arrow tuned, local or cluster)
- ``sources``    : table loaders (parquet now, Iceberg-shaped API), pages scan
- ``extract``    : frozen, dependency-free HTML→text extractor (byte-stable)
- ``functions``  : scalar/array/hash helpers (salting, minhash, text metrics)
- ``operators``  : mention detection, doc-graph BFS, decompose/rejoin, ER,
                   dedup family, similarity search, multimodal plumbing
- ``plans``      : queries()/oracle_sql() registry, end-to-end pipeline,
                   checkpoint manifest for kill-resume
- ``streaming``  : Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
