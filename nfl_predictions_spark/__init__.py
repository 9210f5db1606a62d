"""nfl_predictions_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference repo ``zaratsian/nfl_predictions`` (a Flask + Spark-ML play
scoring app; see SURVEY.md), re-expressed Spark-first:

- DataFrame/SQL relational core (scans, joins, aggs, windows, set ops,
  scalar function library) — ``operators.relational``
- ML pipeline module (StringIndexer -> VectorAssembler -> GBT two-model
  best-play scoring, reference semantics) — ``ml``
- Structured Streaming module (windows, watermark, stateful dedup,
  score-and-route) — ``streaming``
- LLM-data-pipeline north stars (dedup incl. MinHash-LSH/SimHash,
  similarity search over embeddings, text analysis, multimodal binary
  columns) — ``operators.dedup/similarity/text/multimodal``

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, and AQE; Python UDFs appear only where the
built-ins genuinely cannot express the semantics (and then as
Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
