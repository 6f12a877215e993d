"""stockmarket_bigdata_project_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine with the query and data-processing
capabilities of the reference project (Akstrov/Stockmarket-Bigdata-Project,
a Kafka → Spark Structured Streaming → MongoDB meme-stock pipeline), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, columnar parquet storage,
Structured Streaming for the streaming surface, and Arrow-vectorized pandas UDFs
only where built-in operators genuinely cannot express the semantics.

Layout (see SURVEY.md §7):
  session.py        SparkSession factory (AQE on, Arrow on, UTC)
  catalog.py        testdata table loading / temp-view registration
  operators/        batch relational + time-series operators (SURVEY §2.1-2.8)
  functions/        scalar/text function layer (ticker extraction, sentiment)
  sources/          readers/writers (csv/json/parquet, partitioned sinks)
  streaming/        Structured Streaming pipelines (SURVEY §2.9)
  llmdata/          LLM-data-pipeline extensions: dedup, similarity, text stats
  ml.py             ML-adjacent dataflow (scaling, splits, eval — SURVEY §2.10)
"""

__version__ = "0.1.0"
