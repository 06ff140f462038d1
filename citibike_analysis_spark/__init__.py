"""citibike_analysis_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ``alhankeser/citibike-analysis``
(ETL + time-series analytics over bike-share availability + weather),
built Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
Structured Streaming for the ingestion tier, and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, sane shuffle defaults)
- ``sources``    schema-declared readers/writers (parquet/csv/json)
- ``functions``  curated scalar/temporal/geo/text column expressions
- ``operators``  composite dataflow operators (dedup, similarity,
                 spatial band join, scalable ntile, interval rollup)
- ``plans``      end-to-end query plans: the reference's analytics
                 re-expressed over the synthetic star schema, plus the
                 reference-shaped Citi Bike pipelines
- ``streaming``  Structured Streaming re-model of the collection tier
"""

__version__ = "0.1.0"
