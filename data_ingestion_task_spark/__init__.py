"""data_ingestion_task_spark — a PySpark-native document-ingestion and
text/vector analytics engine.

Re-expresses the capabilities of the reference corpus
(Kangaroo112233/Data_Ingestion_task — an OCR document ingestion →
classification → extraction → normalization → evaluation pipeline)
as idiomatic Spark DataFrame transformations designed for 100 TB scale:

- ``sources``    — parquet/CSV/text readers, directory scans, streaming ingest
- ``functions``  — normalization / text / vector column-expression libraries
- ``operators``  — chunking, kNN join, dedup, sampling, metrics
- ``plans``      — named query registry with DuckDB oracle twins
- ``streaming``  — Structured Streaming file-source ingestion

Every operator is a pure DataFrame transformation (no driver-side
collect loops); Python appears only in clearly-marked Pandas-UDF
stages (embedding encoders, JSON repair), which take Arrow batches.
"""

__version__ = "0.1.0"
