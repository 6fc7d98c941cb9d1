"""PySpark-native analytics engine with the capabilities of
tspannhw/nifi-extracttext-processor (reference read-only at
/root/reference), rebuilt Spark-first from scratch.

Layout:
  formats/    pure-stdlib document parsers (PDF/DOC/DOCX/XLS/XLSX/HTML)
  operators/  DataFrame operators (Tier A extraction, Tier B relational,
              north-star extensions: dedup, similarity, text analysis)
  sources/    batch + streaming sources (binaryFile, file listing)
  sinks/      avro/parquet file sink, kafka, webhook
  streaming/  Structured Streaming parity pipeline
  plans/      the end-to-end flow-template pipeline (SURVEY §3)
  functions/  scalar function registry
"""

__version__ = "0.1.0"
