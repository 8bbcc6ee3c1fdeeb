"""milan_telecom_etl__spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference single-node ETL (pandas + PostgreSQL/PostGIS; see SURVEY.md)
and extends them with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layering (SURVEY.md §7.0):
  schemas   — explicit StructTypes (reference DDL src/database.py:66-99)
  sources   — CSV/GeoJSON/parquet readers (S1-S5)
  operators — cleansing (C1-C8,T1-T2,P3-P5), constraints (P7/A5/J2),
              dedup / similarity / text / multimodal extensions
  plans     — views (A2) and analytics queries (A4/O1/J3)
  streaming — Structured Streaming ingest variant (§2.9 extension)
  pipeline  — orchestration (main.py:56-94 shape)

Everything is DataFrame/Spark-SQL; Python UDFs only where built-ins
genuinely cannot express the semantics (geometry, minhash).
"""

__version__ = "0.1.0"
