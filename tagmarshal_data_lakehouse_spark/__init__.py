"""tagmarshal_data_lakehouse_spark — a PySpark-native lakehouse engine.

A from-scratch, single-engine (Spark SQL + DataFrame + Parquet/Delta tables)
re-expression of the capabilities of the reference medallion lakehouse
(`karinlouw/tagmarshal_data_lakehouse`, surveyed in /root/repo/SURVEY.md):

- bronze ingestion of ragged flattened CSV and MongoDB-export JSON round
  documents (sources/),
- the silver fix-grain transform program (silver.py): explode -> timestamp
  derivation -> topology range join -> ordered-window dedup -> coordinate
  quarantine, with idempotent partition rewrites,
- course-topology dimension inference (dims.py),
- the gold model DAG as PySpark builders (gold/),
- the exploration/dashboard query library as Spark SQL (queries/),
- data-quality assertions ported from the reference's dbt tests (quality.py),
- LLM-training-data-pipeline operators beyond the reference: dedup,
  similarity search, text analysis, multimodal column plumbing (training/).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy, and whole-stage codegen; Python UDFs appear only as
Arrow-vectorized pandas UDFs in the training operators where no built-in
exists.
"""

__version__ = "0.1.0"
