"""LLM-training-data pipeline operators (beyond-reference surface).

The reference lakehouse has no corpus-processing operators; these are the
first-class additions the north-star calls for (BASELINE.json): exact and
near deduplication, similarity search over embeddings, text analysis, and
multimodal-column plumbing — each designed Spark-first for 100 TB:

- everything is DataFrame ops over built-in functions where possible
  (shingling via `transform`/`sequence`, hashing via `xxhash64`, set
  similarity via `array_intersect`/`array_union` — all JVM-side);
- Python appears only as Arrow-vectorized pandas UDFs / mapInPandas
  (simhash bit-packing, multimodal decode) — never row-at-a-time UDFs;
- no driver-side collects: candidate generation is join-based (LSH band
  buckets), not cross-product, so the shuffle volume is O(candidates),
  not O(n^2).
"""
