"""PySpark-native analytics engine.

A brand-new engine re-expressing the query surface of the reference
repo Zelong-Chen/Data-Mining-Map-Reduce (12 standalone RDD MapReduce
scripts: data exploration, SON frequent itemsets, MinHash+LSH, graph
community detection, BFR clustering, streaming sketches) as idiomatic
Spark 4.x DataFrame / SQL / Structured Streaming operators, plus the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) such an engine needs at
the 100 TB design point.

Design rules (see SURVEY.md):
- DataFrame/SQL first; Catalyst plans everything; zero custom rules.
- UDF-free where built-ins express the semantics; Pandas UDF /
  mapInPandas only for partition-block algorithms (SON phase 1,
  per-root BFS, vector batch ops).
- Every SQL-expressible operator ships with a DuckDB oracle twin in
  ``__spark_entry__.oracle_sql``.
- Scale posture: shuffles on keys, broadcast for dims, AQE on,
  deterministic seeds everywhere.
"""

__version__ = "0.1.0"
