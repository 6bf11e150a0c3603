"""fantasy_premier_league_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo Hazzais/fantasy_premier_league (batch ETL + ML analytics over
relational tables), re-expressed Spark-first:

- DataFrame/SQL logical plans, Catalyst/AQE physical execution
- broadcast joins for dimensions, shuffle-key-aware aggregations
- Pandas UDFs only where built-ins genuinely cannot express the semantics
  (fuzzy string similarity; multimodal decode stubs)
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
    session.py    SparkSession factory (local test config + scale notes)
    catalog.py    table registry over the driver's parquet test tables
    etl/          the reference's 11-table FPL transform semantics
    operators/    as-of join, dedup family, ANN similarity, text stats,
                  fuzzy entity resolution, multimodal plumbing
    functions/    scalar helpers (null-safe casts, time encodings)
    queries/      the oracle-checked query inventory (driver contract)
"""

__version__ = "0.1.0"
