"""The reference's batch ETL re-expressed Spark-first.

Pipeline (one lazy DAG per table, Catalyst optimizes the whole plan):

    ingest.py     raw FPL JSON (fixtures/main/players) → typed DataFrames
                  (explicit schemas at the edge; the players dict becomes one
                  explode, dissolving the reference's N-frame concat U1)
    transform.py  the 11-table catalog (rename/drop/cast/join/union/agg)
    quality.py    PK uniqueness + not-null constraint actions (Q1-Q3)

Reference: etl/run_transform.py:17-27 (catalog), etl/load.py:112-472 (DDL).
"""
