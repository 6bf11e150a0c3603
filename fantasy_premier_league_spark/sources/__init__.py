"""Source/sink surface (SURVEY §2.1 S1-S15).

- rest.py     REST API scans: single-document fetch and the distributed
              per-key fan-out (S1/S2)
- files.py    snapshot-file conventions: timestamp-suffixed names (S12),
              latest-by-prefix selection (S13), listing → DataFrame with
              extracted timestamps (S15)
- jdbc.py     JDBC scans and batch sinks with overwrite/append + column
              alignment and the audit-record append (S8-S11)

Parquet replaces the reference's pickle interchange (S5) everywhere — the
ETL tables are written/read with plain ``df.write.parquet`` semantics.
"""
