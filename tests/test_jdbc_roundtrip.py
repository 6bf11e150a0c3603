"""Real-database JDBC round-trips for S8-S11 (sources/jdbc.py).

Spark ships an embedded pure-Java database (Apache Derby, used for the
Hive metastore) in its jars directory, so the JDBC source/sink paths can
be exercised end-to-end without any external service: overwrite
(drop/create/insert ≙ reference etl/load.py:27-63), append
(etl/load.py:65-70), whole-catalog FK-ordered load (etl/load.py:111-472),
column re-alignment (etl/load.py:22-24,81-82), the statuses append log
(run_load.py:205-223), and the single-row audit record
(etl/load.py:86-108,466-472).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fantasy_premier_league_spark.sources import jdbc as J

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "fpl"
    return f"jdbc:derby:{db};create=true"


def rows_of(df):
    return {tuple(r) for r in df.collect()}


class TestBatchOverwriteAppend:
    def test_overwrite_roundtrip(self, spark, url):
        df = spark.createDataFrame(
            [(1, "alpha", 1.5), (2, "beta", -2.0)], "id int, name string, score double"
        )
        J.batch_overwrite(df, url, "t_overwrite", properties=DERBY)
        back = J.read_table(spark, url, "t_overwrite", properties=DERBY)
        assert rows_of(back) == rows_of(df)

    def test_overwrite_replaces_prior_contents(self, spark, url):
        first = spark.createDataFrame([(1, "old")], "id int, name string")
        second = spark.createDataFrame([(9, "new")], "id int, name string")
        J.batch_overwrite(first, url, "t_replace", properties=DERBY)
        J.batch_overwrite(second, url, "t_replace", properties=DERBY)
        back = J.read_table(spark, url, "t_replace", properties=DERBY)
        assert rows_of(back) == {(9, "new")}

    def test_append_accumulates_like_statuses_log(self, spark, url):
        # the reference's statuses table is an append-only load log
        batch = spark.createDataFrame([("gw1", 10), ("gw1", 11)], "gw string, n int")
        J.batch_append(batch, url, "t_statuses", properties=DERBY)
        J.batch_append(batch, url, "t_statuses", properties=DERBY)
        back = J.read_table(spark, url, "t_statuses", properties=DERBY)
        assert back.count() == 4

    def test_append_with_column_alignment(self, spark, url):
        # frame arrives with columns out of order and one column missing:
        # alignment must reorder and null-fill before the insert
        target = spark.createDataFrame(
            [(1, "x", 0.5)], "id int, label string, weight double"
        )
        J.batch_overwrite(target, url, "t_aligned", properties=DERBY)
        shuffled = spark.createDataFrame([("y", 2)], "label string, id int")
        J.batch_append(
            shuffled, url, "t_aligned",
            target_columns=["id", "label", "weight"], properties=DERBY,
        )
        back = J.read_table(spark, url, "t_aligned", properties=DERBY)
        assert rows_of(back) == {(1, "x", 0.5), (2, "y", None)}

    def test_alignment_refuses_extra_columns(self, spark):
        df = spark.createDataFrame([(1, "boom")], "id int, rogue string")
        with pytest.raises(ValueError, match="rogue"):
            J.align_columns(df, ["id"])


class TestCatalogLoad:
    def test_full_catalog_fk_order_and_contents(self, spark, url):
        # all 11 reference tables, written dims-before-facts
        catalog = {
            name: spark.createDataFrame(
                [(i, f"{name}_{i}") for i in range(3)], "pk int, payload string"
            )
            for name in J.CATALOG_LOAD_ORDER
        }
        written = J.load_catalog(catalog, url, mode="overwrite", properties=DERBY)
        assert written == J.CATALOG_LOAD_ORDER
        for name in written:
            back = J.read_table(spark, url, name, properties=DERBY)
            assert rows_of(back) == rows_of(catalog[name]), name

    def test_unknown_tables_append_after_catalog(self, spark):
        df = None  # ordering only consults keys
        cat = {"zzz_extra": df, "teams": df, "fixtures": df, "aaa_extra": df}
        assert J.ordered_tables(cat) == ["teams", "fixtures", "aaa_extra", "zzz_extra"]


class TestAuditAndQueryPushdown:
    def test_audit_record_appends(self, spark, url):
        rec = J.audit_record(
            spark, load_datetime="2024-08-01 10:30:00", gameweek_now="gw7", user="loader"
        )
        J.batch_overwrite(rec, url, "t_record", properties=DERBY)
        J.batch_append(
            J.audit_record(spark, load_datetime="2024-08-08 10:30:00",
                           gameweek_now="gw8", user="loader"),
            url, "t_record", properties=DERBY,
        )
        back = J.read_table(spark, url, "t_record", properties=DERBY)
        assert back.count() == 2
        assert set(back.columns) == {"load_datetime", "gameweek_now", "login_user"}
        gws = {r["gameweek_now"] for r in back.collect()}
        assert gws == {"gw7", "gw8"}

    def test_read_query_pushes_select_to_db(self, spark, url):
        df = spark.createDataFrame(
            [(i, i * 10) for i in range(20)], "id int, v int"
        )
        J.batch_overwrite(df, url, "t_pushdown", properties=DERBY)
        # Spark's JDBC writer creates quoted (case-exact) identifiers, and
        # Derby folds unquoted names to uppercase — quote them in raw SQL
        got = J.read_query(
            spark, url, 'SELECT "id", "v" FROM t_pushdown WHERE "v" >= 150',
            properties=DERBY,
        )
        assert got.count() == 5
        assert got.agg(F.min("v")).first()[0] == 150
