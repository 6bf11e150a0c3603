"""Independent brute-force cross-checks: pure-Python reference
implementations compared against the engine on the full synthetic season
and random inputs (no Spark logic reused on the checking side)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fantasy_premier_league_spark.etl import ingest, transform
from fantasy_premier_league_spark.operators import dedup as D
from fantasy_premier_league_spark.operators.rank import global_rank
from tests.test_etl_fullseason import FINISHED_GWS, _round_robin, _score, build_season


def python_league_table() -> dict[int, dict[str, int]]:
    """The league table computed independently from the same schedule."""
    first = _round_robin(20)
    schedule = first + [[(b, a) for (a, b) in rnd] for rnd in first]
    table = {t: {"points": 0, "gd": 0, "win": 0, "draw": 0, "loss": 0,
                 "gf": 0, "ga": 0, "played": 0} for t in range(1, 21)}
    fid = 0
    for gw0, rnd in enumerate(schedule):
        for home, away in rnd:
            fid += 1
            if gw0 + 1 > FINISHED_GWS:
                continue
            hs, as_ = _score(fid, home, away)
            for team, mine, theirs in ((home, hs, as_), (away, as_, hs)):
                row = table[team]
                row["played"] += 1
                row["gf"] += mine
                row["ga"] += theirs
                row["gd"] += mine - theirs
                if mine > theirs:
                    row["win"] += 1
                    row["points"] += 3
                elif mine == theirs:
                    row["draw"] += 1
                    row["points"] += 1
                else:
                    row["loss"] += 1
    return table


class TestLeagueTableCrossCheck:
    def test_full_season_table_matches_python(self, spark, tmp_path_factory):
        outdir = tmp_path_factory.mktemp("xcheck")
        paths = build_season(str(outdir))
        cat = transform.build_all(
            ingest.read_fixtures_json(spark, paths["fixtures"]),
            ingest.read_main_json(spark, paths["main"]),
            ingest.read_players_json(spark, paths["players"]),
        )
        got = {int(r["team_id"]): r.asDict() for r in cat["league_table"].collect()}
        expected = python_league_table()
        for t in range(1, 21):
            e, g = expected[t], got[t]
            assert (g["points"], g["goal_difference"], g["win"], g["draw"], g["loss"],
                    g["goals_scored"], g["goals_conceded"], g["played"]) == (
                e["points"], e["gd"], e["win"], e["draw"], e["loss"],
                e["gf"], e["ga"], e["played"]), f"team {t}"
        # positions follow (points, gd, gf) desc with team_id tiebreak
        order = sorted(expected, key=lambda t: (-expected[t]["points"], -expected[t]["gd"],
                                                -expected[t]["gf"], str(t)))
        got_order = [int(r["team_id"]) for r in cat["league_table"].orderBy("table_position").collect()]
        assert got_order == order


class TestJaccardCrossCheck:
    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.lists(st.integers(0, 12), min_size=3, max_size=15), min_size=2, max_size=6))
    def test_matches_python_bruteforce(self, spark, word_lists):
        docs = [(i, " ".join(f"w{w}" for w in ws)) for i, ws in enumerate(word_lists)]
        df = spark.createDataFrame(docs, "id long, text string")
        got = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in D.ngram_jaccard_pairs(df, "id", "text", n=3, threshold=0.0).collect()}

        def shingles(ws):
            toks = [f"w{w}" for w in ws]
            return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

        for i, a in enumerate(word_lists):
            for j, b in enumerate(word_lists):
                if i >= j:
                    continue
                sa, sb = shingles(a), shingles(b)
                inter = len(sa & sb)
                if inter == 0:
                    assert (i, j) not in got
                else:
                    exact = inter / len(sa | sb)
                    assert got[(i, j)] == pytest.approx(exact, abs=1e-6)


class TestGlobalRankProperty:
    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=60))
    def test_matches_python_sort(self, spark, values):
        rows = [(i, v) for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, "rid int, v int").repartition(5)
        ranked = {r["rid"]: r["rank"]
                  for r in global_rank(df, [F.desc("v"), F.asc("rid")]).collect()}
        expected_order = sorted(rows, key=lambda t: (-t[1], t[0]))
        for rank0, (rid, _) in enumerate(expected_order):
            assert ranked[rid] == rank0 + 1


class TestGlobalCumsumProperty:
    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=60))
    def test_matches_python_prefix_sum(self, spark, values):
        from fantasy_premier_league_spark.operators.rank import global_cumsum

        rows = [(i, v) for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, "rid int, v int").repartition(5)
        got = {
            r["rid"]: r["cs"]
            for r in global_cumsum(
                df, [F.desc("v"), F.asc("rid")], F.col("v"), out="cs"
            ).collect()
        }
        acc = 0
        for rid, v in sorted(rows, key=lambda t: (-t[1], t[0])):
            acc += v
            assert got[rid] == acc

    def test_total_out_rides_offsets_frame(self, spark):
        from fantasy_premier_league_spark.operators.rank import global_cumsum

        rows = [(i, i * 3 - 40) for i in range(25)]
        df = spark.createDataFrame(rows, "rid int, v int").repartition(5)
        out = global_cumsum(
            df, [F.asc("rid")], F.col("v"), out="cs", total_out="tot"
        ).collect()
        want_total = sum(v for _, v in rows)
        assert all(r["tot"] == want_total for r in out)
        assert max(r["cs"] for r in out) >= want_total  # last prefix == total


class TestNtileClosedForm:
    """r36's decile cut replaces ntile(10)-over-global-window with the
    two-phase global_ntile (rank + ntile's closed form); pin it against
    F.ntile itself on sizes that hit every edge (n<10, n%10!=0, ties)."""

    @pytest.mark.parametrize("n", [1, 7, 10, 23, 100, 101])
    def test_matches_builtin_ntile(self, spark, n):
        from pyspark.sql import Window

        from fantasy_premier_league_spark.operators.rank import global_ntile

        rows = [(i, (i * 7) % 13) for i in range(n)]  # ties in score
        df = spark.createDataFrame(rows, "rid int, score int").repartition(4)
        order = [F.desc("score"), F.asc("rid")]
        want = {
            r["rid"]: r["d"]
            for r in df.withColumn("d", F.ntile(10).over(Window.orderBy(*order))).collect()
        }
        got = {
            r["rid"]: r["d"]
            for r in global_ntile(df, order, 10, out="d").collect()
        }
        assert got == want


class TestSecondWaveInvariants:
    """Cross-operator invariants on the REAL sf0.001 corpus — relations
    that must hold between independently-implemented operators."""

    SF = "/root/testdata/sf0.001"

    def test_prefix_jaccard_equals_naive_on_real_corpus(self, spark):
        from fantasy_premier_league_spark.catalog import load
        from fantasy_premier_league_spark.operators import dedup as D
        from fantasy_premier_league_spark.operators.cache import (
            release_operator_caches,
        )

        docs = load(spark, self.SF, "documents")
        try:
            fast = sorted(
                map(tuple, D.prefix_filtered_jaccard_pairs(docs, "doc_id", "text", threshold=0.2).collect())
            )
            naive = sorted(
                map(tuple, D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.2).collect())
            )
            assert fast == naive and len(naive) > 0
        finally:
            release_operator_caches(blocking=True)

    def test_transition_probs_sum_to_one_per_state(self, spark):
        from fantasy_premier_league_spark.catalog import load
        from fantasy_premier_league_spark.operators.sessionize import (
            transition_matrix,
        )
        from pyspark.sql import functions as F

        ev = load(spark, self.SF, "events")
        sums = (
            transition_matrix(ev)
            .groupBy("from_state")
            .agg(F.sum("prob").alias("s"))
            .collect()
        )
        assert sums and all(abs(r["s"] - 1.0) < 1e-4 for r in sums)

    def test_growth_new_users_sum_to_distinct_users(self, spark):
        from fantasy_premier_league_spark.catalog import load
        from fantasy_premier_league_spark.operators.experiment import (
            growth_accounting,
        )
        from pyspark.sql import functions as F

        ev = load(spark, self.SF, "events")
        g = growth_accounting(ev)
        total_new = g.agg(F.sum("new_users")).collect()[0][0]
        distinct_users = ev.select("user_id").distinct().count()
        assert total_new == distinct_users
        last_cum = g.orderBy(F.col("day").desc()).first()["cumulative_users"]
        assert last_cum == distinct_users

    def test_also_bought_pairs_match_co_occurrence_edges(self, spark):
        from fantasy_premier_league_spark.catalog import load
        from fantasy_premier_league_spark.operators.graph import (
            also_bought_topk,
            co_occurrence_edges,
        )

        li = load(spark, self.SF, "lineitem")
        # every recommended pair must be a co-occurrence edge
        recs = also_bought_topk(li, "l_orderkey", "l_partkey", k=3).select(
            "item", "rec"
        )
        edges = co_occurrence_edges(li, "l_orderkey", "l_partkey")
        missing = recs.join(
            edges.withColumnsRenamed({"src": "item", "dst": "rec"}),
            ["item", "rec"],
            "left_anti",
        ).count()
        assert missing == 0

    def test_frequent_tokens_subset_of_value_counts(self, spark):
        from fantasy_premier_league_spark.catalog import load
        from fantasy_premier_league_spark.operators.dedup import words
        from fantasy_premier_league_spark.operators.selection import frequent_keys
        from pyspark.sql import functions as F

        docs = load(spark, self.SF, "documents")
        toks = docs.select(F.explode(words(F.col("text"))).alias("w")).filter(
            F.col("w") != ""
        )
        heavy = {
            r["key"]: r["cnt"]
            for r in frequent_keys(toks, "w", min_share=0.005).collect()
        }
        exact = {
            r["w"]: r["cnt"]
            for r in toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        n = sum(exact.values())
        expect = {k: c for k, c in exact.items() if c >= 0.005 * n}
        assert heavy == expect
