"""Property-based tests (hypothesis) for the round-4 operators.

Each property is checked against a pure-Python reference on randomized
small inputs — the structural invariants that a fixed example can miss:
chunk windows must tile the token stream exactly, history runs must
partition the event stream with no adjacent equal states, the Morton key
must be a bijection, and mixture targets must conserve the corpus total.
Example budgets are small (Spark round-trip per example), deadline off.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


class TestChunkTokensProperties:
    @SETTINGS
    @given(
        n_tokens=st.integers(min_value=1, max_value=40),
        chunk=st.integers(min_value=1, max_value=12),
        data=st.data(),
    )
    def test_windows_tile_the_stream(self, spark, n_tokens, chunk, data):
        from fantasy_premier_league_spark.operators.curation import chunk_tokens

        stride = data.draw(st.integers(min_value=1, max_value=chunk))
        toks = [f"w{i}" for i in range(n_tokens)]
        df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
        out = sorted(
            chunk_tokens(df, "doc_id", "text", chunk_words=chunk, stride_words=stride).collect(),
            key=lambda r: r["chunk_id"],
        )
        # chunk ids are consecutive from 0
        assert [r["chunk_id"] for r in out] == list(range(len(out)))
        # every window matches the reference slice; the last reaches the end
        for r in out:
            start = r["chunk_id"] * stride
            assert r["chunk_text"].split(" ") == toks[start : start + chunk]
        last_start = out[-1]["chunk_id"] * stride
        assert last_start + chunk >= n_tokens
        # no trailing window that adds no new tokens (previous already covered)
        if len(out) > 1:
            assert (out[-2]["chunk_id"] * stride) + chunk < n_tokens


class TestCompressHistoryProperties:
    @SETTINGS
    @given(states=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=25))
    def test_runs_partition_the_stream(self, spark, states):
        import datetime as dt

        from fantasy_premier_league_spark.operators.curation import compress_history

        rows = [
            (i, 1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), s)
            for i, s in enumerate(states)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        out = sorted(
            compress_history(df, "user_id", "ts", "event_type", tiebreak_col="event_id").collect(),
            key=lambda r: r["run_seq"],
        )
        # run row counts partition the stream
        assert sum(r["n_rows"] for r in out) == len(states)
        # adjacent runs always differ (maximal runs)
        for a, b in zip(out, out[1:]):
            assert a["state"] != b["state"]
        # reconstructing the stream from runs reproduces the input
        rebuilt = [r["state"] for r in out for _ in range(r["n_rows"])]
        assert rebuilt == states
        # valid_to chains to the next run's valid_from; final run open
        for a, b in zip(out, out[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert out[-1]["valid_to"] is None


class TestZOrderProperties:
    @SETTINGS
    @given(
        pts=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1023),
                st.integers(min_value=0, max_value=1023),
            ),
            min_size=1,
            max_size=30,
            unique=True,
        )
    )
    def test_morton_key_is_a_bijection(self, spark, pts):
        from pyspark.sql import functions as F

        from fantasy_premier_league_spark.sources.warehouse import zorder_key

        df = spark.createDataFrame(pts, "x long, y long")
        rows = df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), bits=10).alias("z")
        ).collect()

        def deinterleave(z):
            x = y = 0
            for i in range(10):
                x |= ((z >> (2 * i)) & 1) << i
                y |= ((z >> (2 * i + 1)) & 1) << i
            return x, y

        for r in rows:
            assert deinterleave(r["z"]) == (r["x"], r["y"])


class TestTemperatureMixProperties:
    @SETTINGS
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=5),
        alpha=st.sampled_from([0.0, 0.3, 0.5, 0.7, 1.0]),
    )
    def test_targets_conserve_total(self, spark, sizes, alpha):
        from fantasy_premier_league_spark.operators.curation import temperature_mix_rates

        rows = [(j, "x", f"s{i}") for i, n in enumerate(sizes) for j in range(n)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = temperature_mix_rates(df, ["source"], alpha=alpha).collect()
        total = sum(sizes)
        # target corpus size is conserved across groups (up to 6dp rounding)
        assert sum(r["target_n"] for r in out) == pytest.approx(total, abs=1e-4 * len(sizes))
        for r in out:
            assert 0 < r["sample_rate"] <= 1.0
            assert r["expected_n"] <= r["n_docs"] + 1e-9
