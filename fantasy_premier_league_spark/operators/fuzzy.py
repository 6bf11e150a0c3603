"""Fuzzy entity resolution (FPL ↔ FIFA player matching).

Reference semantics: etl/additional_fifa.py —
- position-compatibility blocking (:70-97, :174-190 `_subset_data`)
- name normalization lower + strip non-[a-z\\s] (:193-201)
- exact-match short-circuit before fuzzy scoring (:118-125 `wrap_func`)
- long-name match first; short-name only for players without a perfect
  long match (:127-150), best of the two (:144-146)
- score <= threshold → null match (:156-163); top-1 per player (:165-168)
- incremental: only players absent from the lookup table (:303-311)

Spark-first design (vs the reference's batched cross join, :314-340):

- **Blocking is an equi-join, not a filter**: the FIFA side explodes to one
  row per *compatible FPL position class* and joins on that class. The
  candidate space shrinks ~4x before any scoring, and Spark shuffles on a
  bounded key set (4 classes — salt the key with a hash suffix at scale,
  the classes are skewed).
- **The fuzzy scorer is the engine's one genuine pandas UDF** (SURVEY
  §2.12): Arrow-batched token_set_ratio. Exact matches short-circuit to 100
  JVM-side via ``F.when`` *before* the UDF, so Python only sees pairs that
  genuinely need edit-distance work — Catalyst cannot reorder around a UDF,
  so this ordering is authored deliberately (SURVEY §4).
- The reference's 500k-pair batching dissolves: partitions are the batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: FPL position class → compatible FIFA position tokens
#: (etl/additional_fifa.py:71-80 possibles sets)
POSITION_COMPAT: dict[str, frozenset[str]] = {
    "GKP": frozenset({"GK"}),
    "DEF": frozenset({"LCB", "RCB", "LB", "RB", "CB", "RWB", "LWB"}),
    "MID": frozenset({"RW", "LW", "CAM", "RCM", "CDM", "LDM", "RM", "LCM", "LM", "RDM", "RAM", "CM", "LAM"}),
    "FWD": frozenset({"ST", "CF", "LS", "RS", "RF", "LF"}),
}


def _indel_ratio(s1: str, s2: str) -> float:
    """rapidfuzz ``fuzz.ratio`` semantics: normalized InDel similarity
    ``100 * (1 - indel_dist / (len1 + len2))``, equivalently
    ``200 * LCS / (len1 + len2)`` (insert/delete cost 1, no
    substitutions). difflib's Ratcliff-Obershelp ratio is near but NOT
    equal to this on reordered tails, and the reference scores with
    rapidfuzz (etl/additional_fifa.py:111-155), so matching decisions at
    the threshold need the exact metric. Pure-Python two-row LCS DP —
    inputs are short normalized names, called only on the pairs the
    JVM exact-match short-circuit lets through."""
    if s1 == s2:
        return 100.0  # covers "" vs "" (rapidfuzz: 100)
    if not s1 or not s2:
        return 0.0
    prev = [0] * (len(s2) + 1)
    for c1 in s1:
        cur = [0]
        for j, c2 in enumerate(s2):
            cur.append(prev[j] + 1 if c1 == c2 else max(prev[j + 1], cur[j]))
        prev = cur
    return 200.0 * prev[-1] / (len(s1) + len(s2))


def token_set_ratio(a: str, b: str) -> float:
    """Token-set ratio with exact rapidfuzz numerics: compare sorted-token
    combinations of intersection and differences, take the max pairwise
    InDel similarity (0-100). Replays ``rapidfuzz.fuzz.token_set_ratio``
    on normalized names value-for-value (the reference's scorer,
    etl/additional_fifa.py:111-155)."""
    if a is None or b is None:
        return 0.0
    ta, tb = set(a.split()), set(b.split())
    if not ta or not tb:
        return 0.0
    inter = " ".join(sorted(ta & tb))
    d_a = " ".join(sorted(ta - tb))
    d_b = " ".join(sorted(tb - ta))
    t1 = f"{inter} {d_a}".strip()
    t2 = f"{inter} {d_b}".strip()
    best = 0.0
    for x, y in ((inter, t1), (inter, t2), (t1, t2)):
        if not x and not y:
            continue
        best = max(best, _indel_ratio(x, y))
    return round(best, 4)


@F.pandas_udf(T.DoubleType())
def token_set_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([token_set_ratio(x, y) for x, y in zip(a, b)], dtype="float64")


def token_sort_key(col: F.Column) -> F.Column:
    """Deduped, sorted, space-joined tokens — the canonical form both
    token-set scorers compare. Pure Column expression (whole-stage
    codegen). Splits on any whitespace run and drops empty tokens, so
    multi-space / leading-space inputs canonicalize identically; the
    engine-portable spelling is ``list_filter(regexp_split_to_array(x,
    '\\s+'), t -> t <> '')`` (used verbatim by the q20 oracle)."""
    toks = F.array_remove(F.split(col, r"\s+"), "")
    return F.array_join(F.array_sort(F.array_distinct(toks)), " ")


def token_sort_score(a: F.Column, b: F.Column) -> F.Column:
    """Levenshtein token-sort similarity 0-100, entirely JVM-side.

    ``100 * (1 - levenshtein(key_a, key_b) / max(len(key_a), len(key_b)))``
    over :func:`token_sort_key` forms — the scalable sibling of
    :func:`token_set_ratio`: same normalization (order- and dup-
    insensitive), but expressible in any SQL engine and free of the
    Python/Arrow hop, so it is the hot-path scorer at 100 TB; the pandas
    UDF stays for exact reference parity (difflib semantics).

    Two empty keys score 100 (vacuously identical) instead of dividing by
    zero; lengths and levenshtein count CHARACTERS on both engines (Spark
    ``length``/DuckDB ``length``, both character-based — never byte
    ``strlen``), so non-ASCII names score identically."""
    ka, kb = token_sort_key(a), token_sort_key(b)
    denom = F.greatest(F.length(ka), F.length(kb))
    return F.when(denom == 0, F.lit(100.0)).otherwise(
        F.round(100.0 * (1.0 - F.levenshtein(ka, kb) / denom), 2)
    )


def normalize_name(col: F.Column) -> F.Column:
    """lower + strip non-[a-z\\s] (additional_fifa.py:193-201)."""
    return F.regexp_replace(F.lower(col), r"[^a-z\s]", "")


def _fifa_blocked(fifa: DataFrame) -> DataFrame:
    """FIFA rows exploded to one row per compatible FPL position class —
    the blocking key (J9 as an equi-join)."""
    compat = F.array(
        *[
            F.when(
                F.arrays_overlap(
                    F.split(F.col("player_positions"), r",\s*"),
                    F.array(*[F.lit(t) for t in sorted(tokens)]),
                ),
                F.lit(cls),
            )
            for cls, tokens in POSITION_COMPAT.items()
        ]
    )
    return fifa.withColumn("position_name", F.explode(F.filter(compat, lambda x: x.isNotNull())))


def resolve_entities(
    fpl: DataFrame,
    fifa: DataFrame,
    *,
    threshold: float = 90.0,
    existing_lookup: DataFrame | None = None,
    n_salt: int | None = None,
) -> DataFrame:
    """Best FIFA match per FPL player.

    ``fpl``: (player_id, fpl_player_name, position_name)
    ``fifa``: (sofifa_id, fifa_name_short, fifa_name_long, player_positions)
    ``existing_lookup``: optional (player_id, ...) — players already matched
    are skipped (incremental anti-join J13).
    ``n_salt``: the blocking key has only 4 classes, so a shuffle join on
    it alone puts ~25% of all candidate scoring in ONE task. Passing
    ``n_salt`` routes the block join through ``skew.salted_join`` (left
    salted by player_id hash, right replicated) so each class spreads
    over ``n_salt`` tasks — the at-scale path when the FIFA side outgrows
    broadcast. Default ``None`` keeps the broadcast join (right side is
    dimension-sized in the reference pipeline).

    Returns (player_id, sofifa_id, match_best, fpl_player_name,
    fifa_name_short, fifa_name_long); unmatched players keep their row with
    null match columns (threshold semantics additional_fifa.py:156-163).
    """
    if existing_lookup is not None:
        fpl = fpl.join(existing_lookup.select("player_id"), "player_id", "left_anti")
    fpl_n = fpl.select(
        "player_id",
        normalize_name(F.col("fpl_player_name")).alias("fpl_player_name"),
        "position_name",
    )
    fifa_n = _fifa_blocked(fifa).select(
        "sofifa_id",
        normalize_name(F.col("fifa_name_short")).alias("fifa_name_short"),
        normalize_name(F.col("fifa_name_long")).alias("fifa_name_long"),
        "position_name",
    )
    if n_salt:
        from .skew import salted_join

        cand = salted_join(
            fpl_n, fifa_n, "position_name", n_salt=n_salt, left_disambiguator="player_id"
        )
    else:
        # FIFA side is dimension-sized here → broadcast (no shuffle at all)
        cand = fpl_n.join(F.broadcast(fifa_n), "position_name")

    exact_long = F.col("fpl_player_name") == F.col("fifa_name_long")
    match_long = F.when(exact_long, F.lit(100.0)).otherwise(
        token_set_ratio_udf("fpl_player_name", "fifa_name_long")
    )
    cand = cand.withColumn("match_long", match_long)
    complete = F.max("match_long").over(W.partitionBy("player_id")) == 100.0
    cand = cand.withColumn("complete", complete)
    exact_short = F.col("fpl_player_name") == F.col("fifa_name_short")
    match_short = (
        F.when(exact_short, F.lit(100.0))
        .when(F.col("complete"), F.lit(None).cast("double"))
        .otherwise(token_set_ratio_udf("fpl_player_name", "fifa_name_short"))
    )
    cand = cand.withColumn("match_short", match_short)
    cand = cand.withColumn("match_best", F.greatest("match_short", "match_long"))

    w = W.partitionBy("player_id").orderBy(
        F.desc_nulls_last("match_best"), F.asc_nulls_last("sofifa_id")
    )
    best = cand.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)

    passed = F.col("match_best") > threshold
    null_if_failed = lambda c, t: F.when(passed, F.col(c)).otherwise(F.lit(None).cast(t))  # noqa: E731
    return best.select(
        "player_id",
        null_if_failed("sofifa_id", "long").alias("sofifa_id"),
        null_if_failed("match_best", "double").alias("match_best"),
        "fpl_player_name",
        null_if_failed("fifa_name_short", "string").alias("fifa_name_short"),
        null_if_failed("fifa_name_long", "string").alias("fifa_name_long"),
    )
