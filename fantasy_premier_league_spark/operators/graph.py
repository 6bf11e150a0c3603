"""Distributed graph operators: fixed-iteration PageRank.

Complements the connected-components family (operators/dedup.py — min-label
propagation and pointer jumping for dedup clusters) with the other classic
iterative graph computation. PageRank here is the *showcase shape* for any
fixed-point linear iteration on Spark:

- the edge list is the only big table; it shuffles ONCE onto the source key
  and is persisted, so every iteration's contribution join reuses the same
  partitioning (Catalyst reuses the exchange; no per-round re-shuffle of
  the edges),
- the rank vector is nodes-sized (orders of magnitude smaller than edges);
  each iteration is one shuffle-on-key hash join + one groupBy with
  map-side partial aggregation,
- iteration count is FIXED (power iteration with known convergence rate),
  so the plan is a finite unrolled chain — no driver-side convergence test
  collecting data per round. For deep iteration counts, cut lineage with
  localCheckpoint the same way dedup's label propagation does
  (operators/dedup.py).

A 100 TB edge list distributes on the src key; skewed hubs are the
documented salting case (operators/skew.py) — the contribution of a hub is
a sum, so it salts cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tracked_persist


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Handles the full standard semantics on ANY edge list, not just
    symmetric co-occurrence graphs: the rank vector is keyed on the
    complete node set (sources ∪ sinks, rebuilt via left join every
    round, so a node with no in-edges never drops out of the vector),
    and the mass held by dangling nodes (no out-edges) is redistributed
    uniformly each round — total rank mass stays 1 instead of leaking.
    On a symmetric graph both corrections are exact no-ops, so the q48
    oracle's unrolled CTEs replay the same values. Returns (node, rank)
    with rank rounded to 6 dp (engine-portable: the rounding absorbs
    float-sum ordering differences across engines).
    """
    from pyspark.sql import Window as W

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # fold the out-degree into the edge list ONCE via a src-partitioned
    # window (one shuffle — a separate deg aggregate + re-join would
    # shuffle the full edge list twice) and persist: every iteration's
    # contribution join then touches only (edges+deg) x ranks — one
    # shuffle join + one partial-agg groupBy per round. Tracked: release
    # via operators.cache.release_operator_caches after consumption.
    ed = tracked_persist(
        e.withColumn("deg", F.count(F.lit(1)).over(W.partitionBy("src")))
    )
    out_deg = ed.groupBy("src").agg(F.first("deg").alias("deg"))
    # complete node set = sources (out_deg, a partial agg over the cached
    # edges) FULL OUTER sink-only ids; deg stays null for dangling nodes.
    # One distinct over the dst column — cheaper than distinct over the
    # unioned src+dst stream
    node_set = out_deg.withColumnRenamed("src", "node").join(
        e.select(F.col("dst").alias("node")).distinct(), "node", "full_outer"
    )
    n_total = node_set.agg(F.count(F.lit(1)).alias("__n"))
    # nodes-sized and reused by three consumers every round → persist
    nodes = tracked_persist(node_set.crossJoin(F.broadcast(n_total)))
    # one tiny probe against the persisted nodes frame: co-occurrence and
    # other symmetric graphs have NO dangling nodes, so the per-round
    # dangling-mass subtree (a join + scalar agg unrolled per iteration)
    # would be pure plan weight — skip it unless it can matter
    has_dangling = nodes.filter(F.col("deg").isNull()).limit(1).count() > 0
    ranks = nodes.select("node", (F.lit(1.0) / F.col("__n")).alias("rank"))
    for i in range(int(iterations)):
        contrib = ed.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
        inmass = (
            contrib.groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("__in"))
            .withColumnRenamed("dst", "node")
        )
        stepped = nodes.join(inmass, "node", "left")
        in_term = F.coalesce(F.col("__in"), F.lit(0.0))
        if has_dangling:
            # dangling nodes hold rank but emit no contributions: spread
            # their mass uniformly (standard PageRank), as a 1-row
            # broadcast — no driver-side action inside the loop, the plan
            # stays a finite unrolled chain
            dmass = ranks.join(
                nodes.filter(F.col("deg").isNull()).select("node"), "node"
            ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
            stepped = stepped.crossJoin(F.broadcast(dmass))
            in_term = in_term + F.col("__dm") / F.col("__n")
        ranks = stepped.select(
            "node",
            (
                (F.lit(1.0) - F.lit(damping)) / F.col("__n") + F.lit(damping) * in_term
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            # deep iteration chains blow up the lineage/plan; cut it the
            # same way dedup's label propagation does
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def co_occurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
) -> DataFrame:
    """Distinct directed co-occurrence edges: (a, b) whenever items a != b
    share a group (symmetric — both directions emitted). The standard
    market-basket graph builder: a self-join on the group key, fan-out
    bounded by the square of the (small) per-group item count.
    """
    a = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("src")).distinct()
    b = a.select("__g", F.col("src").alias("dst"))
    return (
        a.join(b, "__g")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def triangle_stats(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact triangle count + global clustering coefficient, by
    degree-ordered edge orientation (the canonical distributed algorithm:
    Suri & Vassilvitskii's MR version / GraphX's formulation).

    Every undirected edge is oriented from its (degree, id)-smaller
    endpoint to the larger; a triangle {a,b,c} then materializes exactly
    once as the wedge a→b, a→c closed by b→c. The orientation is what
    makes this scale: wedge generation is keyed on the LOW-degree
    endpoint, so a hub of degree d contributes O(sqrt-bounded) oriented
    out-edges instead of O(d^2) wedges — the join fan-out is bounded by
    the arboricity, not the max degree.

    Returns ONE row: ``n_nodes, n_edges, n_wedges, n_triangles,
    clustering`` (= 3·triangles / wedges, null on a wedgeless graph).
    Accepts directed/symmetric/duplicated edge lists — normalized via
    least/greatest + distinct.
    """
    u, v = F.least(F.col(src_col), F.col(dst_col)), F.greatest(
        F.col(src_col), F.col(dst_col)
    )
    und = (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e2 = (
        und.join(deg.withColumnsRenamed({"node": "u", "d": "du"}), "u")
        .join(deg.withColumnsRenamed({"node": "v", "d": "dv"}), "v")
    )
    lower_first = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    o = e2.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("deg_b"),
    )
    o1 = o.select("a", F.col("b").alias("b1"), F.col("deg_b").alias("d1"))
    o2 = o.select("a", F.col("b").alias("b2"), F.col("deg_b").alias("d2"))
    wedges = o1.join(o2, "a").filter(
        F.struct(F.col("d1"), F.col("b1")) < F.struct(F.col("d2"), F.col("b2"))
    )
    closing = o.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    tri = wedges.join(closing, ["b1", "b2"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("n_wedges"),
    ).crossJoin(und.agg(F.count(F.lit(1)).alias("n_edges")))
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(F.col("n_wedges") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6)
        )
        .alias("clustering"),
    )


def label_propagation(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Synchronous label propagation (community detection) over a directed
    edge list, with a fully deterministic tie-break.

    Standard LPA is notoriously non-deterministic (random visit order,
    random tie-breaks); this is the *reproducible* formulation suitable
    for an oracle-checked pipeline: every node starts with its own id as
    its label, and each round simultaneously adopts the most frequent
    label among its in-neighbors, ties broken by the SMALLEST label.
    Nodes with no in-neighbors keep their current label (the node set is
    sources ∪ sinks, so asymmetric edge lists don't silently drop the
    rank of no-in-edge nodes — same contract as :func:`pagerank`).

    Plan shape per round — the same fixed-point skeleton as pagerank:
    the edge list shuffles once onto dst and is persisted (tracked;
    release via operators.cache.release_operator_caches); each round is
    one hash join of edges x labels (nodes-sized), one partial-agg
    groupBy on (node, label), one node-keyed window for the argmax, and
    one left join back onto the persisted node set. Iteration count is
    fixed (the plan is a finite unrolled chain); deep runs cut lineage
    with localCheckpoint every ``checkpoint_every`` rounds. A 100 TB
    edge list distributes on dst; hub skew salts cleanly because the
    per-label count is a sum (operators/skew.py).

    Returns (node, label). Reference analogue: community grouping of the
    co-occurrence graphs the reference builds pairwise in pandas.
    """
    from pyspark.sql import Window as W

    e = tracked_persist(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    )
    nodes = tracked_persist(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for i in range(int(iterations)):
        nbr = e.join(
            labels.select(F.col("node").alias("src"), "label"), "src"
        )
        counts = nbr.groupBy(F.col("dst").alias("node"), "label").agg(
            F.count(F.lit(1)).alias("__n")
        )
        w = W.partitionBy("node").orderBy(F.col("__n").desc(), F.col("label").asc())
        picked = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", F.col("label").alias("__new"))
        )
        labels = labels.join(picked, "node", "left").select(
            "node", F.coalesce(F.col("__new"), F.col("label")).alias("label")
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < int(iterations):
            labels = labels.localCheckpoint()
    return labels


def also_bought_topk(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    k: int = 3,
) -> DataFrame:
    """Weighted co-visitation recommender: for every item, the top-k
    other items most often sharing a group (order/basket/session),
    ranked by shared-group count with a deterministic (count desc, item
    asc) tie-break — "customers who bought X also bought Y", the
    workhorse item-item candidate generator.

    The co-occurrence self-join is keyed on the group (fan-out bounded
    by per-group item count squared, like :func:`co_occurrence_edges`
    but keeping the weight); the pair aggregate shuffles on the pair
    key; the final top-k is one item-keyed window. A viral basket
    (thousands of items in one group) is the quadratic hazard — the same
    per-group cap discipline as the LSH bucket guard applies upstream
    when baskets are unbounded.

    Returns (item, rec, n_shared, rank), rank 1..k.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("item")
    ).distinct()
    other = base.select("__g", F.col("item").alias("rec"))
    pairs = (
        base.join(other, "__g")
        .filter(F.col("item") != F.col("rec"))
        .groupBy("item", "rec")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    w = W.partitionBy("item").orderBy(F.col("n_shared").desc(), F.col("rec").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("item", "rec", "n_shared", "rank")
    )
