"""Distributed graph operators over document-link graphs.

Complements the near-dup connected components (extensions/dedup.py:
connected_dedup_clusters — pointer doubling) with importance scoring:
an integer-exact PageRank power iteration. Link-graph signals rank
crawl frontiers and weight training documents (a page every site
links to is worth more than an orphan); the fixed-point arithmetic
here makes each iteration's scores bit-identical across engines, so
the whole iterative computation can be oracle-gated, not just its row
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_integer(nodes: DataFrame, edges: DataFrame,
                     id_col: str = "id", src_col: str = "src",
                     dst_col: str = "dst", n_iter: int = 3,
                     scale: int = 1_000_000) -> DataFrame:
    """PageRank power iteration in pure bigint fixed-point arithmetic
    (scores in micro-units, damping 0.85 as the exact rational 850/1000,
    per-edge contribution ``score div outdeg``). Floating-point PageRank
    cannot be value-compared across engines — summation order changes
    the last ulps; this formulation floors at the same two points every
    implementation must, so iteration k's scores are bit-identical
    everywhere at any scale.

    Per iteration: one join of the (static) out-degree-annotated edge
    frame to the current scores keyed on the SOURCE — co-partitioned
    after the first iteration since both sides hash on the same key —
    one shuffle summing contributions by destination, and a left join
    back to the node set (dangling-score redistribution is omitted; the
    synthetic-graph queries guarantee min outdegree 1, and a caller
    with dangling nodes adds the standard uniform term). The scores
    frame is lazily localCheckpointed per iteration — constant plan
    depth, the cluster-canonical pattern. Driver holds nothing.

    Returns (id_col, score) after ``n_iter`` iterations with every
    node initialized to ``scale``.
    """
    deg = edges.groupBy(src_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_outdeg"))
    e = (edges.join(deg, src_col)
         .select(F.col(src_col), F.col(dst_col), "_outdeg")
         .localCheckpoint(eager=False))
    base = (scale * 150) // 1000
    scores = nodes.select(F.col(id_col),
                          F.lit(scale).cast("bigint").alias("score"))
    for _ in range(n_iter):
        contrib = (e.join(scores, e[src_col] == scores[id_col])
                   .select(F.col(dst_col).alias("_to"),
                           F.expr("score div _outdeg").alias("_c")))
        incoming = (contrib.groupBy("_to")
                    .agg(F.sum("_c").cast("bigint").alias("_in")))
        scores = (nodes.select(id_col)
                  .join(incoming, nodes[id_col] == incoming["_to"], "left")
                  .select(F.col(id_col),
                          (F.lit(base).cast("bigint")
                           + F.expr("850 * coalesce(_in, 0L) div 1000"))
                          .alias("score"))
                  .localCheckpoint(eager=False))
    return scores


def triangle_count(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Exact triangle counting on an undirected graph via the
    degree-ordered node-iterator: orient every edge from the
    lower-(degree, id) endpoint to the higher, join the oriented edge
    list with itself on the source to enumerate wedges (u→v, u→w with
    v < w in the same order), and close each wedge against the
    oriented edge set. Degree orientation is what makes this scale: a
    hub of degree d contributes wedges only for its ~sqrt-bounded
    lower-ordered neighbors, so the wedge count is O(m^1.5) worst-case
    instead of Σd² — the standard distributed formulation.

    Input edges may be directed/duplicated; they are symmetrized and
    de-duplicated first. Returns a single row (n_triangles bigint).

    Shuffles: degree groupBy, two joins keyed on endpoint ids, the
    wedge-close join on the (v, w) pair — all equi-joins on id keys,
    AQE-skew-splittable; no window over a hub's neighborhood."""
    e = (edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
         .filter(F.col("a") != F.col("b")))
    und = (e.select("a", "b")
           .unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
           .distinct()
           .localCheckpoint(eager=False))
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # total order: (degree, id) — ties broken by id, so orientation is
    # deterministic and every undirected edge appears exactly once.
    da = deg.select(F.col("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("a").alias("b"), F.col("deg").alias("degb"))
    oriented = (und.join(da, "a").join(db, "b")
                .filter((F.col("dega") < F.col("degb"))
                        | ((F.col("dega") == F.col("degb"))
                           & (F.col("a") < F.col("b"))))
                .select("a", "b")
                .localCheckpoint(eager=False))
    w1 = oriented.select(F.col("a").alias("u"), F.col("b").alias("v"))
    w2 = oriented.select(F.col("a").alias("u"), F.col("b").alias("w"))
    wedges = (w1.join(w2, "u").filter(F.col("v") < F.col("w")))
    closed = wedges.join(
        oriented.select(F.col("a").alias("v"), F.col("b").alias("w"))
                .unionByName(
                    oriented.select(F.col("b").alias("v"),
                                    F.col("a").alias("w"))),
        ["v", "w"])
    return closed.agg(F.count(F.lit(1)).cast("long")
                      .alias("n_triangles"))


def label_propagation_majority(nodes: DataFrame, edges: DataFrame,
                               id_col: str = "id", src_col: str = "src",
                               dst_col: str = "dst",
                               n_iter: int = 2) -> DataFrame:
    """Synchronous majority label propagation (community detection):
    every node starts as its own label; each round every node adopts
    the most frequent label among its (symmetrized) neighbors, ties
    broken by the SMALLER label — a deterministic total order, so the
    whole iterative computation is value-reproducible and oracle-
    gatable (LPA's usual random tie-break makes runs incomparable).

    Per round: one join of the static symmetric edge list to current
    labels (both keyed on the node id — co-partitioned after round 1),
    a (node, label) count, and a count-desc/label-asc argmax window
    over per-node label counts (group width bounded by the node's
    degree). Labels are lazily localCheckpointed per round — constant
    plan depth, same pattern as pagerank_integer. Isolated nodes keep
    their own label."""
    from pyspark.sql import Window

    # Self-loops filtered AFTER symmetrizing — filtering only the
    # forward branch let a (v, v) edge re-enter through the reversed
    # branch, and the node then voted for its own label (the SQL twin
    # _lpa_oracle_sql drops a = b before the union, so both engines
    # now agree on self-loop graphs).
    und = (edges.select(F.col(src_col).alias("a"),
                        F.col(dst_col).alias("b"))
           .unionByName(
               edges.select(F.col(dst_col).alias("a"),
                            F.col(src_col).alias("b")))
           .filter(F.col("a") != F.col("b"))
           .distinct()
           .localCheckpoint(eager=False))
    labels = nodes.select(F.col(id_col).alias("nid"),
                          F.col(id_col).alias("label"))
    for _ in range(n_iter):
        neigh = (und.join(labels.withColumnRenamed("nid", "b"), "b")
                 .select(F.col("a").alias("nid"), "label"))
        cnt = (neigh.groupBy("nid", "label")
               .agg(F.count(F.lit(1)).alias("c")))
        w = (Window.partitionBy("nid")
             .orderBy(F.desc("c"), F.asc("label")))
        picked = (cnt.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1)
                  .select("nid", "label"))
        labels = (labels.select("nid")
                  .join(picked, "nid", "left")
                  .withColumn("label",
                              F.coalesce("label", F.col("nid")))
                  .localCheckpoint(eager=False))
    return labels.select(F.col("nid").alias(id_col), "label")
