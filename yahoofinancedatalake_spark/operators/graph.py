"""Distributed graph analytics kernels.

Triangle counting uses the degree-ordered orientation (J. Cohen,
"Graph Twiddling in a MapReduce World", 2009; Suri & Vassilvitskii,
"Counting Triangles and the Curse of the Last Reducer", WWW 2011):
orient every undirected edge from its (degree, id)-smaller endpoint
to the larger one, enumerate wedges only at each edge's *apex* (two
out-edges), and close them against the canonical edge list. Every
triangle then has exactly one apex, so it is counted exactly once,
and the wedge count is bounded by O(m^{3/2}) independent of degree
skew — a hub of degree d contributes wedges only through its
LOW-degree neighbors, which is what kills the "curse of the last
reducer" on power-law graphs at 100 TB.

The PageRank power-iteration twin lives in
:mod:`yahoofinancedatalake_spark.queries.pack` (``pagerank_bipartite``)
and connected components in :mod:`..operators.dedup`; this module
holds the wedge-closing family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yahoofinancedatalake_spark.session import stage_boundary


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row triangle census of an undirected simple graph.

    ``edges``: one row per undirected edge, columns ``(a, b)`` with
    ``a < b`` and no duplicates (the caller's dedup responsibility —
    a DISTINCT upstream).

    Returns ``(n_nodes, n_edges, n_wedges, n_triangles,
    global_clustering)`` where ``n_wedges`` counts all length-2 paths
    (open or closed) from the degree sequence and
    ``global_clustering = 3·triangles / wedges`` (0 when wedge-free).

    Plan shape: degrees are one node-keyed aggregation; the
    orientation join attaches them to both endpoints (node-sized
    build side); wedge enumeration is a self-join of the oriented
    list on the apex key; closing is an equi-join against the
    canonical list on the (x, y) pair key. Every exchange is keyed —
    no broadcast of anything corpus-sized, no cross join.

    The edge list and degree table are ``localCheckpoint()``\\ ed
    (r13): ``e`` feeds SIX consumers (the degree union twice, the
    orientation join, the wedge-closing probe, the edge count) and
    ``deg`` three — un-materialized, Spark re-executed the caller's
    whole edge-construction subtree per consumer (measured on the
    ``triangle_count`` query: 56 parquet scans / 146 Exchanges in the
    final plan for a pipeline that needs one scan). Both frames are
    edge-/node-bounded.
    """
    e = edges.select(
        F.col("a").cast("long"), F.col("b").cast("long")
    ).transform(stage_boundary)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .transform(stage_boundary)
    )
    # Attach degrees to both endpoints, then orient small -> large by
    # (deg, id). Both joins shuffle on the node key; deg is node-sized.
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    ed = e.join(da, "a").join(db, "b")
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    # Wedges at the apex: pairs of out-neighbors, canonicalized x < y
    # so the closing probe matches the a < b edge list directly.
    o1 = oriented.select("src", F.col("dst").alias("x"))
    o2 = oriented.select("src", F.col("dst").alias("y"))
    wedges = o1.join(o2, "src").filter(F.col("x") < F.col("y"))
    closed = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
    )
    # Fold the three 1-row aggregates together through the pack's
    # data-derived constant-key EQUI-join convention (a bare crossJoin
    # of literals would plan as the BNLJ/Cartesian the plan suite
    # forbids).
    from yahoofinancedatalake_spark.queries.pack import _const_key  # noqa: PLC0415

    tri = closed.agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    ).withColumn("__k", _const_key(F.col("n_triangles")))
    base = (
        e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .withColumn("__k", _const_key(F.col("n_edges")))
        .join(
            F.broadcast(
                deg.agg(
                    F.count(F.lit(1)).cast("long").alias("n_nodes"),
                    F.sum(
                        F.col("deg").cast("long")
                        * (F.col("deg").cast("long") - F.lit(1))
                        / F.lit(2)
                    )
                    .cast("long")
                    .alias("n_wedges"),
                ).withColumn("__k", _const_key(F.col("n_nodes")))
            ),
            "__k",
        )
        .join(F.broadcast(tri), "__k")
        .drop("__k")
    )
    from yahoofinancedatalake_spark.functions.scalars import dround  # noqa: PLC0415

    return base.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        dround(
            F.when(
                F.col("n_wedges") > 0,
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("global_clustering"),
    )
