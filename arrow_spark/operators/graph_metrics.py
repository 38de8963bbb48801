"""Whole-graph structure metrics: degree assortativity and
common-neighbor (Jaccard) link prediction.

Both run over the undirected simple graph induced by an (src, dst)
edge frame (orientation-normalized, self-loops dropped). Reference
anchor: the reference has no graph kernels at all — these extend the
repo's relational graph family (pagerank/kcore/ktruss/triangles) with
the two standard structure queries a 100 TB interaction graph needs.

Scale shape: everything is degree-join + group-by — candidate pairs
for link prediction come from the 2-hop wedge equi-join on the shared
neighbor (never all-pairs), exactly the triangle-enumeration join
ktruss already uses; top-k cuts via orderBy().limit(k) →
TakeOrderedAndProject. Assortativity folds the edge frame into five
BIGINT moment sums (integer, order-free) and spends one fixed
double tree (two sqrt, one division) at the end — hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "undirected_edges",
    "degree_assortativity",
    "jaccard_link_prediction",
    "reciprocity",
]


def undirected_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Orientation-normalized distinct simple edges (u < v)."""
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    return (
        edges.select(u, v)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over directed edge stubs (each
    undirected edge contributes both orientations, making the moment
    sums symmetric) → one row (n_edges, m_stubs, r).

    All five moment sums are BIGINT (deg ≤ n_nodes, products bounded
    by deg²·stubs); r = (m·Sxy − Sx·Sy) / (sqrt(m·Sxx − Sx²) ·
    sqrt(m·Syy − Sy²)) is a fixed double tree — bit-exact."""
    und = undirected_edges(edges)
    deg = _degrees(und)
    stubs = und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    joined = (
        stubs.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "dx"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dy"), "v")
    )
    sums = joined.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    # a regular graph (zero degree variance — e.g. the complete graph)
    # has undefined assortativity: NULL, not a division error
    r = F.when(
        (vx == 0) | (vy == 0), F.lit(None).cast("double")
    ).otherwise(num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))))
    return sums.select(
        (F.col("m") / F.lit(2)).cast("long").alias("n_edges"),
        F.col("m").alias("m_stubs"),
        r.alias("assortativity"),
    )


def jaccard_link_prediction(edges: DataFrame, k: int = 20) -> DataFrame:
    """Top-k non-adjacent node pairs by neighbor-set Jaccard
    similarity → (x, y, common, deg_x, deg_y, jaccard).

    Candidates come from the wedge equi-join (two adjacency copies
    joined on the shared neighbor, x < y) — pair volume is Σ_n deg(n)²,
    the triangle-join bound, never |V|². Existing edges are removed
    with a left-anti join; jaccard = common / (deg_x + deg_y − common)
    is one division over BIGINTs; ties order by (x, y) so the k-cut is
    deterministic."""
    und = undirected_edges(edges)
    deg = _degrees(und)
    adj = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    wedges = (
        adj.select(F.col("nbr").alias("shared"), F.col("node").alias("x"))
        .join(
            adj.select(F.col("nbr").alias("shared"), F.col("node").alias("y")),
            "shared",
        )
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    candidates = wedges.join(
        und,
        (wedges["x"] == und["u"]) & (wedges["y"] == und["v"]),
        "left_anti",
    )
    scored = (
        candidates.join(deg.withColumnRenamed("node", "x").withColumnRenamed("deg", "deg_x"), "x")
        .join(deg.withColumnRenamed("node", "y").withColumnRenamed("deg", "deg_y"), "y")
        .select(
            "x",
            "y",
            "common",
            "deg_x",
            "deg_y",
            (
                F.col("common").cast("double")
                / (F.col("deg_x") + F.col("deg_y") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), F.col("x").asc(), F.col("y").asc()
    ).limit(k)


def reciprocity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Edge reciprocity of a directed graph: one row
    (n_edges, n_recip, reciprocity) — the fraction of non-loop edges
    whose reverse edge also exists (Newman §7.9). Reciprocity 1 means
    the graph is effectively undirected and the cheaper undirected
    algorithms apply.

    One self-equi-join of the (deduplicated) edge frame on the
    reversed key pair plus two scalar counts; the ratio is an
    exact-integer division. Cost is edge-frame-sized — at any corpus
    scale the transition edge frame is aggregate-sized (≤ node pairs),
    so this never touches the raw events."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    b = e.select(F.col("s").alias("bs"), F.col("d").alias("bd"))
    recip = e.join(b, (F.col("s") == F.col("bd")) & (F.col("d") == F.col("bs"))).agg(
        F.count(F.lit(1)).cast("long").alias("n_recip")
    )
    cnt = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    # an edgeless graph leaves reciprocity undefined: NULL, never an
    # ANSI /0 error (DuckDB's double /0 is NULL too)
    ratio = F.when(F.col("n_edges") == 0, F.lit(None).cast("double")).otherwise(
        F.col("n_recip").cast("double") / F.col("n_edges").cast("double")
    )
    return cnt.crossJoin(F.broadcast(recip)).select(
        "n_edges", "n_recip", ratio.alias("reciprocity")
    )
