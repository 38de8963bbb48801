"""Oracle-checked query for the relational PageRank operator
(`operators/pagerank.py`): the click-transition graph of the events
fixture (consecutive `props.k` visits per user) ranked with 5
synchronous iterations.

The oracle UNROLLS the iteration into five chained CTEs — an iterative
algorithm hash-checked end to end because both engines snap every
iteration's ranks to 1e-9, making the per-round inputs bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query

_N_ITERS = 5

_BASE = """
WITH ev AS (
  SELECT user_id, event_id, CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
),
trans AS (
  SELECT k, lag(k) OVER (PARTITION BY user_id ORDER BY event_id) AS pk
  FROM ev
),
edges AS (
  SELECT pk AS src, k AS dst, CAST(count(*) AS DOUBLE) AS w
  FROM trans WHERE pk IS NOT NULL GROUP BY pk, k
),
nodes AS (
  SELECT DISTINCT src AS n FROM edges
  UNION SELECT DISTINCT dst AS n FROM edges
),
cnt AS (SELECT count(*) AS c FROM nodes),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
r0 AS (SELECT n, 1.0 / cnt.c AS r FROM nodes, cnt)"""

_ITER = """,
r{i} AS (
  SELECT nodes.n,
         floor(((1 - 0.85) / cnt.c
                + 0.85 * (coalesce(contrib.s, 0) + dang.d / cnt.c)) * 1e9 + 0.5)
           / 1e9 AS r
  FROM nodes
  CROSS JOIN cnt
  CROSS JOIN (SELECT coalesce(sum(r), 0) AS d FROM r{p}
              WHERE n NOT IN (SELECT src FROM edges)) dang
  LEFT JOIN (
    SELECT e.dst, sum(r{p}.r * e.w / o.ow) AS s
    FROM edges e
    JOIN r{p} ON e.src = r{p}.n
    JOIN outw o ON o.src = e.src
    GROUP BY e.dst
  ) contrib ON contrib.dst = nodes.n
)"""

PAGERANK_ORACLE = (
    _BASE
    + "".join(_ITER.format(i=i, p=i - 1) for i in range(1, _N_ITERS + 1))
    + f"\nSELECT n AS node, r AS rank FROM r{_N_ITERS}"
)


@query("graph_pagerank", oracle=PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the per-user click-transition graph; 5
    iterations, damping 0.85, dangling mass redistributed — every
    iteration a 2-shuffle relational step, ranks snapped to 1e-9 so the
    unrolled-CTE oracle hash-matches."""
    from arrow_spark.operators.pagerank import pagerank, transition_edges

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    edges = transition_edges(ev, node_col="k", partition_col="user_id", order_col="event_id")
    return pagerank(edges, n_iters=_N_ITERS, damping=0.85)


TRIANGLES_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS (
  SELECT DISTINCT a.p AS a, b.p AS b
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
), t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT v, count(*) AS n_triangles
FROM (SELECT x AS v FROM t UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t)
GROUP BY v
"""


@query("graph_triangles", oracle=TRIANGLES_ORACLE)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """per-vertex triangle counts of the co-purchase graph (parts
    co-occurring in an order) — the clustering-coefficient numerator.
    The engine runs the degree-ORIENTED two-join scheme
    (operators/triangles.py: oriented out-degree O(sqrt(E)) even at
    celebrity hubs); the oracle is the naive canonical three-way
    self-join — genuinely different algebra, so the hash match proves
    the orientation loses/duplicates no triangle."""
    from arrow_spark.operators.triangles import count_triangles

    l = table(spark, sf_dir, "lineitem")
    edges = (
        l.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .alias("x")
        .join(
            l.select(
                F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("q")
            ).distinct().alias("y"),
            "o",
        )
        .where(F.col("p") < F.col("q"))
        .select(F.col("p").alias("a"), F.col("q").alias("b"))
    )
    return count_triangles(edges, per_vertex=True)


_LPA_ITERS = 4

_LPA_BASE = """
WITH ev AS (
  SELECT user_id, event_id, CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
),
trans AS (
  SELECT k, lag(k) OVER (PARTITION BY user_id ORDER BY event_id) AS pk
  FROM ev
),
edges AS (
  SELECT pk AS src, k AS dst, CAST(count(*) AS BIGINT) AS w
  FROM trans WHERE pk IS NOT NULL GROUP BY pk, k
),
und AS (
  SELECT src AS u, dst AS v, w FROM edges
  UNION ALL
  SELECT dst AS u, src AS v, w FROM edges
),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM und)"""

_LPA_ITER = """,
v{i} AS (
  SELECT und.u AS node, l.label, sum(und.w) AS s
  FROM und JOIN l{p} l ON und.v = l.node
  GROUP BY 1, 2
),
l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY s DESC, label ASC) AS rn
    FROM v{i}
  ) WHERE rn = 1
)"""

LPA_ORACLE = (
    _LPA_BASE
    + "".join(_LPA_ITER.format(i=i, p=i - 1) for i in range(1, _LPA_ITERS + 1))
    + f"\nSELECT node, label FROM l{_LPA_ITERS}"
)


@query("graph_label_propagation", oracle=LPA_ORACLE)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007,
    deterministic variant: weight-argmax with smallest-label ties) over
    the undirected click-transition graph, 4 rounds. Labels and weights
    are integers — no float exists anywhere — so the unrolled 4-round
    CTE replay is bit-exact by construction; each round is the same
    2-shuffle join+argmax shape as pagerank."""
    from arrow_spark.operators.labelprop import label_propagation
    from arrow_spark.operators.pagerank import transition_edges

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    edges = transition_edges(
        ev, node_col="k", partition_col="user_id", order_col="event_id"
    )
    return label_propagation(edges, n_iters=_LPA_ITERS)


_SP_ITERS = 3

_SP_BASE = """
WITH ev AS (
  SELECT user_id, event_id, CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
),
trans AS (
  SELECT k, lag(k) OVER (PARTITION BY user_id ORDER BY event_id) AS pk
  FROM ev
),
edges AS (
  SELECT pk AS src, k AS dst FROM trans WHERE pk IS NOT NULL GROUP BY pk, k
),
und AS (
  SELECT src AS u, dst AS v FROM edges
  UNION ALL
  SELECT dst AS u, src AS v FROM edges
),
s0 AS (
  SELECT DISTINCT CAST(u AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
  FROM und WHERE u % 17 = 0
)"""

_SP_ITER = """,
s{i} AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM s{p}
    UNION ALL
    SELECT CAST(und.v AS BIGINT) AS node, s{p}.dist + 1 AS dist
    FROM s{p} JOIN und ON und.u = s{p}.node
  ) GROUP BY node
)"""

SHORTEST_PATHS_ORACLE = (
    _SP_BASE
    + "".join(_SP_ITER.format(i=i, p=i - 1) for i in range(1, _SP_ITERS + 1))
    + f"\nSELECT node, dist AS hops FROM s{_SP_ITERS}"
)


@query("graph_shortest_paths", oracle=SHORTEST_PATHS_ORACLE)
def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance over the undirected click-transition
    graph (sources: every node ≡ 0 mod 17), 3 relaxation rounds —
    Bellman-Ford supersteps as join+group-min relational rounds
    (operators/shortest_paths.py). Hops are integers, so the unrolled
    3-round CTE replay is bit-exact by construction; unreachable nodes
    are absent, never NULL-padded."""
    from arrow_spark.operators.pagerank import transition_edges
    from arrow_spark.operators.shortest_paths import shortest_paths

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    edges = transition_edges(
        ev, node_col="k", partition_col="user_id", order_col="event_id"
    ).select("src", "dst")
    sources = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    ).where(F.col("node") % 17 == 0)
    return (
        shortest_paths(edges, sources, n_iters=_SP_ITERS, directed=False)
        .select("node", F.col("dist").alias("hops"))
    )


_KCORE_K = 4
_KCORE_ROUNDS = 5

_KCORE_BASE = """
WITH ev AS (
  SELECT user_id, event_id, CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
),
trans AS (
  SELECT k, lag(k) OVER (PARTITION BY user_id ORDER BY event_id) AS pk
  FROM ev
),
raw AS (
  SELECT least(pk, k) AS lo, greatest(pk, k) AS hi
  FROM trans WHERE pk IS NOT NULL AND pk <> k
),
e0 AS MATERIALIZED (
  SELECT lo, hi FROM (
    SELECT lo, hi, count(*) AS w FROM raw GROUP BY lo, hi
  ) WHERE w >= 5
)"""

_KCORE_ROUND = """,
d{i} AS MATERIALIZED (
  SELECT n, count(*) AS d
  FROM (SELECT lo AS n FROM e{p} UNION ALL SELECT hi FROM e{p})
  GROUP BY n
),
a{i} AS MATERIALIZED (SELECT n FROM d{i} WHERE d >= {k}),
e{i} AS MATERIALIZED (
  SELECT lo, hi FROM e{p}
  WHERE lo IN (SELECT n FROM a{i}) AND hi IN (SELECT n FROM a{i})
)"""

KCORE_ORACLE = (
    _KCORE_BASE
    + "".join(
        _KCORE_ROUND.format(i=i, p=i - 1, k=_KCORE_K)
        for i in range(1, _KCORE_ROUNDS + 1)
    )
    + f"""
SELECT n AS node, CAST(count(*) AS BIGINT) AS degree
FROM (SELECT lo AS n FROM e{_KCORE_ROUNDS}
      UNION ALL SELECT hi FROM e{_KCORE_ROUNDS})
GROUP BY n
"""
)


@query("graph_kcore", oracle=KCORE_ORACLE)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core of the click-transition graph (co-visit pairs seen ≥5
    times), peeled for 5 bounded rounds — each round one vertex-keyed
    degree aggregation + two broadcast semi-joins dropping edges of
    peeled vertices (operators/kcore.py); all-integer algebra makes the
    unrolled-round oracle bit-exact whether or not the peel has
    converged. Graph-cohesion member of the relational graph family
    (centrality / communities / distance / closure / cohesion)."""
    from pyspark.sql import Window as W

    from arrow_spark.operators.kcore import k_core

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    trans = ev.select(
        F.col("k"),
        F.lag("k").over(
            W.partitionBy("user_id").orderBy("event_id")
        ).alias("pk"),
    )
    # undirected occurrence counts BEFORE dedup: an edge is real only
    # if the co-visit pair was seen >= 5 times in either direction
    und = (
        trans.where(F.col("pk").isNotNull() & (F.col("pk") != F.col("k")))
        .select(
            F.least("pk", "k").alias("lo"), F.greatest("pk", "k").alias("hi")
        )
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 5)
        .select("lo", "hi")
    )
    return k_core(und, k=_KCORE_K, rounds=_KCORE_ROUNDS)


_KTRUSS_K = 3
_KTRUSS_ROUNDS = 2

_TRUSS_ROUND = """,
tri{i} AS MATERIALIZED (
  SELECT w1.lo AS u, w1.hi AS v, w2.hi AS w
  FROM e{p} w1
  JOIN e{p} w2 ON w1.lo = w2.lo AND w1.hi < w2.hi
  JOIN e{p} c ON c.lo = w1.hi AND c.hi = w2.hi
),
sup{i} AS MATERIALIZED (
  SELECT lo, hi, count(*) AS s FROM (
    SELECT u AS lo, v AS hi FROM tri{i}
    UNION ALL SELECT u, w FROM tri{i}
    UNION ALL SELECT v, w FROM tri{i}
  ) GROUP BY 1, 2
),
e{i} AS MATERIALIZED (
  SELECT e.lo, e.hi FROM e{p} e
  JOIN sup{i} s ON e.lo = s.lo AND e.hi = s.hi
  WHERE s.s >= {km2}
)"""

KTRUSS_ORACLE = (
    _KCORE_BASE
    + "".join(
        _TRUSS_ROUND.format(i=i, p=i - 1, km2=_KTRUSS_K - 2)
        for i in range(1, _KTRUSS_ROUNDS + 1)
    )
    + f""",
trif AS MATERIALIZED (
  SELECT w1.lo AS u, w1.hi AS v, w2.hi AS w
  FROM e{_KTRUSS_ROUNDS} w1
  JOIN e{_KTRUSS_ROUNDS} w2 ON w1.lo = w2.lo AND w1.hi < w2.hi
  JOIN e{_KTRUSS_ROUNDS} c ON c.lo = w1.hi AND c.hi = w2.hi
),
supf AS MATERIALIZED (
  SELECT lo, hi, CAST(count(*) AS BIGINT) AS s FROM (
    SELECT u AS lo, v AS hi FROM trif
    UNION ALL SELECT u, w FROM trif
    UNION ALL SELECT v, w FROM trif
  ) GROUP BY 1, 2
)
SELECT e.lo, e.hi, coalesce(supf.s, 0) AS support
FROM e{_KTRUSS_ROUNDS} e
LEFT JOIN supf ON e.lo = supf.lo AND e.hi = supf.hi
"""
)


@query("graph_ktruss", oracle=KTRUSS_ORACLE)
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss of the ≥5-count co-visit graph (every surviving edge in
    ≥1 triangle of the surviving subgraph), 2 bounded peel rounds —
    per round a triangle enumeration over canonical oriented edges (the
    count_triangles wedge shape, never all-pairs) credits each triangle
    to its 3 edges; support-filtered inner join drops weak edges
    (operators/ktruss.py). All-integer ⇒ the unrolled MATERIALIZED-CTE
    oracle is bit-exact. The community-backbone extractor beside
    k-core's vertex cohesion."""
    from pyspark.sql import Window as W

    from arrow_spark.operators.ktruss import k_truss

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    trans = ev.select(
        F.col("k"),
        F.lag("k").over(
            W.partitionBy("user_id").orderBy("event_id")
        ).alias("pk"),
    )
    und = (
        trans.where(F.col("pk").isNotNull() & (F.col("pk") != F.col("k")))
        .select(
            F.least("pk", "k").alias("lo"), F.greatest("pk", "k").alias("hi")
        )
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 5)
        .select("lo", "hi")
    )
    return k_truss(und, k=_KTRUSS_K, rounds=_KTRUSS_ROUNDS)


_PPR_ITERS = 3

_PPR_BASE = """
WITH ev AS (
  SELECT user_id, event_id, CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
),
trans AS (
  SELECT k, lag(k) OVER (PARTITION BY user_id ORDER BY event_id) AS pk
  FROM ev
),
edges AS (
  SELECT pk AS src, k AS dst, CAST(count(*) AS DOUBLE) AS w
  FROM trans WHERE pk IS NOT NULL GROUP BY pk, k
),
nodes AS (
  SELECT DISTINCT src AS n FROM edges
  UNION SELECT DISTINCT dst AS n FROM edges
),
flag AS (
  SELECT n, CASE WHEN n % 17 = 0 THEN 1 ELSE 0 END AS in_s FROM nodes
),
sc AS (SELECT CAST(sum(in_s) AS DOUBLE) AS sc FROM flag),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
r0 AS (SELECT n, in_s, in_s / sc.sc AS r FROM flag, sc)"""

_PPR_ITER = """,
r{i} AS (
  SELECT flag.n, flag.in_s,
         floor(((1 - 0.85) * flag.in_s / sc.sc
                + 0.85 * (coalesce(contrib.s, 0)
                          + dang.d * flag.in_s / sc.sc)) * 1e9 + 0.5)
           / 1e9 AS r
  FROM flag
  CROSS JOIN sc
  CROSS JOIN (SELECT coalesce(sum(r), 0) AS d FROM r{p}
              WHERE n NOT IN (SELECT src FROM edges)) dang
  LEFT JOIN (
    SELECT e.dst, sum(r{p}.r * e.w / o.ow) AS s
    FROM edges e
    JOIN r{p} ON e.src = r{p}.n
    JOIN outw o ON o.src = e.src
    GROUP BY e.dst
  ) contrib ON contrib.dst = flag.n
)"""

PPR_ORACLE = (
    _PPR_BASE
    + "".join(_PPR_ITER.format(i=i, p=i - 1) for i in range(1, _PPR_ITERS + 1))
    + f"\nSELECT n AS node, r AS rank FROM r{_PPR_ITERS}"
)


@query("graph_personalized_pagerank", oracle=PPR_ORACLE)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """personalized PageRank seeded at the k%17==0 click nodes — the
    teleport AND dangling mass return to the seed set only, ranking the
    graph by proximity to the seeds (the recommendation primitive);
    same 2-shuffle rounds, 1e-9 per-iteration snapping, and
    localCheckpoint cuts as the global walk (operators/pagerank.py::
    personalized_pagerank), so the 3-round unrolled-CTE oracle is
    bit-exact."""
    from pyspark.sql import Window as W

    from arrow_spark.operators.pagerank import (
        personalized_pagerank,
        transition_edges,
    )

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    edges = transition_edges(
        ev, node_col="k", partition_col="user_id", order_col="event_id"
    )
    nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select(F.col("dst").alias("n")))
        .distinct()
    )
    seeds = nodes.where(F.col("n") % 17 == 0)
    return personalized_pagerank(edges, seeds, n_iters=_PPR_ITERS)


_HITS_ITERS = 2

_HITS_BASE = """
WITH ev AS (
  SELECT user_id, event_id, CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
),
trans AS (
  SELECT k, lag(k) OVER (PARTITION BY user_id ORDER BY event_id) AS pk
  FROM ev
),
edges AS MATERIALIZED (
  SELECT DISTINCT pk AS src, k AS dst FROM trans WHERE pk IS NOT NULL
),
nodes AS MATERIALIZED (
  SELECT DISTINCT src AS n FROM edges
  UNION SELECT DISTINCT dst AS n FROM edges
),
cnt AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM nodes),
s0 AS MATERIALIZED (SELECT n, 1.0 / cnt.c AS a, 1.0 / cnt.c AS h FROM nodes, cnt)"""

_HITS_ITER = """,
ar{i} AS MATERIALIZED (
  SELECT e.dst AS n, floor(sum(s.h) * 1e9 + 0.5) / 1e9 AS ar
  FROM edges e JOIN s{p} s ON e.src = s.n GROUP BY e.dst
),
af{i} AS MATERIALIZED (
  SELECT nodes.n, coalesce(ar{i}.ar, 0) AS ar, s{p}.h
  FROM nodes LEFT JOIN ar{i} ON nodes.n = ar{i}.n
  JOIN s{p} ON nodes.n = s{p}.n
),
an{i} AS MATERIALIZED (
  SELECT n,
         CASE WHEN t.t > 0 THEN floor(ar / t.t * 1e9 + 0.5) / 1e9
              ELSE 0 END AS a,
         h
  FROM af{i}, (SELECT sum(ar) AS t FROM af{i}) t
),
hr{i} AS MATERIALIZED (
  SELECT e.src AS n, floor(sum(an.a) * 1e9 + 0.5) / 1e9 AS hr
  FROM edges e JOIN an{i} an ON e.dst = an.n GROUP BY e.src
),
hf{i} AS MATERIALIZED (
  SELECT nodes.n, an{i}.a, coalesce(hr{i}.hr, 0) AS hr
  FROM nodes LEFT JOIN hr{i} ON nodes.n = hr{i}.n
  JOIN an{i} ON nodes.n = an{i}.n
),
s{i} AS MATERIALIZED (
  SELECT n, a,
         CASE WHEN t.t > 0 THEN floor(hr / t.t * 1e9 + 0.5) / 1e9
              ELSE 0 END AS h
  FROM hf{i}, (SELECT sum(hr) AS t FROM hf{i}) t
)"""

HITS_ORACLE = (
    _HITS_BASE
    + "".join(_HITS_ITER.format(i=i, p=i - 1) for i in range(1, _HITS_ITERS + 1))
    + f"\nSELECT n AS node, a AS authority, h AS hub FROM s{_HITS_ITERS}"
)


@query("graph_hits", oracle=HITS_ORACLE)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the click-transition graph, 2
    synchronous L1-normalized rounds — each half-step one edge⋈scores
    shuffle + group-sum with 1e-9 snapping before the next (the
    pagerank iteration discipline, applied to the mutually-recursive
    pair), so the unrolled half-step CTE oracle replays bit-exact
    (operators/pagerank.py::hits). Completes link analysis beside the
    global and personalized walks."""
    from pyspark.sql import Window as W

    from arrow_spark.operators.pagerank import hits

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    trans = ev.select(
        F.col("k"),
        F.lag("k").over(W.partitionBy("user_id").orderBy("event_id")).alias("pk"),
    )
    edges = trans.where(F.col("pk").isNotNull()).select(
        F.col("pk").alias("src"), F.col("k").alias("dst")
    )
    return hits(edges, n_iters=_HITS_ITERS)
