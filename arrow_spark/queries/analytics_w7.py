"""Round-7 analytics / pipeline queries: Pareto cumulative-share cut,
new-vs-returning retention, Markov event transitions, time-decay
attribution, co-occurrence recommendations, 2-D histograms, lag-k
autocorrelation, bucketed audit checksums, language-balance resampling
weights, graph structure metrics, and Substrait-over-Flight-SQL.

All follow the integer-first hash-exact discipline (see stats_q.py):
counts/cents/micros in BIGINT, one fixed IEEE double tree at the end;
the one exact-rational float family (time-decay weights, powers of two
≥ 2⁻⁶) sums EXACTLY in binary so even its float sums are order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query

# ---------------------------------------------------------------------------
# Pareto cumulative-share cut (80/20 revenue analysis)

PARETO_ORACLE = """
WITH rev AS (
  SELECT o_custkey AS k,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS val
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT CAST(sum(val) AS BIGINT) AS total FROM rev),
ranked AS (
  SELECT k, val,
         CAST(row_number() OVER (ORDER BY val DESC, k ASC) AS BIGINT) AS rnk,
         CAST(sum(val) OVER (ORDER BY val DESC, k ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_value
  FROM rev
)
SELECT rnk, k, val, cum_value,
       CAST(cum_value AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
FROM ranked CROSS JOIN tot
WHERE (cum_value - val) * 5 < total * 4
"""


@query("analytics_pareto_cumshare", oracle=PARETO_ORACLE)
def analytics_pareto_cumshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranked customer prefix covering 80% of total revenue.
    Engine side has NO global window: revenue cents bucket by value
    range, the ordered window runs inside a bucket, offsets broadcast
    from the tiny bucket-totals frame (operators/pareto.py — the
    exact_quantiles prefix pattern). Revenue snaps to cents BIGINT so
    every cumulative is integer; the share threshold is the integer
    compare (cum−val)·5 < total·4."""
    from arrow_spark.operators.pareto import cumulative_share_cut

    rev = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("val")
        )
    )
    return cumulative_share_cut(rev, "k", "val", share_num=4, share_den=5)


# ---------------------------------------------------------------------------
# New vs returning users per day

RETENTION_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events
),
first_day AS (SELECT user_id, min(day) AS f FROM ev GROUP BY user_id),
daily AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS active
  FROM ev GROUP BY day
),
news AS (
  SELECT f AS day, CAST(count(*) AS BIGINT) AS new_users
  FROM first_day GROUP BY f
)
SELECT d.day, d.active,
       CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
       d.active - CAST(coalesce(n.new_users, 0) AS BIGINT) AS returning
FROM daily d LEFT JOIN news n ON d.day = n.day
"""


@query("analytics_retention_new_returning", oracle=RETENTION_ORACLE)
def analytics_retention_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into first-seen-today vs returning.
    Two group-bys (per-user min day; per-day distinct) + one small
    equi-join — integer epoch-day buckets, no calendar conventions,
    all counts exact."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT) DIV 86400").alias("day"),
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("f"))
    daily = ev.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("active")
    )
    news = first_day.groupBy(F.col("f").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    return daily.join(news, "day", "left").select(
        "day",
        "active",
        F.coalesce(F.col("new_users"), F.lit(0)).cast("long").alias("new_users"),
        (F.col("active") - F.coalesce(F.col("new_users"), F.lit(0))).cast("long").alias(
            "returning"
        ),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences

MARKOV_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s, event_id
  FROM events
),
seq AS (
  SELECT event_type AS cur,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY s, event_id) AS prev
  FROM ev
),
cnt AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur
),
tot AS (SELECT prev, CAST(sum(n) AS BIGINT) AS t FROM cnt GROUP BY prev)
SELECT c.prev, c.cur, c.n, t.t AS row_total,
       CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS prob
FROM cnt c JOIN tot t ON c.prev = t.prev
"""


@query("analytics_markov_transitions", oracle=MARKOV_ORACLE)
def analytics_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition probabilities between event types:
    lag window PER USER (user-partitioned, never global), counts
    grouped to the |types|² matrix, prob = n/row_total single
    division."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("s"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
    ).where(F.col("prev").isNotNull())
    cnt = seq.groupBy("prev", "cur").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cnt.groupBy("prev").agg(F.sum("n").cast("long").alias("t"))
    return cnt.join(tot, "prev").select(
        "prev",
        "cur",
        "n",
        F.col("t").alias("row_total"),
        (F.col("n").cast("double") / F.col("t").cast("double")).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Time-decay multi-touch attribution

_DECAY_CASE_SQL = (
    "CASE k WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.25 WHEN 3 THEN 0.125 "
    "WHEN 4 THEN 0.0625 WHEN 5 THEN 0.03125 ELSE 0.015625 END"
)

ATTRIBUTION_DECAY_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
),
purchases AS (SELECT user_id, event_id AS pid, s AS ps FROM ev WHERE event_type = 'purchase'),
touches AS (SELECT user_id, event_type, s AS ts_s FROM ev WHERE event_type IN ('view', 'click')),
pairs AS (
  SELECT p.pid, t.event_type,
         (p.ps - t.ts_s) // 86400 AS k
  FROM purchases p JOIN touches t
    ON p.user_id = t.user_id AND t.ts_s <= p.ps AND p.ps - t.ts_s < 604800
),
weighted AS (SELECT pid, event_type, k, {_DECAY_CASE_SQL} AS w FROM pairs),
shared AS (
  SELECT event_type, k,
         CAST(floor(w / sum(w) OVER (PARTITION BY pid) * 1000000 + 0.5) AS BIGINT) AS credit_micro
  FROM weighted
)
SELECT event_type, k AS k_days,
       CAST(count(*) AS BIGINT) AS touches,
       CAST(sum(credit_micro) AS BIGINT) AS credit_micro_total
FROM shared GROUP BY event_type, k
"""


@query("analytics_attribution_time_decay", oracle=ATTRIBUTION_DECAY_ORACLE)
def analytics_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution: each purchase splits one unit of credit
    over its preceding 7-day view/click touches with half-life-per-day
    weights 2^-k. Weights are exact binary fractions (multiples of
    2⁻⁶), so the per-purchase weight sum is EXACT regardless of order;
    shares micro-snap to 1e-6 BIGINT before the final integer
    aggregation. The touch↔purchase pairing is a per-user interval
    join (bounded per-user history; bucket by (user, week) at corpus
    scale)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("s"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("s").alias("ps")
    )
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_type", F.col("s").alias("ts_s")
    )
    pairs = purchases.join(touches, "user_id").where(
        (F.col("ts_s") <= F.col("ps")) & (F.col("ps") - F.col("ts_s") < 604800)
    )
    weighted = pairs.select(
        "pid",
        "event_type",
        F.expr("(ps - ts_s) DIV 86400").alias("k"),
    ).withColumn("w", F.expr(_DECAY_CASE_SQL))
    share = F.col("w") / F.sum("w").over(W.partitionBy("pid"))
    shared = weighted.select(
        "event_type",
        "k",
        F.floor(share * 1000000 + F.lit(0.5)).cast("long").alias("credit_micro"),
    )
    return shared.groupBy(F.col("event_type"), F.col("k").alias("k_days")).agg(
        F.count(F.lit(1)).cast("long").alias("touches"),
        F.sum("credit_micro").cast("long").alias("credit_micro_total"),
    )


# ---------------------------------------------------------------------------
# Item co-occurrence recommendations (market-basket lift)

COOCCURRENCE_ORACLE = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nord AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM items),
freq AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS f FROM items GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(count(*) AS BIGINT) AS c
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING count(*) >= 2
)
SELECT p1, p2, c, f1.f AS n1, f2.f AS n2,
       CAST(c * nord.n AS DOUBLE) / CAST(f1.f * f2.f AS DOUBLE) AS lift
FROM pairs
JOIN freq f1 ON pairs.p1 = f1.l_partkey
JOIN freq f2 ON pairs.p2 = f2.l_partkey
CROSS JOIN nord
ORDER BY lift DESC, c DESC, p1 ASC, p2 ASC
LIMIT 100
"""


@query("recommend_cooccurrence_topk", oracle=COOCCURRENCE_ORACLE)
def recommend_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 co-purchased part pairs by lift. Candidate pairs come
    from the basket self-equi-join on l_orderkey (volume = Σ items²
    per order, bounded by basket size — never |parts|²); lift =
    c·N/(n1·n2) is one division over BIGINTs; the k-cut is
    orderBy().limit() → TakeOrderedAndProject with full tiebreak."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    nord = li.agg(F.countDistinct("l_orderkey").cast("long").alias("n"))
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("f"))
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .where(F.col("c") >= 2)
    )
    # freq is PER-ITEM counts — item cardinality scales with the corpus
    # (TPC-H parts grow with SF), so a forced broadcast never
    # auto-disables: exactly the estimate-blind hazard class the r11
    # audit removed elsewhere (caught by the r12 broadcast gate).
    # Merge-hinted shuffle joins are spillable at any item count; nord
    # stays broadcast (single row).
    scored = (
        pairs.join(
            freq.select(F.col("l_partkey").alias("p1"), F.col("f").alias("n1")).hint("merge"),
            "p1",
        )
        .join(
            freq.select(F.col("l_partkey").alias("p2"), F.col("f").alias("n2")).hint("merge"),
            "p2",
        )
        .crossJoin(F.broadcast(nord))
        .select(
            "p1",
            "p2",
            "c",
            "n1",
            "n2",
            (
                (F.col("c") * F.col("n")).cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("c").desc(), F.col("p1").asc(), F.col("p2").asc()
    ).limit(100)


# ---------------------------------------------------------------------------
# 2-D histogram (quantity × discount density)

HIST2D_ORACLE = """
WITH binned AS (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS qty_bin,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_bin
  FROM lineitem
),
cells AS (
  SELECT qty_bin, disc_bin, CAST(count(*) AS BIGINT) AS cnt
  FROM binned GROUP BY qty_bin, disc_bin
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells)
SELECT qty_bin, disc_bin, cnt,
       CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS density
FROM cells CROSS JOIN tot
"""


@query("histogram2d_density", oracle=HIST2D_ORACLE)
def histogram2d_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram of (quantity, discount%): one map-side-combined
    group-by to ≤50×11 cells; density = cnt/N single division. Bins
    snap to integers BEFORE grouping, so float bin-edge ambiguity
    never exists."""
    binned = table(spark, sf_dir, "lineitem").select(
        F.floor("l_quantity").cast("long").alias("qty_bin"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("disc_bin"),
    )
    cells = binned.groupBy("qty_bin", "disc_bin").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = cells.agg(F.sum("cnt").cast("long").alias("n"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "qty_bin",
        "disc_bin",
        "cnt",
        (F.col("cnt").cast("double") / F.col("n").cast("double")).alias("density"),
    )


# ---------------------------------------------------------------------------
# Lag-k autocorrelation of the daily order-count series

ACF_ORACLE = """
WITH series AS (
  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS d,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s FROM series
),
centered AS (
  SELECT d, stats.n * x - stats.s AS cx FROM series CROSS JOIN stats
),
den AS (SELECT CAST(sum(cx * cx) AS BIGINT) AS den FROM centered),
lags AS (SELECT unnest(range(1, 8)) AS lag),
num AS (
  SELECT l.lag, CAST(sum(a.cx * b.cx) AS BIGINT) AS num,
         CAST(count(*) AS BIGINT) AS pairs
  FROM lags l
  JOIN centered a ON true
  JOIN centered b ON b.d = a.d + l.lag
  GROUP BY l.lag
)
SELECT lag, pairs, num, den.den AS den,
       CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE) AS acf
FROM num CROSS JOIN den ORDER BY lag
"""


@query("timeseries_acf", oracle=ACF_ORACLE)
def timeseries_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation (lags 1-7) of the daily order-count series,
    entirely on the integer lattice: the centered term is n·x_t − S
    (no float mean), numerator and denominator are BIGINT
    sum-of-products, acf = num/den one division. The lag pairing is an
    equi-join on day+lag — series length ~2400 days, trivially
    distributed."""
    series = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.expr("CAST(floor(unix_timestamp(o_orderdate)) AS BIGINT) DIV 86400").alias(
                "d"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    stats = series.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    centered = series.crossJoin(F.broadcast(stats)).select(
        "d", (F.col("n") * F.col("x") - F.col("s")).alias("cx")
    )
    den = centered.agg(F.sum(F.col("cx") * F.col("cx")).cast("long").alias("den"))
    lags = spark.range(1, 8).select(F.col("id").cast("long").alias("lag"))
    a = centered.select(F.col("d").alias("da"), F.col("cx").alias("cxa"))
    b = centered.select(F.col("d").alias("db"), F.col("cx").alias("cxb"))
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.sum(F.col("cxa") * F.col("cxb")).cast("long").alias("num"),
            F.count(F.lit(1)).cast("long").alias("pairs"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "pairs",
            "num",
            "den",
            # a constant daily series has zero centered variance:
            # acf undefined → NULL, never an ANSI /0 error
            F.when(F.col("den") > 0,
                   F.col("num").cast("double") / F.col("den").cast("double"))
            .alias("acf"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Bucketed audit checksums (table reconciliation at scale)

CHECKSUM_ORACLE = """
WITH h AS (
  SELECT l_orderkey % 64 AS bucket,
         (l_orderkey * 1000003 + l_linenumber) % 1000000007 AS h1,
         ((l_orderkey * 1000003 + l_linenumber) % 1000000007 * 31
          + CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) % 1000000007 AS h2
  FROM lineitem
)
SELECT bucket, CAST(count(*) AS BIGINT) AS rows_n,
       CAST(sum(h1) AS BIGINT) AS sum_h1,
       CAST(sum(h2) AS BIGINT) AS sum_h2,
       CAST(min(h1) AS BIGINT) AS min_h1,
       CAST(max(h1) AS BIGINT) AS max_h1
FROM h GROUP BY bucket
"""


@query("table_checksum_buckets", oracle=CHECKSUM_ORACLE)
def table_checksum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-grade bucketed table checksum: 64 key-bucket rows of
    (count, additive hash sums, hash extrema) — comparing two copies of
    a 100 TB table costs one map-side-combined group-by per side and a
    64-row diff. The hash is plain modular arithmetic ((key·1000003 +
    line) mod 1e9+7, price cents mixed in), identical on any engine —
    no engine hash functions whose implementations could differ. At
    petabyte scale widen bucket count, not the modulus."""
    li = table(spark, sf_dir, "lineitem")
    h1 = (F.col("l_orderkey") * 1000003 + F.col("l_linenumber")) % 1000000007
    h2 = (
        h1 * 31 + F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    ) % 1000000007
    return (
        li.select(
            (F.col("l_orderkey") % 64).alias("bucket"),
            h1.alias("h1"),
            h2.alias("h2"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows_n"),
            F.sum("h1").cast("long").alias("sum_h1"),
            F.sum("h2").cast("long").alias("sum_h2"),
            F.min("h1").cast("long").alias("min_h1"),
            F.max("h1").cast("long").alias("max_h1"),
        )
    )


# ---------------------------------------------------------------------------
# Language-balance resampling weights (multilingual corpus mixing)

LANG_BALANCE_ORACLE = """
WITH langs AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
w AS (
  SELECT lang, n,
         CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS w_micro
  FROM langs
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_total,
         CAST(sum(w_micro) AS BIGINT) AS w_total
  FROM w
)
SELECT lang, n, w_micro,
       CAST(w_micro AS DOUBLE) / CAST(w_total AS DOUBLE) AS sample_share,
       (CAST(w_micro AS DOUBLE) / CAST(w_total AS DOUBLE))
         * (CAST(n_total AS DOUBLE) / CAST(n AS DOUBLE)) AS epochs_boost
FROM w CROSS JOIN tot
"""


@query("corpus_lang_balance_weights", oracle=LANG_BALANCE_ORACLE)
def corpus_lang_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampling weights (α=0.5) that rebalance a
    multilingual corpus: p_l^α sampling, the standard fix for
    high-resource languages drowning low-resource ones. √n (IEEE
    correctly-rounded) micro-snaps to 1e-6 BIGINT so the normalizing
    sum is integer; shares/boosts are fixed double trees. One tiny
    group-by — the weights then drive a map-only weighted sampler."""
    langs = (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = langs.select(
        "lang",
        "n",
        F.floor(F.sqrt(F.col("n").cast("double")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("w_micro"),
    )
    tot = w.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum("w_micro").cast("long").alias("w_total"),
    )
    share = F.col("w_micro").cast("double") / F.col("w_total").cast("double")
    return w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        "w_micro",
        share.alias("sample_share"),
        (
            share * (F.col("n_total").cast("double") / F.col("n").cast("double"))
        ).alias("epochs_boost"),
    )


# ---------------------------------------------------------------------------
# Graph structure metrics over the click-transition graph

_EDGES_CTE = """
ev AS (
  SELECT user_id, event_id, CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
),
trans AS (
  SELECT k, lag(k) OVER (PARTITION BY user_id ORDER BY event_id) AS pk
  FROM ev
),
pairc AS (
  SELECT pk AS src, k AS dst, CAST(count(*) AS BIGINT) AS c
  FROM trans WHERE pk IS NOT NULL GROUP BY pk, k
),
thr AS (
  SELECT CAST(sum(c) AS BIGINT) // CAST(count(*) AS BIGINT) + 1 AS t FROM pairc
),
edges AS (
  SELECT src, dst FROM pairc CROSS JOIN thr WHERE c >= thr.t
),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM edges WHERE src <> dst
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
  ) GROUP BY node
)
"""

ASSORTATIVITY_ORACLE = (
    "WITH "
    + _EDGES_CTE
    + """,
stubs AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
),
moments AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(dx.deg) AS BIGINT) AS sx,
         CAST(sum(dy.deg) AS BIGINT) AS sy,
         CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sxy,
         CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sxx,
         CAST(sum(dy.deg * dy.deg) AS BIGINT) AS syy
  FROM stubs
  JOIN deg dx ON stubs.u = dx.node
  JOIN deg dy ON stubs.v = dy.node
)
SELECT CAST(m // 2 AS BIGINT) AS n_edges, m AS m_stubs,
       CAST(m * sxy - sx * sy AS DOUBLE)
       / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
          * sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS assortativity
FROM moments
"""
)


def _click_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average click-transition edges. The raw transition graph
    saturates to the COMPLETE graph as event volume grows (100 nodes,
    every pair eventually observed — the sf0.1 sweep caught exactly
    this: zero degree variance), so edges keep only pairs transitioned
    strictly more than the mean count: thr = total//pairs + 1, pure
    integer arithmetic, deterministic at every SF."""
    from arrow_spark.operators.pagerank import transition_edges

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    e = transition_edges(ev, "k", "user_id", "event_id")
    thr = e.agg(
        F.expr("CAST(sum(w) AS BIGINT) DIV CAST(count(*) AS BIGINT) + 1").alias("t")
    )
    edges = (
        e.crossJoin(F.broadcast(thr))
        .where(F.col("w") >= F.col("t"))
        .select("src", "dst")
    )
    # the edge frame is aggregate-sized (≤ node-pairs); checkpoint it
    # once so the downstream degree/adjacency/anti-join reuses don't
    # each re-derive the event scan + window (18 scans otherwise)
    return edges.localCheckpoint(eager=True)


@query("graph_degree_assortativity", oracle=ASSORTATIVITY_ORACLE)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the click-transition graph (Newman
    2002): five BIGINT moment sums over edge stubs, one double tree
    (two sqrt + division) — hash-exact; NULL for a regular graph
    (undefined, not a division error). The reference ships no graph
    kernels; this extends the repo's relational graph family."""
    from arrow_spark.operators.graph_metrics import degree_assortativity

    return degree_assortativity(_click_edges(spark, sf_dir))


JACCARD_LINKPRED_ORACLE = (
    "WITH "
    + _EDGES_CTE
    + """,
adj AS (
  SELECT u AS node, v AS nbr FROM und UNION ALL SELECT v AS node, u AS nbr FROM und
),
wedges AS (
  SELECT a.node AS x, b.node AS y, CAST(count(*) AS BIGINT) AS common
  FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
  GROUP BY a.node, b.node
),
cand AS (
  SELECT w.x, w.y, w.common FROM wedges w
  WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.u = w.x AND und.v = w.y)
)
SELECT x, y, common, dx.deg AS deg_x, dy.deg AS deg_y,
       CAST(common AS DOUBLE) / CAST(dx.deg + dy.deg - common AS DOUBLE) AS jaccard
FROM cand
JOIN deg dx ON cand.x = dx.node
JOIN deg dy ON cand.y = dy.node
ORDER BY jaccard DESC, x ASC, y ASC
LIMIT 20
"""
)


@query("graph_jaccard_link_prediction", oracle=JACCARD_LINKPRED_ORACLE)
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted links by neighbor-set Jaccard: wedge equi-join
    candidates (Σ deg² bound, never all-pairs), left-anti against
    existing edges, one integer division, TakeOrderedAndProject cut
    with full tiebreak."""
    from arrow_spark.operators.graph_metrics import jaccard_link_prediction

    return jaccard_link_prediction(_click_edges(spark, sf_dir), k=20)


# ---------------------------------------------------------------------------
# Substrait plan execution over Flight SQL (server.h:286 parity)

FLIGHT_SUBSTRAIT_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY o_orderpriority
"""


@query("flight_sql_substrait", oracle=FLIGHT_SUBSTRAIT_ORACLE)
def flight_sql_substrait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CommandStatementSubstraitPlan end to end (flight/sql/server.h:53
    StatementSubstraitPlan, :286 GetFlightInfoSubstraitPlan): the
    client serializes a substrait.Plan (aggregate over a NamedTable),
    ships it over loopback Flight SQL, and the server consumes it with
    the engine's own substrait consumer against the live catalog —
    the path ADBC clients use to send plans instead of SQL."""
    from arrow_spark.plans import substrait_builder as B
    from arrow_spark.sources.flight_sql import (
        flight_sql_execute_substrait,
        start_flight_sql_server,
    )

    table(spark, sf_dir, "orders").createOrReplaceTempView("fss_orders")
    read = B.read_named(
        ["fss_orders"], ["o_orderpriority", "o_totalprice"], ["string", "fp64"]
    )
    agg = B.aggregate_rel(
        read,
        [B.field_ref(0)],
        [
            B.agg_fn(1, [], B.typ("i64")),
            B.agg_fn(2, [B.field_ref(1)], B.typ("fp64")),
        ],
    )
    plan = B.plan(
        agg,
        ["o_orderpriority", "n", "raw_sum"],
        functions={1: (B.URI_AGG, "count"), 2: (B.URI_ARITH, "sum")},
    )
    srv = start_flight_sql_server(spark, rows_per_endpoint=2000)
    try:
        # materialize client-side while the server is alive (DoGet runs
        # lazily inside mapInArrow), then shut the server down — one
        # server per invocation must not leak a daemon thread + port
        # across bench/verification runs.
        tbl = flight_sql_execute_substrait(
            spark, f"grpc://127.0.0.1:{srv.port}", plan
        ).toArrow()
    finally:
        srv.shutdown()
    return spark.createDataFrame(tbl).select(
        "o_orderpriority", "n", F.round("raw_sum", 2).alias("sum_price")
    )


# ---------------------------------------------------------------------------
# Global clustering coefficient (3·triangles / wedges)

CLUSTERING_COEFF_ORACLE = (
    "WITH "
    + _EDGES_CTE
    + """,
tris AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM und ab JOIN und bc ON ab.v = bc.u
  JOIN und ac ON ac.u = ab.u AND ac.v = bc.v
),
wed AS (
  SELECT CAST(sum(deg * (deg - 1)) AS BIGINT) AS wedges2 FROM deg
)
SELECT tris.n_triangles, CAST(wed.wedges2 // 2 AS BIGINT) AS n_wedges,
       CASE WHEN wed.wedges2 = 0 THEN NULL
            ELSE CAST(6 * tris.n_triangles AS DOUBLE) / CAST(wed.wedges2 AS DOUBLE)
       END AS clustering_coeff
FROM tris CROSS JOIN wed
"""
)


@query("graph_clustering_coefficient", oracle=CLUSTERING_COEFF_ORACLE)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient C = 3·triangles/wedges of the
    click-transition graph — composes the existing oriented-wedge
    triangle counter (operators/triangles.py, Σ deg² join bound) with
    the integer wedge count Σ deg(deg−1)/2; one final division (NULL
    on a wedgeless graph)."""
    from arrow_spark.operators.graph_metrics import undirected_edges
    from arrow_spark.operators.triangles import count_triangles

    edges = _click_edges(spark, sf_dir)
    tris = count_triangles(edges, "src", "dst")
    und = undirected_edges(edges, "src", "dst")
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    wed = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1)).cast("long").alias("wedges2")
    )
    return (
        tris.crossJoin(F.broadcast(wed))
        .select(
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.expr("CAST(wedges2 DIV 2 AS BIGINT)").alias("n_wedges"),
            F.when(F.col("wedges2") == 0, F.lit(None).cast("double"))
            .otherwise(
                (F.lit(6) * F.col("n_triangles")).cast("double")
                / F.col("wedges2").cast("double")
            )
            .alias("clustering_coeff"),
        )
    )


# ---------------------------------------------------------------------------
# Inter-event gap histogram

INTERGAP_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s, event_id FROM events
),
gaps AS (
  SELECT s - lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id) AS gap
  FROM ev
),
binned AS (
  SELECT least(gap // 600, 12) AS bucket FROM gaps WHERE gap IS NOT NULL
),
cells AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM binned GROUP BY bucket
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells)
SELECT bucket, cnt, CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS share
FROM cells CROSS JOIN tot
"""


@query("events_intergap_histogram", oracle=INTERGAP_ORACLE)
def events_intergap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-user inter-event gaps in 10-minute buckets
    (capped at 2 h) — the arrival-process profile that sizes session
    timeouts and watermark delays. User-partitioned lag window, integer
    buckets, one division."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("s"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    gaps = ev.select((F.col("s") - F.lag("s").over(w)).alias("gap")).where(
        F.col("gap").isNotNull()
    )
    cells = (
        gaps.select(F.least(F.expr("gap DIV 600"), F.lit(12)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = cells.agg(F.sum("cnt").cast("long").alias("n"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "cnt",
        (F.col("cnt").cast("double") / F.col("n").cast("double")).alias("share"),
    )


# ---------------------------------------------------------------------------
# Funnel time-to-convert (exact latency quantiles)

TIME_TO_CONVERT_ORACLE = """
WITH u AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS s0,
         min(CASE WHEN event_type = 'purchase' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS p0
  FROM events GROUP BY user_id
),
d AS (
  SELECT p0 - s0 AS dur FROM u
  WHERE s0 IS NOT NULL AND p0 IS NOT NULL AND p0 >= s0
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
ranked AS (SELECT dur, row_number() OVER (ORDER BY dur) AS r FROM d),
q AS (SELECT unnest([500, 900]) AS q_mille)
SELECT q.q_mille, CAST((n.n * q.q_mille + 999) // 1000 AS BIGINT) AS rank,
       (SELECT dur FROM ranked
        WHERE r = CAST((n.n * q.q_mille + 999) // 1000 AS BIGINT)) AS value
FROM q CROSS JOIN n
WHERE n.n > 0
"""


@query("funnel_time_to_convert", oracle=TIME_TO_CONVERT_ORACLE)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 of signup→first-purchase latency, composed from
    the distributed order-statistics locate (operators/quantiles.py —
    nearest-rank on integer seconds, no global sort): one per-user
    group-by builds the duration frame, then the bucket-locate reads
    off the ranks."""
    from arrow_spark.operators.quantiles import exact_quantiles

    u = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    F.col("event_type") == "signup",
                    F.floor(F.unix_timestamp("ts")).cast("long"),
                )
            ).alias("s0"),
            F.min(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.unix_timestamp("ts")).cast("long"),
                )
            ).alias("p0"),
        )
    )
    durs = u.where(
        F.col("s0").isNotNull() & F.col("p0").isNotNull() & (F.col("p0") >= F.col("s0"))
    ).select((F.col("p0") - F.col("s0")).alias("dur"))
    return exact_quantiles(durs, "dur", [500, 900])


# ---------------------------------------------------------------------------
# Session interval spans (gaps-and-islands)

SESSION_SPANS_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s, event_id FROM events
),
flagged AS (
  SELECT user_id, s, event_id,
         CASE WHEN lag(s) OVER w IS NULL
                   OR s - lag(s) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
),
labeled AS (
  SELECT user_id, s,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY s, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       CAST(min(s) AS BIGINT) AS start_s, CAST(max(s) AS BIGINT) AS end_s,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(s) - min(s) AS BIGINT) AS span_s
FROM labeled GROUP BY user_id, session_seq
"""


@query("sessions_interval_spans", oracle=SESSION_SPANS_ORACLE)
def sessions_interval_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: merge each user's event stream into maximal
    activity intervals (30-min tolerance) → one row per island with
    bounds, size, span. Composes the sessionize operator
    (operators/sessions.py — user-partitioned windows only) with a
    (user, island) group-by; all integers."""
    from arrow_spark.operators.sessions import sessionize

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts"),
        F.floor(F.unix_timestamp("ts")).cast("long").alias("s"),
        "event_id",
    )
    labeled = sessionize(ev, "user_id", "s", 1800, tiebreak=("event_id",))
    return labeled.groupBy(
        "user_id", F.col("session_seq").cast("long").alias("session_seq")
    ).agg(
        F.min("s").cast("long").alias("start_s"),
        F.max("s").cast("long").alias("end_s"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("s") - F.min("s")).cast("long").alias("span_s"),
    )


# ---------------------------------------------------------------------------
# Embedding norm profile (vector-column statistics)

NORM_PROFILE_ORACLE = """
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
),
norms AS (
  SELECT label,
         CAST(floor(sqrt(CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, 65),
                 i -> CAST(floor(v[i] * 1000.0 + 0.5) AS BIGINT)
                      * CAST(floor(v[i] * 1000.0 + 0.5) AS BIGINT))),
             (a, b) -> a + b) AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS norm_micro
  FROM e
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       CAST(min(norm_micro) AS BIGINT) AS min_norm_micro,
       CAST(max(norm_micro) AS BIGINT) AS max_norm_micro,
       CAST(sum(norm_micro) AS BIGINT) AS sum_norm_micro,
       CAST(sum(norm_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0 AS mean_norm
FROM norms GROUP BY label
"""


@query("embedding_norm_profile", oracle=NORM_PROFILE_ORACLE)
def embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile of the embedding column — the vector
    sanity check before any ANN build (degenerate/zero/outlier norms
    break cosine pruning). Each vector's norm is computed on the
    milli-snapped integer lattice (Σ milli² is BIGINT, in-row), the
    sqrt micro-snaps, and group stats are integer; mean spends the one
    final division. Map-only until the tiny per-label aggregate."""
    emb = table(spark, sf_dir, "embeddings")
    milli = lambda x: F.floor(x.cast("double") * 1000.0 + F.lit(0.5)).cast("long")  # noqa: E731
    norm_sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: milli(x) * milli(x)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    norms = emb.select(
        "label",
        F.floor(F.sqrt(norm_sq.cast("double")) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("norm_micro"),
    )
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("norm_micro").cast("long").alias("min_norm_micro"),
        F.max("norm_micro").cast("long").alias("max_norm_micro"),
        F.sum("norm_micro").cast("long").alias("sum_norm_micro"),
        (
            F.sum("norm_micro").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000000.0)
        ).alias("mean_norm"),
    )


HHI_ORACLE = """
WITH rev AS (
  SELECT n.n_name AS nation, s.s_suppkey AS suppkey,
         CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT nation,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(cents) AS BIGINT) AS rev_cents,
       CAST(sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS DOUBLE)
         / (CAST(sum(cents) AS DOUBLE) * CAST(sum(cents) AS DOUBLE)) AS hhi
FROM rev GROUP BY 1
"""


@query("analytics_hhi_concentration", oracle=HHI_ORACLE)
def analytics_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market-concentration index of supplier
    revenue within each nation: HHI = sum(share_i^2) = sum(c_i^2) /
    (sum c_i)^2, the antitrust-standard concentration measure (a
    reference user composes it from compute sum/multiply kernels).

    Revenue snaps to cents BIGINT (floor(x*100+0.5) — a fixed IEEE
    tree, bit-identical cross-engine); both HHI operands are exact
    integer sums, and the denominator is squared in DOUBLE on both
    engines so the rounding paths match. Joins broadcast the supplier
    and nation dims; the per-(nation,supplier) group-by is map-side
    combined and the final group-by lands on 25 nations. No windows,
    no skew: scale-safe."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    rev = (
        li.select(
            "l_suppkey",
            F.floor(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
                + F.lit(0.5)
            )
            .cast("long")
            .alias("c"),
        )
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("nation"))),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", "s_suppkey")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    from arrow_spark.operators.inequality import hhi

    return hhi(rev, ["nation"], "cents").select(
        "nation",
        F.col("n_holders").alias("n_suppliers"),
        F.col("total_weight").alias("rev_cents"),
        "hhi",
    )


CCF_ORACLE = """
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d, event_type
  FROM events WHERE event_type IN ('click', 'purchase')
),
days AS (
  SELECT d,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM ev GROUP BY 1
),
lags AS (SELECT unnest(range(-3, 4)) AS lag),
m AS (
  SELECT l.lag,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(a.x) AS HUGEINT) AS sx,
         CAST(sum(b.y) AS HUGEINT) AS sy,
         CAST(sum(CAST(a.x AS HUGEINT) * CAST(b.y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(sum(CAST(a.x AS HUGEINT) * CAST(a.x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST(b.y AS HUGEINT) * CAST(b.y AS HUGEINT)) AS HUGEINT) AS syy
  FROM lags l JOIN days a ON true JOIN days b ON b.d = a.d + l.lag
  GROUP BY 1
)
SELECT lag, CAST(n AS BIGINT) AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS ccf
FROM m
"""


@query("timeseries_cross_correlation", oracle=CCF_ORACLE)
def timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation (lags -3..+3 days) between the daily
    click and purchase count series — does click volume LEAD purchase
    volume? The bivariate companion to timeseries_acf, and the
    screen you run before any attribution/uplift model.

    The fact table folds to a days-sized (d, x, y) frame in one
    map-side-combined group-by; every lag pairing is an equi-join on
    day+lag over that tiny frame (a 7-row broadcast of the lag set,
    never a per-lag rescan of events); Pearson per lag rides exact
    decimal(38,0) moments into one IEEE sub/div/sqrt tree. Days grow
    with TIME, not data volume — at 100 TB the post-fold work is
    unchanged."""
    d38 = "decimal(38,0)"
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT) DIV 86400").alias("d"),
            "event_type",
        )
    )
    days = ev.groupBy("d").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("long").alias("lag"))
    a = days.select(F.col("d").alias("da"), F.col("x").cast(d38).alias("xd"))
    b = days.select(F.col("d").alias("db"), F.col("y").cast(d38).alias("yd"))
    m = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast(d38).alias("n"),
            F.sum("xd").alias("sx"),
            F.sum("yd").alias("sy"),
            F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
            F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
            F.sum(F.col("yd") * F.col("yd")).alias("syy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vxd = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vyd = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # a constant series leaves the correlation undefined: NULL, not a
    # division error (Spark 4's ANSI default throws on /0; DuckDB's
    # double /0 is NULL, so the hash contract holds)
    ccf = F.when(
        (vxd == 0) | (vyd == 0), F.lit(None).cast("double")
    ).otherwise(num / (F.sqrt(vxd.cast("double")) * F.sqrt(vyd.cast("double"))))
    return m.select(
        "lag",
        F.col("n").cast("long").alias("n_days"),
        ccf.alias("ccf"),
    )


RECIPROCITY_ORACLE = (
    "WITH "
    + _EDGES_CTE
    + """,
dir AS (SELECT src, dst FROM edges WHERE src <> dst),
r AS (
  SELECT CAST(count(*) AS BIGINT) AS n_recip
  FROM dir a JOIN dir b ON a.src = b.dst AND a.dst = b.src
),
cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM dir)
SELECT cnt.n_edges, r.n_recip,
       CAST(r.n_recip AS DOUBLE) / CAST(cnt.n_edges AS DOUBLE) AS reciprocity
FROM cnt CROSS JOIN r
"""
)


@query("graph_reciprocity", oracle=RECIPROCITY_ORACLE)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge reciprocity of the directed click-transition graph: the
    fraction of non-loop edges whose reverse edge also exists —
    the standard directed-graph symmetry diagnostic (Newman §7.9;
    reciprocity 1 means the flow graph is effectively undirected and
    the cheaper undirected algorithms apply).

    One self-equi-join of the aggregate-sized edge frame on the
    reversed key pair plus two scalar counts; the ratio is one
    exact-integer division. The edge frame is localCheckpointed by
    _click_edges, so the join does not re-derive the event scan."""
    from arrow_spark.operators.graph_metrics import reciprocity

    return reciprocity(_click_edges(spark, sf_dir))


ELASTICITY_ORACLE = """
WITH li AS (
  SELECT p.p_brand AS brand,
         CAST(floor(ln(l.l_extendedprice / l.l_quantity) * 1e6 + 0.5) AS BIGINT)
           AS lx,
         CAST(floor(ln(l.l_quantity) * 1e6 + 0.5) AS BIGINT) AS ly
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
m AS (
  SELECT brand,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(lx) AS HUGEINT) AS sx,
         CAST(sum(ly) AS HUGEINT) AS sy,
         CAST(sum(CAST(lx AS HUGEINT) * CAST(ly AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(sum(CAST(lx AS HUGEINT) * CAST(lx AS HUGEINT)) AS HUGEINT) AS sxx
  FROM li GROUP BY brand
)
SELECT brand, CAST(n AS BIGINT) AS n_lines,
       floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS elasticity6
FROM m
"""


@query("analytics_price_elasticity", oracle=ELASTICITY_ORACLE)
def analytics_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log OLS price elasticity of demand per brand: the slope of
    ln(quantity) on ln(unit price) — the classic constant-elasticity
    estimate every pricing team runs first.

    Both regressors snap to a 1e-6 ln-lattice (BIGINT) so the OLS
    moments are exact decimal(38,0) sums — no order-dependent float
    accumulation. A 1-ulp libm ln skew can still flip an isolated
    lattice cell when ln(x)·1e6 sits within ~4e-9 of a boundary
    (expected ≲1 row per SF, measured once at sf0.001); each flip
    perturbs the slope by ~1e-11, so the FINAL slope micro-rounds to
    1e-6 on both engines (the mi_term/woe6 convention), which absorbs
    it with ~5 orders of margin. The part join is a plain equi-join
    (AQE broadcasts when the dim fits); the moment group-by lands on
    25 brands, map-side combined."""
    d38 = "decimal(38,0)"
    li = (
        table(spark, sf_dir, "lineitem")
        .join(
            table(spark, sf_dir, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            F.floor(
                F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .cast(d38)
            .alias("lx"),
            F.floor(F.log(F.col("l_quantity")) * 1e6 + F.lit(0.5))
            .cast("long")
            .cast(d38)
            .alias("ly"),
        )
    )
    m = li.groupBy("brand").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dend = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    # constant regressor → undefined slope: NULL, never an ANSI /0 error
    slope = F.when(dend == 0, F.lit(None).cast("double")).otherwise(
        F.floor(num / dend.cast("double") * 1e6 + F.lit(0.5)) / 1e6
    )
    return m.select(
        "brand",
        F.col("n").cast("long").alias("n_lines"),
        slope.alias("elasticity6"),
    )
