"""Nested (list/struct/map) kernel family over the embeddings and events
fixtures.

Arrow refs: scalar_nested.cc (list_value_length, list_element,
list_slice, list_flatten, struct_field, make_struct, map_lookup),
vector_nested.cc (list_parent_indices ≈ posexplode bookkeeping)
(SURVEY §2.2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_spark.catalog import table
from arrow_spark.queries.base import query

# every round() gets '+ 0.0': DuckDB's round keeps IEEE -0.0 for tiny
# negatives while Spark's returns +0.0, and the driver-grade exact
# compare distinguishes them (caught at sf0.001: slice_sum -0.0 vs 0.0)
LIST_ORACLE = """
SELECT
  vec_id,
  len(embedding)                                         AS list_len,
  round(CAST(embedding[1] AS DOUBLE), 6) + 0.0           AS first_elem,
  round(CAST(embedding[8] AS DOUBLE), 6) + 0.0           AS eighth_elem,
  round(CAST(list_sum(embedding[1:4]) AS DOUBLE), 4) + 0.0 AS slice_sum,
  round(CAST(list_min(embedding) AS DOUBLE), 6) + 0.0    AS vmin,
  round(CAST(list_max(embedding) AS DOUBLE), 6) + 0.0    AS vmax
FROM embeddings
"""


@query("nested_list_funcs", oracle=LIST_ORACLE)
def nested_list_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """list_value_length / list_element / list_slice + element-wise
    reductions over an array column (all JVM higher-order functions)."""
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    slice_sum = F.aggregate(
        F.slice(emb, 1, 4), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    z = F.lit(0.0)  # + 0.0 canonicalizes IEEE -0.0 (see LIST_ORACLE note)
    return e.select(
        "vec_id",
        F.size(emb).alias("list_len"),
        (F.round(F.element_at(emb, 1).cast("double"), 6) + z).alias("first_elem"),
        (F.round(F.element_at(emb, 8).cast("double"), 6) + z).alias("eighth_elem"),
        (F.round(slice_sum, 4) + z).alias("slice_sum"),
        (F.round(F.array_min(emb).cast("double"), 6) + z).alias("vmin"),
        (F.round(F.array_max(emb).cast("double"), 6) + z).alias("vmax"),
    )


EXPLODE_ORACLE = """
SELECT vec_id, CAST(i AS INT) AS pos, round(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE), 6) AS val
FROM embeddings, range(0, 64) t(i)
WHERE vec_id % 25 = 0
"""


@query("nested_explode", oracle=EXPLODE_ORACLE)
def nested_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode ≡ list_parent_indices + flatten bookkeeping."""
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 25 == 0)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.round(F.col("v").cast("double"), 6).alias("val"))


STRUCT_ORACLE = """
SELECT
  vec_id,
  {'id': vec_id, 'lab': label}.id    AS sid,
  {'id': vec_id, 'lab': label}.lab   AS slab
FROM embeddings WHERE vec_id % 10 = 0
"""


@query("nested_struct", oracle=STRUCT_ORACLE)
def nested_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_struct + struct_field round-trip."""
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 10 == 0)
    st = F.struct(F.col("vec_id").alias("id"), F.col("label").alias("lab"))
    return e.select(
        "vec_id",
        st.getField("id").alias("sid"),
        st.getField("lab").alias("slab"),
    )


MAP_JSON_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
  map {'a': value, 'b': value * 2}['b'][1]       AS map_b
FROM events WHERE event_id % 21 = 0
"""


@query("nested_map_json", oracle=MAP_JSON_ORACLE)
def nested_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_lookup (map_get / element_at on MapType) + JSON field access
    on the string-encoded props column."""
    e = table(spark, sf_dir, "events").where(F.col("event_id") % 21 == 0)
    m = F.create_map(
        F.lit("a"), F.col("value"), F.lit("b"), F.col("value") * 2
    )
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.element_at(m, "b").alias("map_b"),
    )


FLATTEN_ORACLE = """
SELECT vec_id,
       len(flatten([embedding[1:3], embedding[4:5]]))  AS flat_len,
       round(CAST(list_sum(flatten([embedding[1:3], embedding[4:5]])) AS DOUBLE), 4)
         + 0.0 AS flat_sum
FROM embeddings WHERE vec_id % 20 = 0
"""


@query("nested_flatten", oracle=FLATTEN_ORACLE)
def nested_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """list_flatten (one level, scalar_nested.cc:260).

    flat_sum carries `+ 0.0` on BOTH sides: a tiny negative float sum
    rounds to SIGNED zero and the engines disagree on the sign (Spark
    0.0, DuckDB -0.0 — found at sf1, where a near-cancelling vector
    exists); IEEE -0.0 + 0.0 = +0.0 normalizes both, identity for every
    other value."""
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 20 == 0)
    emb = F.col("embedding")
    flat = F.flatten(F.array(F.slice(emb, 1, 3), F.slice(emb, 4, 2)))
    fsum = F.aggregate(flat, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return e.select(
        "vec_id",
        F.size(flat).alias("flat_len"),
        (F.round(fsum, 4) + F.lit(0.0)).alias("flat_sum"),
    )
