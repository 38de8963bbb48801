"""CSV / JSON / ORC reader-writer option parity vs the reference's
option structs (csv/options.h:42 ParseOptions, :72 ConvertOptions,
:142 ReadOptions, :175 WriteOptions; json/reader.h:37) — each case
pins that the MAPPED Spark option reproduces the reference-documented
semantics on a concrete file, so a silent Spark default change (or a
wrong mapping) fails loudly.

Capability gaps are asserted too, as gaps: e.g. the reference takes a
LIST of null spellings (ConvertOptions::null_values) while Spark's csv
reader takes one nullValue string — the test pins the single-spelling
mapping AND the documented workaround for lists.
"""

from __future__ import annotations

import pytest

from arrow_spark.sources.dataset import read_dataset, write_dataset


def _write(tmp_path, name: str, text: str) -> str:
    p = tmp_path / name
    p.write_text(text)
    return str(p)


# ---------------------------------------------------------------------------
# CSV — ParseOptions


@pytest.mark.parametrize(
    "delimiter,row",
    [(",", "a,b"), ("|", "a|b"), ("\t", "a\tb"), (";", "a;b")],
)
def test_csv_parse_delimiter(spark, tmp_path, delimiter, row):
    """ParseOptions::delimiter (csv/options.h:45) → sep."""
    path = _write(tmp_path, "d.csv", f"c1{delimiter}c2\n{row}\n")
    df = read_dataset(spark, path, "csv", header="true", sep=delimiter)
    assert df.columns == ["c1", "c2"]
    assert df.collect()[0][:] == ("a", "b")


def test_csv_parse_quoting_and_double_quote(spark, tmp_path):
    """ParseOptions::quoting/quote_char/double_quote (:47-51): quoted
    fields keep delimiters; a doubled quote inside a quoted field is a
    literal quote (RFC 4180, the reference default). Spark's univocity
    parser needs escape='"' to unescape doubled quotes — THAT is the
    double_quote=true mapping (its default escape is backslash)."""
    path = _write(tmp_path, "q.csv", 'c1,c2\n"x,y","he said ""hi"""\n')
    df = read_dataset(spark, path, "csv", header="true", escape='"')
    row = df.collect()[0]
    assert row["c1"] == "x,y"
    assert row["c2"] == 'he said "hi"'


def test_csv_parse_quote_char_custom(spark, tmp_path):
    """ParseOptions::quote_char → quote: a non-default quote char."""
    path = _write(tmp_path, "qc.csv", "c1,c2\n'x,y',z\n")
    df = read_dataset(spark, path, "csv", header="true", quote="'")
    assert df.collect()[0][:] == ("x,y", "z")


def test_csv_parse_escaping(spark, tmp_path):
    """ParseOptions::escaping/escape_char (:52-54) → escape: backslash
    escapes the quote inside a quoted field (the reference's escaping
    mode, off by default there, explicit here)."""
    path = _write(tmp_path, "e.csv", 'c1,c2\n"a\\"b",z\n')
    df = read_dataset(spark, path, "csv", header="true", escape="\\")
    assert df.collect()[0][:] == ('a"b', "z")


def test_csv_parse_ignore_empty_lines(spark, tmp_path):
    """ParseOptions::ignore_empty_lines=true (:57): blank lines vanish
    (both engines' default)."""
    path = _write(tmp_path, "b.csv", "c1,c2\na,b\n\n\nc,d\n")
    df = read_dataset(spark, path, "csv", header="true")
    assert df.count() == 2


def test_csv_parse_newlines_in_values(spark, tmp_path):
    """ParseOptions::newlines_in_values (:56) → multiLine: embedded
    newlines inside quoted fields survive only in multiLine mode."""
    path = _write(tmp_path, "nl.csv", 'c1,c2\n"line1\nline2",z\n')
    df = read_dataset(spark, path, "csv", header="true", multiLine="true")
    assert df.collect()[0]["c1"] == "line1\nline2"


# ---------------------------------------------------------------------------
# CSV — ConvertOptions


def test_csv_convert_null_values_single(spark, tmp_path):
    """ConvertOptions::null_values (:86) → nullValue. Spark takes ONE
    spelling (capability gap vs the reference's list)."""
    path = _write(tmp_path, "n.csv", "c1,c2\nNA,1\nx,2\n")
    df = read_dataset(spark, path, "csv", header="true", nullValue="NA")
    rows = {r["c2"]: r["c1"] for r in df.collect()}
    assert rows[1] is None and rows[2] == "x"


def test_csv_convert_null_values_list_workaround(spark, tmp_path):
    """The documented list-of-spellings mapping: read raw, then fold
    the extra spellings to NULL column-wise (what ConvertOptions'
    null_values list does natively)."""
    from pyspark.sql import functions as F

    path = _write(tmp_path, "nn.csv", "c1,c2\nNA,1\nnull,2\n#N/A,3\nx,4\n")
    df = read_dataset(spark, path, "csv", header="true", nullValue="NA")
    spellings = ["null", "#N/A"]
    out = df.withColumn(
        "c1", F.when(F.col("c1").isin(spellings), None).otherwise(F.col("c1"))
    )
    vals = [r["c1"] for r in out.orderBy("c2").collect()]
    assert vals == [None, None, None, "x"]


def test_csv_convert_true_false_values(spark, tmp_path):
    """ConvertOptions::true_values/false_values defaults (:88-90):
    'true'/'false' spellings convert under an explicit boolean column
    type (column_types → schema)."""
    path = _write(tmp_path, "tf.csv", "c1,c2\ntrue,1\nfalse,2\n")
    df = read_dataset(
        spark, path, "csv", header="true", schema="c1 boolean, c2 int",
        inferSchema="false",
    )
    rows = {r["c2"]: r["c1"] for r in df.collect()}
    assert rows[1] is True and rows[2] is False


def test_csv_convert_column_types_schema(spark, tmp_path):
    """ConvertOptions::column_types (:82) → explicit schema beats
    inference; include_columns (:101) → select prunes to the csv scan."""
    path = _write(tmp_path, "ct.csv", "c1,c2,c3\n1,2.5,x\n")
    df = read_dataset(
        spark, path, "csv", header="true",
        schema="c1 bigint, c2 double, c3 string", inferSchema="false",
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "double", "string",
    ]
    pruned = df.select("c1")
    assert pruned.columns == ["c1"] and pruned.collect()[0][0] == 1


def test_csv_convert_timestamp_parsers(spark, tmp_path):
    """ConvertOptions::timestamp_parsers (:104) → timestampFormat with
    a typed column."""
    path = _write(tmp_path, "ts.csv", "c1,t\n1,2024/01/31 05:06:07\n")
    df = read_dataset(
        spark, path, "csv", header="true",
        schema="c1 int, t timestamp", inferSchema="false",
        timestampFormat="yyyy/MM/dd HH:mm:ss",
    )
    t = df.collect()[0]["t"]
    assert (t.year, t.month, t.day, t.hour) == (2024, 1, 31, 5)


def test_csv_convert_decimal_point(spark, tmp_path):
    """ConvertOptions::decimal_point (:98): Spark's csv numeric parser
    has no decimal-point option (capability gap — locale only affects
    date parsing), so the mapping is read-as-string → replace → cast,
    pinned here as the documented workaround."""
    from pyspark.sql import functions as F

    path = _write(tmp_path, "dp.csv", "c1;c2\n1,5;x\n")
    df = read_dataset(
        spark, path, "csv", header="true", sep=";",
        schema="c1 string, c2 string", inferSchema="false",
    )
    out = df.withColumn(
        "c1", F.regexp_replace("c1", ",", ".").cast("double")
    )
    assert out.collect()[0]["c1"] == 1.5


# ---------------------------------------------------------------------------
# CSV — ReadOptions / WriteOptions


def test_csv_read_skip_rows_and_column_names(spark, tmp_path):
    """ReadOptions::skip_rows/column_names (:148-153): leading junk
    rows skip via comment-prefix mapping when they share a marker, and
    autogenerate_column_names ≡ header=false (_c0.. names)."""
    path = _write(tmp_path, "sk.csv", "#junk\n#more junk\na,b\nc,d\n")
    df = read_dataset(spark, path, "csv", header="false", comment="#")
    assert df.columns == ["_c0", "_c1"]  # autogenerated names
    assert df.count() == 2


def test_csv_write_options_round_trip(spark, tmp_path):
    """WriteOptions (csv/options.h:175): delimiter + null spelling +
    header round-trip through the writer mapping."""
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(a=1, b=None), Row(a=2, b="x")])
    out = str(tmp_path / "out_csv")
    write_dataset(df, out, "csv", header="true", sep="|", nullValue="NA")
    back = read_dataset(
        spark, out, "csv", header="true", sep="|", nullValue="NA",
        schema="a bigint, b string", inferSchema="false",
    )
    rows = {r["a"]: r["b"] for r in back.collect()}
    assert rows == {1: None, 2: "x"}


# ---------------------------------------------------------------------------
# JSON — json/reader.h


def test_json_newlines_in_values_multiline(spark, tmp_path):
    """json ReadOptions: line-delimited is the default (reader.h:37
    block-based newline-delimited reader); a pretty-printed array
    needs multiLine — same split as the reference's 'one object per
    line' contract."""
    path = _write(tmp_path, "m.json", '[\n  {"a": 1},\n  {"a": 2}\n]\n')
    df = read_dataset(spark, path, "json", multiLine="true")
    assert sorted(r["a"] for r in df.collect()) == [1, 2]


def test_json_explicit_schema_ignores_unexpected_fields(spark, tmp_path):
    """json ParseOptions::explicit_schema + UnexpectedFieldBehavior::
    Ignore (reader.h parse options): fields outside the schema vanish
    silently — Spark's schema'd read has exactly this contract."""
    path = _write(tmp_path, "u.json", '{"a": 1, "zzz": "noise"}\n{"a": 2}\n')
    df = read_dataset(spark, path, "json", schema="a bigint")
    assert df.columns == ["a"]
    assert sorted(r["a"] for r in df.collect()) == [1, 2]


def test_json_corrupt_record_modes(spark, tmp_path):
    """UnexpectedFieldBehavior::Error analog: FAILFAST raises on
    malformed input where PERMISSIVE yields nulls."""
    from py4j.protocol import Py4JJavaError

    path = _write(tmp_path, "c.json", '{"a": 1}\n{not json at all\n')
    permissive = read_dataset(spark, path, "json", schema="a bigint", mode="PERMISSIVE")
    assert permissive.count() == 2  # corrupt row survives as nulls
    failfast = read_dataset(spark, path, "json", schema="a bigint", mode="FAILFAST")
    with pytest.raises((Py4JJavaError, Exception)):
        failfast.collect()


def test_json_timestamp_format(spark, tmp_path):
    """json timestamp parsing parity (the reference infers ISO
    timestamps; explicit format maps to timestampFormat)."""
    path = _write(tmp_path, "t.json", '{"t": "31/01/2024 05:06:07"}\n')
    df = read_dataset(
        spark, path, "json", schema="t timestamp",
        timestampFormat="dd/MM/yyyy HH:mm:ss",
    )
    t = df.collect()[0]["t"]
    assert (t.year, t.month, t.day, t.hour) == (2024, 1, 31, 5)


# ---------------------------------------------------------------------------
# ORC


@pytest.mark.parametrize("codec", ["zlib", "snappy", "none"])
def test_orc_compression_round_trip(spark, tmp_path, codec):
    """ORC WriteOptions compression parity (the reference's
    adapters/orc writer exposes Compression): every codec this
    container ships round-trips losslessly."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(a=i, b=f"s{i}", c=float(i) / 4) for i in range(100)]
    )
    out = str(tmp_path / f"orc_{codec}")
    write_dataset(df, out, "orc", compression=codec)
    back = read_dataset(spark, out, "orc")
    assert back.count() == 100
    assert sorted(r["a"] for r in back.collect()) == list(range(100))


def test_orc_predicate_and_column_pushdown(spark, tmp_path):
    """ORC scan parity with the parquet contract: filters and column
    pruning reach the scan (the reference's adapters/orc reader takes
    include_indices + row-level selection)."""
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(a=i, b=f"s{i}", c=i * 2) for i in range(1000)])
    out = str(tmp_path / "orc_pd")
    write_dataset(df, out, "orc")
    scan = read_dataset(spark, out, "orc").where("a = 500").select("a", "c")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "a" in plan
    row = scan.collect()[0]
    assert (row["a"], row["c"]) == (500, 1000)
    explained = scan._sc._jvm.PythonSQLUtils.explainString(
        scan._jdf.queryExecution(), "formatted"
    ) if hasattr(scan._sc._jvm, "PythonSQLUtils") else plan
    assert "c" in explained
