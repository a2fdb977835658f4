"""Tokenizer-seam tests (A4): encoder algebra, JVM fast path vs
Python counts, and the Arrow UDF path for a real (vendored) BPE."""

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.functions.tokenizer import (
    Char4Encoder,
    MiniBPE,
    RegexEncoder,
    get_encoder,
    token_count_column,
)

SAMPLES = [
    "",
    "hello world",
    "The quick brown fox: 42 jumps!",
    "  spaced   out\ttokens\nhere  ",
    "unicode départ — ok",
    "aaaa" * 50,
]


def test_auto_falls_back_to_regex_without_tiktoken():
    assert get_encoder("auto").name == "regex"


def test_unknown_encoder_rejected():
    with pytest.raises(ValueError):
        get_encoder("nope")


def test_regex_column_matches_python_counts(spark):
    enc = RegexEncoder()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(SAMPLES)], "i int, t string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", token_count_column(F.col("t"), enc).alias("n")).collect()
    }
    for i, t in enumerate(SAMPLES):
        assert got[i] == enc.count(t), t


def test_char4_column_matches_python_counts(spark):
    enc = Char4Encoder()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(SAMPLES)], "i int, t string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", token_count_column(F.col("t"), enc).alias("n")).collect()
    }
    for i, t in enumerate(SAMPLES):
        assert got[i] == len(t) // 4 == enc.count(t)


def test_minibpe_merges_deterministic_and_meaningful():
    enc = MiniBPE()
    # 'the' is an embedded merge: one token, not three bytes
    assert enc.encode("the") == [b"the"]
    # merging never increases the count vs raw pretoken bytes
    for t in SAMPLES:
        n_bytes = sum(len(p.encode()) for p in RegexEncoder().encode(t.lower()))
        assert enc.count(t) <= n_bytes
        assert enc.count(t) == len(enc.encode(t))
    assert enc.count("") == 0
    # deterministic across instances
    assert MiniBPE().encode("together therein") == enc.encode("together therein")


def test_minibpe_arrow_udf_path_matches_driver(spark):
    enc = MiniBPE()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(SAMPLES)], "i int, t string")
    col = token_count_column(F.col("t"), enc)
    got = {r["i"]: r["n"] for r in df.select("i", col.alias("n")).collect()}
    for i, t in enumerate(SAMPLES):
        assert got[i] == enc.count(t), t
    # no as_column attr → this really went through the pandas UDF path
    assert not hasattr(enc, "as_column")
    plan = df.select(col.alias("n"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "Python" in plan
