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


def test_token_ids_column_closed_vocab_and_packing(spark):
    """token_ids_column: ids round-trip the driver encoder exactly,
    the vocabulary is closed (byte ids < 256, merged ids = 256+rank),
    NULL text stays NULL, counting-only encoders raise, and the array
    sizes feed pack_sequences end-to-end (tokenize → pack)."""
    import pytest

    from web_scraper_spark.functions.tokenizer import (
        Char4Encoder,
        MiniBPE,
        token_ids_column,
    )
    from web_scraper_spark.operators.relational import pack_sequences

    enc = MiniBPE()
    rows = [(i, t) for i, t in enumerate(SAMPLES)] + [(99, None)]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {
        r["i"]: r["ids"]
        for r in df.select("i", token_ids_column(F.col("t"), enc).alias("ids")).collect()
    }
    for i, t in enumerate(SAMPLES):
        assert out[i] == enc.encode_ids(t), t
        assert all(x < 256 + len(enc.ranks) for x in out[i])
        # ids decode consistently: count equals the token count
        assert len(out[i]) == enc.count(t)
    assert out[99] is None

    with pytest.raises(ValueError, match="no integer id vocabulary"):
        token_ids_column(F.col("t"), Char4Encoder())

    # tokenize → pack: bin ids follow the cumulative id-array sizes
    ids_df = df.filter(F.col("t").isNotNull()).select(
        "i", F.size(token_ids_column(F.col("t"), enc)).cast("long").alias("n")
    )
    packed = {r["i"]: r for r in pack_sequences(ids_df, "i", "n", capacity=8).collect()}
    offset = 0
    for i, t in enumerate(SAMPLES):
        assert packed[i]["stream_offset"] == offset
        assert packed[i]["bin_id"] == offset // 8
        offset += len(enc.encode_ids(t))
