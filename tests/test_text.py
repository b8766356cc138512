"""Unit tests for the text-function helpers added in round 2: PII
redaction and the array-based n-gram / chunk-start expressions."""

from __future__ import annotations


def test_pii_redact_strips_only_pii(spark):
    from pyspark.sql import Row
    from traffic_data_pipeline_spark.functions.text import pii_counts, pii_redact
    from pyspark.sql import functions as F

    df = spark.createDataFrame([
        Row(s="mail me at Jane.Doe+x@corp.example.org or +1-555-123-4567 ok"),
        Row(s="no pii here, just text with numbers 12345"),
    ])
    ne, np_ = pii_counts(F.col("s"))
    out = df.select(pii_redact(F.col("s")).alias("r"),
                    ne.alias("ne"), np_.alias("np")).collect()
    assert out[0]["r"] == "mail me at <EMAIL> or <PHONE> ok"
    assert (out[0]["ne"], out[0]["np"]) == (1, 1)
    assert out[1]["r"] == "no pii here, just text with numbers 12345"
    assert (out[1]["ne"], out[1]["np"]) == (0, 0)


def test_ngram_and_chunk_arrays(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from traffic_data_pipeline_spark.functions.text import (
        chunk_starts, ngram_array, token_array)

    df = spark.createDataFrame([Row(s="a b c d e"), Row(s="x"), Row(s="")])
    out = df.select(
        token_array(F.col("s")).alias("tok")
    ).select(
        ngram_array("tok", 3).alias("g3"),
        chunk_starts("tok", 2).alias("st"),
    ).collect()
    assert out[0]["g3"] == ["a b c", "b c d", "c d e"]
    assert out[0]["st"] == [1, 3, 5]
    assert out[1]["g3"] == []          # doc shorter than n
    assert out[1]["st"] == [1]
    assert out[2]["g3"] == []          # empty doc still yields one start
    assert out[2]["st"] == [1]
