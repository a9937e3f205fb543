"""Quality scoring + content filter: Python oracle vs Spark column exprs."""

import pytest

from graphrag_mrkr_2_spark.functions.quality import (
    analyze_text_quality,
    should_embed_chunk,
    should_remove_chunk,
)

SAMPLES = [
    "This is a perfectly normal paragraph of english text with reasonable words in it for testing.",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z aa bb cc dd ee",  # fragmented
    "short",
    "x" * 200,
    "test " * 50,  # single-word repetition
    "!!!! #### $$$$ %%%% ^^^^ &&&& **** (((( )))) @@@@ !!!! #### $$$$ %%%%",  # special chars
    "Line one has words here\nLine two also has words\nLine three wraps up",
    "Ünïcödé tëxt wïth artefacts ünïcödé wörds ïn ït för the penalty path okay",
    "triple   spaces   inside   this   otherwise   normal   sentence   here",
    "",
    "   ",
    "word",
]


def test_quality_oracle_basics():
    good = analyze_text_quality(SAMPLES[0])
    assert good["quality_score"] > 0.5 and good["is_readable"]
    assert analyze_text_quality("")["quality_score"] == 0.0
    assert analyze_text_quality("tiny")["quality_score"] == 0.0  # len<5


def test_should_remove_chunk_rules():
    assert should_remove_chunk("bad", 0, 0)  # short + no entities
    assert not should_remove_chunk("bad", 1, 0)
    assert not should_remove_chunk(SAMPLES[0], 0, 0)


def test_content_filter_reasons():
    assert should_embed_chunk(SAMPLES[0])[0]
    assert should_embed_chunk("short")[1] == "too_short"
    assert should_embed_chunk("x" * 200_000)[1] == "too_long"
    assert should_embed_chunk("test " * 50)[1] == "repetitive"
    ok, reason = should_embed_chunk(SAMPLES[5])
    assert not ok and reason == "bad_char_distribution"


@pytest.mark.spark
def test_spark_filter_matches_oracle(spark):
    from pyspark.sql import functions as F

    from graphrag_mrkr_2_spark.operators.extract import with_content_filter

    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], ["i", "content"])
    got = {
        r["i"]: r["filter_reason"]
        for r in with_content_filter(df).select("i", "filter_reason").collect()
    }
    for i, s in enumerate(SAMPLES):
        ok, reason = should_embed_chunk(s)
        expected = None if ok else reason
        assert got[i] == expected, f"sample {i}: spark={got[i]} oracle={expected}"


@pytest.mark.spark
def test_spark_quality_matches_oracle(spark):
    from graphrag_mrkr_2_spark.operators.extract import with_quality_score

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES) if s.strip()], ["i", "content"]
    )
    got = {r["i"]: r["quality_score"] for r in with_quality_score(df).collect()}
    for i, s in enumerate(SAMPLES):
        if not s.strip():
            continue
        expected = analyze_text_quality(s)["quality_score"]
        assert got[i] == pytest.approx(expected, abs=1e-9), f"sample {i}"
