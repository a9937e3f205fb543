"""S7 entity resolution: LSH blocking + jaccard + CC mapping."""

import pytest
from pyspark.sql import functions as F

from graphrag_mrkr_2_spark.operators.resolution import (
    apply_mapping,
    candidate_pairs,
    entity_mapping,
    score_pairs,
)

ENTS = [
    ("e1", "ADMIN PANEL"),
    ("e2", "ADMIN PANELS"),
    ("e3", "ADMIN PANNEL"),  # typo variant
    ("e4", "USER DATABASE"),
    ("e5", "USER DATA BASE"),
    ("e6", "COMPLETELY OTHER THING"),
]


@pytest.fixture(scope="module")
def ents_df(spark):
    return spark.createDataFrame(ENTS, ["entity_id", "name"])


@pytest.mark.spark
def test_candidates_contain_true_matches(ents_df):
    cands = {
        (r["id1"], r["id2"]) for r in candidate_pairs(ents_df).collect()
    }
    assert ("e1", "e2") in cands
    assert ("e4", "e5") in cands


@pytest.mark.spark
def test_char_ngram_tokens_match_array_expr(spark, ents_df):
    """The codegen exploded char-gram rows (dedup.char_ngram_tokens) must
    produce exactly the gram set of the interpreted array expression the r2
    blocking path used — this is what keeps the new minhash hash-identical."""
    from graphrag_mrkr_2_spark.operators.dedup import char_ngram_tokens
    from graphrag_mrkr_2_spark.operators.resolution import _char_ngrams_expr

    weird = ents_df.union(
        spark.createDataFrame(
            [("e7", "ab"), ("e8", ""), ("e9", "  padded  ")], ["entity_id", "name"]
        )
    )
    got = {
        (r["id"], r["gram"])
        for r in char_ngram_tokens(weird, "entity_id", "name", n=3).collect()
    }
    expected = {
        (r["entity_id"], g)
        for r in weird.select(
            "entity_id", _char_ngrams_expr(F.col("name"), 3).alias("grams")
        ).collect()
        for g in r["grams"]
    }
    assert got == expected


@pytest.mark.spark
def test_codegen_minhash_signatures_hash_identical(spark, ents_df):
    """candidate_pairs' aggregate minhash must equal the r2 higher-order
    formulation value-for-value (same hash family over the same gram set)."""
    from graphrag_mrkr_2_spark.operators.resolution import _char_ngrams_expr

    num_hashes = 32
    g = ents_df.select(
        F.col("entity_id").alias("id"), _char_ngrams_expr(F.col("name"), 3).alias("grams")
    )

    def _mh(i: int):
        # closure factory — a lambda default param would be misread as a
        # two-arg (element, index) higher-order lambda
        return F.array_min(F.transform(F.col("grams"), lambda s: F.xxhash64(s, F.lit(i))))

    legacy = {
        r["id"]: [r[f"m{i}"] for i in range(num_hashes)]
        for r in g.select(
            "id", *[_mh(i).alias(f"m{i}") for i in range(num_hashes)]
        ).collect()
    }
    from graphrag_mrkr_2_spark.operators.dedup import char_ngram_tokens

    toks = char_ngram_tokens(ents_df, "entity_id", "name", 3)
    new = {
        r["id"]: [r[f"m{i}"] for i in range(num_hashes)]
        for r in toks.groupBy("id")
        .agg(
            *[
                F.min(F.xxhash64(F.col("gram"), F.lit(i))).alias(f"m{i}")
                for i in range(num_hashes)
            ]
        )
        .collect()
    }
    assert new == legacy


@pytest.mark.spark
def test_scores_and_mapping(ents_df):
    mapping = {
        r["entity_id"]: r["canonical_id"]
        for r in entity_mapping(ents_df, threshold=0.55).collect()
    }
    # admin-panel family collapses to one canonical id
    assert mapping["e1"] == mapping["e2"] == mapping["e3"]
    assert mapping["e4"] == mapping["e5"]
    assert mapping["e6"] == "e6"  # untouched
    assert mapping["e1"] != mapping["e4"]


@pytest.mark.spark
def test_apply_mapping_rewrites_edges(spark, ents_df):
    mapping = entity_mapping(ents_df, threshold=0.55)
    edges = spark.createDataFrame(
        [("e2", "e4", 0.5), ("e3", "e5", 0.7), ("e6", "e1", 0.6)],
        "source_id string, target_id string, strength double",
    )
    rewritten = apply_mapping(edges, mapping, ["source_id", "target_id"])
    rows = {(r["source_id"], r["target_id"]) for r in rewritten.collect()}
    m = {r["entity_id"]: r["canonical_id"] for r in mapping.collect()}
    assert rows == {
        (m["e2"], m["e4"]),
        (m["e3"], m["e5"]),
        ("e6", m["e1"]),
    }
    # after rewriting, the two admin->user edges collapse under distinct()
    assert rewritten.select("source_id", "target_id").distinct().count() == 2


@pytest.mark.spark
def test_embedding_cosine_scoring_leg(spark):
    """score_pairs with vec_col adds cosine; entity_mapping can merge on
    the embedding signal even when name Jaccard is below threshold."""
    from graphrag_mrkr_2_spark.functions.embeddings import pseudo_embedding

    def vec(text):
        return [float(x) for x in pseudo_embedding(text)]

    rows = [
        # same bag of words -> cosine 1.0, but different order changes
        # nothing for BOW; names share enough 3-grams to block together
        ("e1", "DATABASE BACKUP ENGINE", vec("database backup engine")),
        ("e2", "BACKUP ENGINE DATABASE", vec("database backup engine")),
        ("e3", "TOTALLY OTHER THING", vec("totally other thing")),
    ]
    df = spark.createDataFrame(rows, "entity_id string, name string, embedding array<float>")
    scored = score_pairs(candidate_pairs(df), df, vec_col="embedding")
    assert "cosine" in scored.columns
    m = {
        r["entity_id"]: r["canonical_id"]
        for r in entity_mapping(
            df, threshold=0.99, vec_col="embedding", cosine_threshold=0.95
        ).collect()
    }
    # jaccard gate alone (0.99) would not merge e1/e2; cosine does
    assert m["e1"] == m["e2"]
    assert m["e3"] == "e3"


class TestTfidfScores:
    def test_hand_computed_cosine(self, spark):
        import math

        from graphrag_mrkr_2_spark.operators.resolution import tfidf_scores

        ents = spark.createDataFrame(
            [("e1", "acme corp"), ("e2", "acme inc"), ("e3", "zenith corp")],
            "entity_id string, name string",
        )
        pairs = spark.createDataFrame([("e1", "e2"), ("e1", "e3")], "id1 string, id2 string")
        out = {(r["id1"], r["id2"]): r["tfidf_cosine"] for r in tfidf_scores(pairs, ents).collect()}
        # N=3; df: acme=2, corp=2, inc=1, zenith=1
        idf2 = math.log(4 / 3) + 1   # df=2
        idf1 = math.log(4 / 2) + 1   # df=1
        n1 = math.hypot(idf2, idf2)          # acme corp
        n2 = math.hypot(idf2, idf1)          # acme inc
        n3 = math.hypot(idf1, idf2)          # zenith corp
        assert out[("e1", "e2")] == pytest.approx(idf2 * idf2 / (n1 * n2))
        assert out[("e1", "e3")] == pytest.approx(idf2 * idf2 / (n1 * n3))

    def test_disjoint_names_score_zero(self, spark):
        from graphrag_mrkr_2_spark.operators.resolution import tfidf_scores

        ents = spark.createDataFrame(
            [("a", "alpha beta"), ("b", "gamma delta")], "entity_id string, name string"
        )
        pairs = spark.createDataFrame([("a", "b")], "id1 string, id2 string")
        assert tfidf_scores(pairs, ents).collect()[0]["tfidf_cosine"] == 0.0

    def test_tfidf_gate_merges_token_permuted_names(self, spark):
        from graphrag_mrkr_2_spark.operators.resolution import entity_mapping

        ents = spark.createDataFrame(
            [
                ("a", "north atlantic shipping company"),
                ("b", "shipping company north atlantic"),  # permuted tokens
                ("c", "pacific freight lines"),
            ],
            "entity_id string, name string",
        )
        # strict jaccard threshold alone would still merge these (same gram
        # set is high-jaccard) — so pick a jaccard threshold above their
        # char-gram overlap but below the tfidf cosine (1.0 for permutations)
        m = {
            r["entity_id"]: r["canonical_id"]
            for r in entity_mapping(
                ents, threshold=1.01, tfidf_threshold=0.99
            ).collect()
        }
        assert m["a"] == m["b"]
        assert m["c"] != m["a"]

    def test_tfidf_gate_keeps_tokenless_pairs_on_jaccard(self, spark):
        """CJK/punctuation names have no [a-z0-9] tokens — the pair must
        still merge through the jaccard gate when tfidf is enabled."""
        from graphrag_mrkr_2_spark.operators.resolution import entity_mapping

        ents = spark.createDataFrame(
            [("a", "東京大学"), ("b", "東京大学"), ("c", "acme corp")],
            "entity_id string, name string",
        )
        m = {
            r["entity_id"]: r["canonical_id"]
            for r in entity_mapping(ents, threshold=0.9, tfidf_threshold=0.9).collect()
        }
        assert m["a"] == m["b"]
        assert m["c"] != m["a"]
