"""Language ID over real multilingual snippets (the synthetic driver corpus
is English word-soup under every lang label, so the heuristic's behavior is
pinned here on genuine text) + token/fingerprint invariants."""

import pytest
from pyspark.sql import functions as F

from graphrag_mrkr_2_spark.operators.textstats import (
    with_fingerprint,
    with_lang_id,
    with_token_counts,
)

SNIPPETS = [
    ("en", "The quick brown fox is one of the animals that are described in the story, and it jumps with ease."),
    ("it", "Il gatto dorme sulla sedia e la casa di campagna che abbiamo visitato per una settimana sono ricordi belli."),
    ("de", "Der Hund und die Katze sind mit dem Kind auch nicht allein, das ist ein gutes Zeichen von Vertrauen."),
    ("es", "Los estudiantes y las familias caminan por el parque como cada domingo, pero este lugar tiene entre sus rincones una historia."),
    ("fr", "Les enfants jouent dans le jardin pour une heure avec cette balle, qui est belle et pas du tout neuve, sur les pelouses des voisins."),
    ("zh", "今天的天气很好，我们一起去公园散步，然后在湖边喝茶聊天，晚上回家吃饭。"),
    ("und", "xqz brrt klmn 12345 zzz"),
]


@pytest.mark.spark
def test_lang_id_on_real_snippets(spark):
    df = spark.createDataFrame(SNIPPETS, ["expected", "text"])
    got = {r["expected"]: r["lang_pred"] for r in with_lang_id(df).collect()}
    assert got == {lang: lang for lang, _ in SNIPPETS}


@pytest.mark.spark
def test_lang_id_cjk_threshold(spark):
    # a mostly-English doc with a couple of CJK chars stays non-zh
    df = spark.createDataFrame(
        [(1, "The meeting is in the building 北京 and that is all for the notes that are here.")],
        ["i", "text"],
    )
    assert with_lang_id(df).collect()[0]["lang_pred"] == "en"


@pytest.mark.spark
def test_token_counts_and_fingerprint_invariants(spark):
    df = spark.createDataFrame(
        [(1, "Hello  world, this   is text."), (2, "hello world, this is text.")],
        ["i", "text"],
    )
    t = with_token_counts(df).collect()
    assert all(r["ws_tokens"] == 5 for r in t)
    assert all(r["approx_tokens"] >= 1 for r in t)
    # fingerprint canonicalizes case + whitespace → the two rows collide
    fp = [r["fingerprint"] for r in with_fingerprint(df).collect()]
    assert fp[0] == fp[1]
