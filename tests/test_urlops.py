"""URL normalization / domain extraction / per-domain caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphrag_mrkr_2_spark.operators.urlops import (
    cap_per_domain,
    with_normalized_urls,
)


def _norm(spark, url: str) -> tuple[str, str]:
    df = spark.createDataFrame([(url,)], "url string")
    r = with_normalized_urls(df).collect()[0]
    return r["norm_url"], r["domain"]


class TestNormalize:
    def test_fragment_and_tracking_params(self, spark):
        norm, dom = _norm(
            spark,
            "https://Example.COM/page?utm_source=x&id=7&utm_campaign=y&fbclid=abc#frag",
        )
        assert norm == "https://example.com/page?id=7"
        assert dom == "example.com"

    def test_default_ports_and_trailing_slash(self, spark):
        assert _norm(spark, "http://host.example:80/")[0] == "http://host.example"
        assert _norm(spark, "https://host.example:443/a")[0] == "https://host.example/a"
        # non-default port survives
        assert _norm(spark, "http://host.example:8080/a")[0] == "http://host.example:8080/a"

    def test_case_only_prefix_lowered(self, spark):
        norm, _ = _norm(spark, "HTTPS://WWW.Site.Org/Path/File.HTML")
        assert norm == "https://www.site.org/Path/File.HTML"  # path case kept

    def test_www_and_userinfo_port_stripped_from_domain(self, spark):
        _, dom = _norm(spark, "https://user:pw@www.sub.example.co:8443/x")
        assert dom == "sub.example.co"

    def test_only_tracking_param(self, spark):
        assert _norm(spark, "https://a.example/p?utm_medium=em")[0] == "https://a.example/p"


class TestDomainCap:
    def test_cap_is_deterministic_and_bounded(self, spark):
        rows = [(f"https://hot.example/p{i}",) for i in range(50)]
        rows += [(f"https://cold{i}.example/x",) for i in range(5)]
        df = with_normalized_urls(spark.createDataFrame(rows, "url string"))
        capped = cap_per_domain(df, 10)
        counts = {
            r["domain"]: r["n"]
            for r in capped.groupBy("domain").agg(F.count("*").alias("n")).collect()
        }
        assert counts["hot.example"] == 10
        assert all(counts[f"cold{i}.example"] == 1 for i in range(5))
        # deterministic selection
        kept1 = sorted(r["url"] for r in capped.collect())
        kept2 = sorted(r["url"] for r in cap_per_domain(df, 10).collect())
        assert kept1 == kept2
