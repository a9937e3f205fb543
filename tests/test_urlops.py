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


class TestPipelineCuration:
    def test_url_dedup_and_domain_cap_in_pipeline(self, spark):
        """curate_urls collapses tracking-param variants of the same page and
        max_pages_per_domain bounds hot domains — before any heavy stage."""
        from graphrag_mrkr_2_spark.plans.pipeline import run_kg_pipeline
        from graphrag_mrkr_2_spark.sources.pages import generate_pages

        base = generate_pages(spark, 6)
        # add tracking-param duplicates of every page
        dup = base.withColumn(
            "url", F.concat("url", F.lit("?utm_source=feed#top"))
        )
        pages = base.unionByName(dup)
        res = run_kg_pipeline(pages, curate_urls=True, cache_mentions=False)
        res_base = run_kg_pipeline(base, cache_mentions=False)
        t_curated = {(r["subj"], r["pred"], r["obj"]) for r in res.triples.collect()}
        t_base = {(r["subj"], r["pred"], r["obj"]) for r in res_base.triples.collect()}
        assert t_curated == t_base  # duplicates contributed nothing extra

    def test_domain_cap_reduces_pages(self, spark):
        from graphrag_mrkr_2_spark.operators.urlops import with_normalized_urls
        from graphrag_mrkr_2_spark.plans.pipeline import run_kg_pipeline
        from graphrag_mrkr_2_spark.sources.pages import generate_pages

        pages = generate_pages(spark, 12)
        n_domains = with_normalized_urls(pages).select("domain").distinct().count()
        res = run_kg_pipeline(
            pages, curate_urls=True, max_pages_per_domain=1, cache_mentions=False
        )
        kept_chunk_docs = res.mentions.select("document_id").distinct().count()
        assert kept_chunk_docs <= n_domains


class TestReviewRegressions:
    def test_tracking_pattern_anchored_not_in_values(self, spark):
        """'gclid=' inside another param's VALUE must survive."""
        norm, _ = _norm(spark, "https://a.example/search?q=gclid%3Dabc&gclid=real&page=2")
        assert norm == "https://a.example/search?q=gclid%3Dabc&page=2"
        # and a param merely SUFFIXED with utm_ is untouched
        norm2, _ = _norm(spark, "https://a.example/p?xutm_source=1&id=2")
        assert norm2 == "https://a.example/p?xutm_source=1&id=2"

    def test_consecutive_tracking_params_all_removed(self, spark):
        norm, _ = _norm(
            spark,
            "https://a.example/p?utm_a=1&utm_b=2&utm_c=3&utm_d=4&utm_e=5&id=9",
        )
        assert norm == "https://a.example/p?id=9"

    def test_uppercase_scheme_gets_port_and_slash_rules(self, spark):
        assert _norm(spark, "HTTP://Host.example:80/")[0] == "http://host.example"
        assert _norm(spark, "HTTPS://Host.example:443/a")[0] == "https://host.example/a"

    def test_cap_without_dedup_keeps_duplicate_norm_urls(self, spark):
        """max_pages_per_domain alone must NOT collapse same-norm_url pages."""
        from graphrag_mrkr_2_spark.plans.pipeline import run_kg_pipeline
        from graphrag_mrkr_2_spark.sources.pages import generate_pages

        base = generate_pages(spark, 4)
        dup = base.withColumn("url", F.concat("url", F.lit("?utm_source=x")))
        pages = base.unionByName(dup)
        res = run_kg_pipeline(
            pages, max_pages_per_domain=1000, cache_mentions=False
        )
        n_docs = res.mentions.select("document_id").distinct().count()
        # utm-variant urls hash to DIFFERENT document ids -> both kept
        assert n_docs == 8
