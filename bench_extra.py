"""Per-stage decomposition bench (OPTIMIZATION r08 working instrument).

bench.py is FROZEN for measurement; this sibling isolates each expensive
query's stages with the noop sink (guide §1.4) so optimization targets the
stage that actually costs, not the query label. Prints one JSON line per
measurement; also dumps .explain("formatted") for the headline queries into
plans/r08/ when --plans is given.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench_extra.py [--plans TAG] [--only PREFIX]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from graphrag_mrkr_2_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    plans_tag = None
    only = None
    args = sys.argv[1:]
    for flag in ("--plans", "--only"):
        if flag in args and args.index(flag) + 1 >= len(args):
            sys.exit(f"{flag} requires a value")
    if "--plans" in args:
        plans_tag = args[args.index("--plans") + 1]
    if "--only" in args:
        # NOTE: section gates below use substring matching on the section
        # name ("kg", "dedup", "er", "text", "comm"); timed() labels use
        # prefix matching — pass a section name, not a full label
        only = args[args.index("--only") + 1]

    spark = get_spark(
        app_name="bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = 0.1
    import re as _re

    m = _re.search(r"sf([0-9.]+)", sf_dir)
    if m:
        sf = float(m.group(1))
    n_pages = max(500, int(100000 * sf))

    out: dict[str, float] = {}
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)

    def timed(label, fn, repeats=2):
        if only and not label.startswith(only):
            return None
        best = None
        r = None
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(label)
            t0 = time.time()
            r = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        out[label] = round(best, 3)
        print(json.dumps({label: out[label]}), flush=True)
        return r

    def dump_plan(label, df):
        if not plans_tag:
            return
        p = os.path.join(plans_dir, f"{label}_{plans_tag}.txt")
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(p, "w") as fh:
            fh.write(buf.getvalue())

    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embeddings = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # ---- kg pipeline ------------------------------------------------------
    import shutil
    import tempfile

    from graphrag_mrkr_2_spark.config import DEFAULT_CONFIG as cfg
    from graphrag_mrkr_2_spark.operators.extract import repartition_by_url
    from graphrag_mrkr_2_spark.operators.triples import (
        MENTION_SCHEMA,
        build_edges,
        build_nodes,
        build_triples,
        canonicalize,
        extract_mentions_fused,
    )
    from graphrag_mrkr_2_spark.plans.pipeline import run_kg_pipeline
    from graphrag_mrkr_2_spark.sources.pages import generate_pages

    pages_dir = os.path.join(tempfile.gettempdir(), f"bench_pages_{n_pages}")
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        shutil.rmtree(pages_dir, ignore_errors=True)
        generate_pages(spark, n_pages, partitions=cpus * 2).write.mode(
            "overwrite"
        ).parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)

    if only is None or "kg" in only:
        # warm-up full pass (same rationale as bench.py)
        warm = run_kg_pipeline(pages, num_partitions=cpus * 6, materialize_chunks=True)
        warm.triples.count()
        warm.mentions.unpersist()
        spark.catalog.clearCache()

        pruned = repartition_by_url(pages.select("url", "html", "text"), cpus * 6)

        def _unified():
            return extract_mentions_fused(
                pruned,
                strategy="html_heading",
                chunk_cfg=cfg.chunking,
                filter_cfg=cfg.content_filter,
                max_gleanings=cfg.extraction.max_gleanings,
                emit_chunks=True,
            )

        # stage A: the fused Python extraction alone (noop sink, no checkpoint)
        timed("kg.extract_noop", lambda: noop(_unified()))
        # stage A': extraction + localCheckpoint (what the pipeline pays)
        def _ckpt():
            u = _unified().localCheckpoint(eager=True)
            u.unpersist()
            return None
        timed("kg.extract_checkpoint", _ckpt)

        unified = _unified().localCheckpoint(eager=True)
        mention_cols = [f.name for f in MENTION_SCHEMA.fields]
        mentions = unified.where(F.col("kind") != "chunk").select(*mention_cols)

        # stage B: canonicalize (both tables) to noop
        def _canon():
            e_doc, r_doc = canonicalize(mentions)
            noop(e_doc)
            noop(r_doc)
        timed("kg.canonicalize_noop", _canon)

        # stage C: downstream to triples.count (what bench times after extract)
        def _downstream():
            e_doc, r_doc = canonicalize(mentions)
            return build_triples(build_edges(r_doc)).count()
        timed("kg.canon_to_triples_count", _downstream)

        # stage C2: nodes
        def _nodes():
            e_doc, _r = canonicalize(mentions)
            return build_nodes(e_doc).count()
        timed("kg.canon_to_nodes_count", _nodes)

        e_doc, r_doc = canonicalize(mentions)
        dump_plan("kg_triples_count", build_triples(build_edges(r_doc)))

        # ---- kg similarity ------------------------------------------------
        from graphrag_mrkr_2_spark.operators.similarity import (
            chunk_similarity_edges_grams,
            with_embeddings,
        )

        chunks_mat = unified.where(F.col("kind") == "chunk").select(
            "chunk_id", "document_id", "content", "page", "start_offset",
            "end_offset", "chunk_index", "content_hash", "url",
            "heading_path", "section_title",
        )
        out["kg.n_chunks"] = chunks_mat.count()
        print(json.dumps({"kg.n_chunks": out["kg.n_chunks"]}), flush=True)

        # embed only, noop
        timed("kg.embed_noop", lambda: noop(
            with_embeddings(chunks_mat).select("chunk_id", "document_id", "embedding")
        ))
        # full similarity count (the bench line)
        timed("kg.similarity_count", lambda: chunk_similarity_edges_grams(
            with_embeddings(chunks_mat)).count())
        dump_plan("kg_similarity", chunk_similarity_edges_grams(with_embeddings(chunks_mat)))
        unified.unpersist()

    # ---- dedup minhash ----------------------------------------------------
    if only is None or "dedup" in (only or ""):
        from graphrag_mrkr_2_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_signatures,
            shingle_tokens,
        )

        timed("dedup.shingles_noop", lambda: noop(shingle_tokens(documents)))
        timed("dedup.signatures_noop", lambda: noop(minhash_signatures(documents)))
        timed("dedup.candidates_count", lambda: minhash_lsh_pairs(
            documents, threshold=0.5, verify=False).count())
        timed("dedup.full_count", lambda: minhash_lsh_pairs(
            documents, threshold=0.5).count())
        dump_plan("dedup_minhash_sigs", minhash_signatures(documents))

    # ---- er blocking ------------------------------------------------------
    if only is None or "er" in (only or ""):
        from graphrag_mrkr_2_spark.operators.resolution import (
            candidate_pairs,
            entity_mapping,
            score_pairs,
        )

        ents = documents.select(
            F.col("doc_id").cast("string").alias("entity_id"),
            F.substring("text", 1, 40).alias("name"),
        ).where(F.length(F.trim(F.col("name"))) > 0)
        timed("er.candidates_count", lambda: candidate_pairs(ents).count())
        cands = candidate_pairs(ents).localCheckpoint(eager=True)
        timed("er.score_count", lambda: score_pairs(cands, ents).count())
        timed("er.full_count", lambda: entity_mapping(ents, threshold=0.8).count())
        dump_plan("er_candidates", candidate_pairs(ents))

    # ---- text analysis ----------------------------------------------------
    if only is None or "text" in (only or ""):
        from graphrag_mrkr_2_spark.operators.extract import with_content_filter
        from graphrag_mrkr_2_spark.operators.textstats import (
            with_lang_id,
            with_token_counts,
        )

        timed("text.content_filter", lambda: with_content_filter(
            documents, content_col="text").groupBy("filter_reason").count().collect())
        timed("text.lang_tokens", lambda: with_token_counts(with_lang_id(documents))
              .groupBy("lang_pred")
              .agg(F.sum("ws_tokens"), F.sum("approx_tokens")).collect())
        dump_plan("text_content_filter", with_content_filter(documents, content_col="text")
                  .groupBy("filter_reason").count())
        dump_plan("text_lang_tokens", with_token_counts(with_lang_id(documents))
                  .groupBy("lang_pred").agg(F.sum("ws_tokens"), F.sum("approx_tokens")))

        # hygiene + decontamination
        from graphrag_mrkr_2_spark.operators.textclean import (
            contamination_overlap,
            redact_pii,
            repetition_stats,
        )

        timed("text.redact_pii", lambda: redact_pii(documents).agg(
            F.sum("n_email"), F.sum(F.length("clean_text"))).collect())
        timed("text.repetition", lambda: repetition_stats(documents).agg(
            F.avg("top_word_frac")).collect())

        corpus_10x = (
            documents.select(
                F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep"), "doc_id", "text"
            )
            .select((F.col("doc_id") + F.col("rep") * 1000000).alias("doc_id"), "text")
            .persist()
        )
        corpus_10x.count()
        benchmark_set = documents.where(F.col("doc_id") % 100 == 0).select(
            F.col("doc_id").alias("bench_id"), "text"
        )
        timed("text.decontamination_10x", lambda: contamination_overlap(
            corpus_10x, benchmark_set, n=8).agg(F.count("*"), F.sum("n_hits")).collect())
        dump_plan("decontamination", contamination_overlap(corpus_10x, benchmark_set, n=8)
                  .agg(F.count("*"), F.sum("n_hits")))
        corpus_10x.unpersist()

    # ---- communities ------------------------------------------------------
    if only is None or "comm" in (only or ""):
        from graphrag_mrkr_2_spark.operators.communities import (
            detect_communities,
            normalize_edge_weights,
            project_edges,
        )
        res = run_kg_pipeline(pages, num_partitions=cpus * 6, materialize_chunks=True)
        kg_edges_src = res.edges.localCheckpoint(eager=True)
        res.mentions.unpersist()
        kg_edges = kg_edges_src.select(
            F.col("source_id").alias("src"),
            F.col("target_id").alias("dst"),
            F.col("edge_type"),
            F.col("strength").cast("double").alias("strength"),
            F.lit(None).cast("double").alias("similarity"),
            F.lit(None).cast("double").alias("score"),
        )
        timed("comm.detect", lambda: detect_communities(
            project_edges(normalize_edge_weights(kg_edges))
        ).select("community_id").distinct().count())

    # ---- ann / image / doc decode are already thin or pinned — skip -------

    print(json.dumps({"stage_breakdown": out, "sf": sf, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
