"""spark-submit entrypoint for the KG-construction job.

Usage:
  spark-submit --py-files graphrag_mrkr_2_spark.zip scripts/kg_job.py \
      --pages <input> --output /path/to/catalog \
      [--partitions 64] [--strategy html_heading] [--format parquet]

--pages accepts:
  parquet path          input_hint schema (url, warc_ts, html, text, lang)
  synthetic:N           deterministic generated pages (smoke/scale runs)
  --format warc         a directory of WARC(.gz) files (Common-Crawl shape)
  --format jsonl|csv    crawl dumps via sources/loaders.py

On a cluster the same invocation runs unmodified with --master yarn/k8s; the
engine code arrives via --py-files (no install step).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet path or synthetic:N")
    ap.add_argument("--output", required=True, help="snapshot catalog root")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--strategy", default="html_heading")
    ap.add_argument("--fingerprint", default=None, help="input lineage fingerprint")
    ap.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "warc", "jsonl", "csv"],
        help="input format (non-parquet routed through sources/loaders.py)",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("kg-construct").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    from graphrag_mrkr_2_spark.operators.extract import repartition_by_url
    from graphrag_mrkr_2_spark.plans.checkpoint import run_checkpointed

    if args.pages.startswith("synthetic:"):
        from graphrag_mrkr_2_spark.sources.pages import generate_pages

        n = int(args.pages.split(":", 1)[1])
        pages = generate_pages(spark, n, partitions=args.partitions)
        fingerprint = args.fingerprint or f"synthetic-{n}-seed42"
    elif args.format != "parquet":
        from graphrag_mrkr_2_spark.sources import loaders

        reader = {
            "warc": loaders.read_warc_pages,
            "jsonl": loaders.read_jsonl_pages,
            "csv": loaders.read_csv_pages,
        }[args.format]
        pages = reader(spark, args.pages)
        fingerprint = args.fingerprint or f"{args.format}:{args.pages}"
    else:
        pages = spark.read.parquet(args.pages)
        fingerprint = args.fingerprint or args.pages

    pages = repartition_by_url(pages, args.partitions)

    t0 = time.time()
    tables = run_checkpointed(
        spark, pages, args.output, input_fingerprint=fingerprint, strategy=args.strategy
    )
    n_triples = tables["triples"].count()
    print(
        json.dumps(
            {
                "status": "ok",
                "triples": n_triples,
                "nodes": tables["nodes"].count(),
                "seconds": round(time.time() - t0, 2),
                "catalog": args.output,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
