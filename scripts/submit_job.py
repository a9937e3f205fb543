"""spark-submit entry point for the KG-construction pipeline.

The north rule runs the job via ``spark-submit --py-files`` on a multi-
executor cluster. This is that entry point: it assumes the package arrives
through ``--py-files graphrag_mrkr_2_spark.zip`` (no repo checkout on the
executors) and takes only data paths + knobs:

    zip -qr /tmp/graphrag_mrkr_2_spark.zip graphrag_mrkr_2_spark
    spark-submit \
        --master <cluster-master> \
        --py-files /tmp/graphrag_mrkr_2_spark.zip \
        scripts/submit_job.py \
        --pages  <pages parquet/warc dir> \
        --out    <output catalog dir> \
        [--format parquet|warc|jsonl|binary] [--demo-pages N]

On a real cluster nothing changes except ``--master`` and the paths; in
this sandbox ``scripts/submit_smoke.sh`` runs it end-to-end under
``local[4]`` with the zip shipped exactly as above (the driver process
imports the package from the zip, not from the working tree).

Writes nodes/edges/triples parquet under --out and prints one JSON line of
counts + timings to stdout for the calling orchestrator.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=False, help="input pages (parquet dir)")
    ap.add_argument(
        "--demo-pages",
        type=int,
        default=0,
        help="demo mode: N deterministic synthetic crawl pages (sources/pages.py)",
    )
    ap.add_argument("--out", required=True)
    ap.add_argument("--format", default="parquet", choices=["parquet", "warc", "jsonl", "binary"])
    ap.add_argument("--max-pages", type=int, default=0)
    args = ap.parse_args()

    # imports AFTER argparse so --help works without the zip on sys.path
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("kg-construct").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from graphrag_mrkr_2_spark.plans.pipeline import run_kg_pipeline
    from graphrag_mrkr_2_spark.sources import loaders

    t0 = time.time()
    if args.pages:
        if args.format == "warc":
            pages = loaders.read_warc_pages(spark, args.pages)
        elif args.format == "jsonl":
            pages = loaders.read_jsonl_pages(spark, args.pages)
        elif args.format == "binary":
            pages = loaders.read_binary_documents(spark, args.pages)
        else:
            pages = spark.read.parquet(args.pages)
    else:
        assert args.demo_pages, "need --pages or --demo-pages N"
        from graphrag_mrkr_2_spark.sources.pages import generate_pages

        pages = generate_pages(spark, args.demo_pages)
    if args.max_pages:
        pages = pages.limit(args.max_pages)

    result = run_kg_pipeline(pages)
    nodes, edges, triples = result.nodes, result.edges, result.triples
    nodes.write.mode("overwrite").parquet(f"{args.out}/nodes")
    edges.write.mode("overwrite").parquet(f"{args.out}/edges")
    triples.write.mode("overwrite").parquet(f"{args.out}/triples")

    summary = {
        "n_nodes": spark.read.parquet(f"{args.out}/nodes").count(),
        "n_edges": spark.read.parquet(f"{args.out}/edges").count(),
        "n_triples": spark.read.parquet(f"{args.out}/triples").count(),
        "wall_sec": round(time.time() - t0, 2),
        "package_source": __import__("graphrag_mrkr_2_spark").__file__,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
