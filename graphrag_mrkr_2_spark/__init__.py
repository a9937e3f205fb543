"""graphrag_mrkr_2_spark — PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the KG-construction data path of
danve93/graphrag-mrkr-2 (text extraction → chunking → triple extraction with
gleaning → entity linking → canonicalization → similarity edges → community
detection), re-architected as declarative Spark DataFrame stages designed for
Common-Crawl-scale inputs (10^12 documents) rather than the reference's
single-host asyncio pipeline.

Layout:
  functions/  pure-Python deterministic semantics shared by UDFs and tests
              (parser, normalizers, chunker, quality scoring, mock LLM)
  operators/  Spark DataFrame operators (extract, chunk, filter, canonicalize,
              similarity, entity resolution, communities, dedup, ANN)
  sources/    synthetic pages generator + snapshot catalog (parquet-backed,
              Iceberg-style snapshots; real Iceberg when jars are present)
  plans/      end-to-end pipeline composition + checkpoint/resume
"""

__version__ = "0.1.0"
