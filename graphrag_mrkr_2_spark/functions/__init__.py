"""Pure-Python deterministic semantics shared by Spark UDFs and unit tests.

Everything in this package is side-effect free and importable on executors
without a SparkSession. The modules here define *what* the reference computes
(normalization, parsing, chunking, scoring); the ``operators`` package decides
*how* Spark executes it.
"""
