"""Driver-contract invariants for __spark_entry__: every oracle key has a
query, names are stable, and the counts stated in the module docstring
match reality (stale counts have bitten twice)."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as em


def test_every_oracle_has_a_query():
    q, o = em.queries(), em.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracles without queries: {missing}"


def test_queries_are_callables_with_stable_names():
    q = em.queries()
    assert all(callable(f) for f in q.values())
    # snake_case identifiers only — the driver uses keys as file/row names
    assert all(re.fullmatch(r"[a-z][a-z0-9_]*", k) for k in q), sorted(q)
    # every distinct callable is registered at most once (a duplicated KEY
    # in the dict literal silently collapses; duplicated VALUES are the
    # detectable symptom of a copy-paste registration)
    fns = list(q.values())
    assert len(fns) == len(set(fns)), "same query function registered twice"


def test_docstring_counts_match_reality():
    m = re.search(r"(\d+) queries, (\d+) with exact DuckDB oracles", em.__doc__)
    assert m, "contract docstring missing the counts line"
    assert (int(m.group(1)), int(m.group(2))) == (
        len(em.queries()),
        len(em.oracle_sql()),
    )


def test_float_aggregation_queries_partition_invariant(spark):
    """The driver hash-compares values; 6dp rounding must absorb partial-
    aggregation order. Re-run the float-heaviest query under different
    shuffle widths and require identical results."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(
            tuple(r)
            for r in em.queries()["er_tfidf_scores"](
                spark, "/root/testdata/sf0.01"
            ).collect()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(
            tuple(r)
            for r in em.queries()["er_tfidf_scores"](
                spark, "/root/testdata/sf0.01"
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
