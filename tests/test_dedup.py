

class TestRepresentatives:
    def test_longest_wins_outside_survive(self, spark):
        from graphrag_mrkr_2_spark.operators.dedup import pick_representatives

        docs = spark.createDataFrame(
            [("a", "short"), ("b", "much longer text"), ("c", "mid text"),
             ("z", "untouched outsider")],
            "doc_id string, text string",
        )
        clusters = spark.createDataFrame(
            [("a", "g1"), ("b", "g1"), ("c", "g1")], "node string, cluster_id string"
        )
        out = {r["doc_id"]: r["is_representative"] for r in pick_representatives(docs, clusters).collect()}
        assert out == {"a": False, "b": True, "c": False, "z": True}

    def test_tie_breaks_by_smallest_id(self, spark):
        from graphrag_mrkr_2_spark.operators.dedup import pick_representatives

        docs = spark.createDataFrame(
            [("a2", "same"), ("a1", "same")], "doc_id string, text string"
        )
        clusters = spark.createDataFrame(
            [("a1", "g"), ("a2", "g")], "node string, cluster_id string"
        )
        out = {r["doc_id"]: r["is_representative"] for r in pick_representatives(docs, clusters).collect()}
        assert out == {"a1": True, "a2": False}

    def test_no_null_partition_window(self, spark):
        """Non-clustered docs must not pass through a window (single-task
        NULL partition): the window's input is the MEMBER join, so the
        plan contains exactly one Window whose subtree joins on the member
        ids — pinned via explain, not just row counts."""
        from graphrag_mrkr_2_spark.operators.dedup import pick_representatives

        docs = spark.createDataFrame(
            [(f"d{i}", "x" * i) for i in range(50)], "doc_id string, text string"
        )
        clusters = spark.createDataFrame([("d1", "g")], "node string, cluster_id string")
        out = pick_representatives(docs, clusters)
        assert out.where("is_representative").count() == 50  # all survive
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # exactly one window, and it sits above the member-side join —
        # never above the bare corpus scan
        assert plan.count("Window") == 1
        w_idx = plan.index("Window")
        assert "Join" in plan[w_idx:], "window must consume the member join"

    def test_overlapping_clusters_resolve_to_one(self, spark):
        """A node in two clusters (raw LSH bands) keeps ONE row, assigned
        to the lexicographically smallest cluster."""
        from graphrag_mrkr_2_spark.operators.dedup import pick_representatives

        docs = spark.createDataFrame(
            [("d1", "text one"), ("d2", "longer text two")],
            "doc_id string, text string",
        )
        clusters = spark.createDataFrame(
            [("d1", "g2"), ("d1", "g1"), ("d2", "g1")],
            "node string, cluster_id string",
        )
        rows = pick_representatives(docs, clusters).collect()
        assert len(rows) == 2  # no duplicated d1
        by_id = {r["doc_id"]: r for r in rows}
        assert by_id["d1"]["cluster_id"] == "g1"
        # within g1, d2 has longer text -> d2 wins, d1 loses
        assert by_id["d2"]["is_representative"] and not by_id["d1"]["is_representative"]

    def test_preexisting_cluster_column_replaced(self, spark):
        from graphrag_mrkr_2_spark.operators.dedup import pick_representatives

        docs = spark.createDataFrame(
            [("d1", "abc", "stale")], "doc_id string, text string, cluster_id string"
        )
        clusters = spark.createDataFrame([("d1", "fresh")], "node string, cluster_id string")
        row = pick_representatives(docs, clusters).collect()[0]
        assert row["cluster_id"] == "fresh"
