

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
        NULL partition) — the plan's window sees only clustered rows."""
        from graphrag_mrkr_2_spark.operators.dedup import pick_representatives

        docs = spark.createDataFrame(
            [(f"d{i}", "x" * i) for i in range(50)], "doc_id string, text string"
        )
        clusters = spark.createDataFrame([("d1", "g")], "node string, cluster_id string")
        out = pick_representatives(docs, clusters)
        assert out.where("is_representative").count() == 50  # all survive
