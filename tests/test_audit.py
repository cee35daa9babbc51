"""Pipeline-health audit family (ext/audit.py): planted-defect tests.

The declared queries run these audits over CLEAN warehouse tables (all
violation counts zero), so the semantic weight — does a broken row
actually get counted, does a NULL absolve or accuse, does a dead feed
show its lag — lives here, on frames with planted defects.
"""

import pytest
from pyspark.sql import functions as F


class TestContractAudit:
    def test_planted_violations_counted_exactly(self, spark):
        from mopso_engine.ext.audit import contract_audit

        rows = [
            # (id, grp, n_chars, text): a=clean, b=all defect classes
            (1, "a", 5, "hello"),
            (2, "a", 3, "abc"),
            (3, "b", 9, "short"),      # chars contract violated (9 != 5)
            (4, "b", 4, None),          # NULL text -> chars + empty violate
            (5, "b", 0, ""),            # empty text violated
            (5, "b", 2, "xy"),          # duplicate key 5
        ]
        df = spark.createDataFrame(rows, "id long, grp string, n_chars long, text string")
        out = {
            r["grp"]: r
            for r in contract_audit(
                df,
                "grp",
                [
                    ("chars", F.col("n_chars") != F.length("text")),
                    ("empty", F.length("text") == 0),
                ],
                key_col="id",
            ).collect()
        }
        a, b = out["a"], out["b"]
        assert (a["n_rows"], a["n_dup_keys"], a["viol_chars"], a["viol_empty"]) == (2, 0, 0, 0)
        # b: chars violated by id=3 (9!=5) and id=4 (NULL evaluation
        # counts as violation); empty violated by id=4 (NULL) and id=5("")
        assert (b["n_rows"], b["n_dup_keys"], b["viol_chars"], b["viol_empty"]) == (4, 1, 2, 2)

    def test_null_evaluation_is_a_violation_not_an_absolution(self, spark):
        from mopso_engine.ext.audit import contract_audit

        df = spark.createDataFrame([(1, "g", None)], "id long, g string, v long")
        out = contract_audit(df, "g", [("pos", F.col("v") <= 0)]).collect()[0]
        assert out["viol_pos"] == 1

    def test_empty_contract_list_raises(self, spark):
        from mopso_engine.ext.audit import contract_audit

        df = spark.createDataFrame([(1, "g")], "id long, g string")
        with pytest.raises(ValueError):
            contract_audit(df, "g", [])

    def test_duplicate_and_reserved_contract_names_raise(self, spark):
        """ADVICE r11: two contracts sharing a name would emit duplicate
        viol_<name> columns (silently breaking name-based comparison);
        names shadowing the fixed readout columns are rejected too."""
        from mopso_engine.ext.audit import contract_audit

        df = spark.createDataFrame([(1, "g", 1)], "id long, g string, v long")
        with pytest.raises(ValueError, match="duplicate contract names"):
            contract_audit(
                df, "g",
                [("pos", F.col("v") <= 0), ("pos", F.col("v") > 9)],
            )
        with pytest.raises(ValueError, match="collide with the fixed"):
            contract_audit(
                df, "g",
                [("n_rows", F.col("v") <= 0)], key_col="id",
            )

    def test_single_aggregate_no_join_plan(self, spark):
        from mopso_engine.ext.audit import contract_audit

        df = spark.createDataFrame([(1, "g", 1)], "id long, g string, v long")
        plan = (
            contract_audit(df, "g", [("pos", F.col("v") <= 0)], key_col="id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan  # flags fold into the one aggregate


class TestReferentialAudit:
    def test_planted_orphans_and_null_fks(self, spark):
        from mopso_engine.ext.audit import referential_audit

        child = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
        )
        parent = spark.createDataFrame([(10,), (20,), (None,)], "pk long")
        out = referential_audit(
            [("c_to_p", child, "fk", parent, "pk")]
        ).collect()
        assert len(out) == 1
        r = out[0]
        # 99 matches nothing; the NULL FK references nothing (an
        # anti-join alone would silently pass it)
        assert (r["constraint"], r["n_child"], r["n_orphans"]) == ("c_to_p", 4, 2)

    def test_multiple_constraints_sorted_by_name(self, spark):
        from mopso_engine.ext.audit import referential_audit

        c = spark.createDataFrame([(1, 1)], "id long, fk long")
        p = spark.createDataFrame([(1,)], "pk long")
        out = referential_audit(
            [("zeta", c, "fk", p, "pk"), ("alpha", c, "fk", p, "pk")]
        ).collect()
        assert [r["constraint"] for r in out] == ["alpha", "zeta"]
        assert all(r["n_orphans"] == 0 for r in out)

    def test_empty_raises(self, spark):
        from mopso_engine.ext.audit import referential_audit

        with pytest.raises(ValueError):
            referential_audit([])

    def test_empty_child_reports_zero_orphans(self, spark):
        """Review finding: SUM over zero rows is NULL, but an empty
        child (e.g. an empty delta batch audited before publish) has
        ZERO orphans, not unknown-many."""
        from mopso_engine.ext.audit import referential_audit

        child = spark.createDataFrame([], "id long, fk long")
        parent = spark.createDataFrame([(1,)], "pk long")
        r = referential_audit([("c", child, "fk", parent, "pk")]).collect()[0]
        assert (r["n_child"], r["n_orphans"]) == (0, 0)


class TestFreshnessAudit:
    def test_planted_stale_stream(self, spark):
        from mopso_engine.ext.audit import freshness_audit

        # frontier at epoch 200_000; "dead" stopped 100_000s (≈28h) ago,
        # so its trailing-24h window is EMPTY while totals look healthy
        rows = [
            ("live", 200_000), ("live", 190_000), ("live", 100_000),
            ("dead", 100_000), ("dead", 99_000), ("dead", 50_000),
        ]
        df = spark.createDataFrame(
            [(s, e) for s, e in rows], "stream_id string, ep long"
        ).select("stream_id", F.col("ep").cast("timestamp").alias("ts"))
        out = {
            r["stream"]: r
            for r in freshness_audit(df, "stream_id", "ts").collect()
        }
        live, dead = out["live"], out["dead"]
        assert (live["n_rows"], live["max_epoch_s"], live["lag_s"]) == (3, 200_000, 0)
        assert live["n_trailing"] == 2  # 200k and 190k; 100k is outside 86400
        assert (dead["n_rows"], dead["max_epoch_s"], dead["lag_s"]) == (3, 100_000, 100_000)
        assert dead["n_trailing"] == 0  # the detector's whole point

    def test_null_ts_raises(self, spark):
        from mopso_engine.ext.audit import freshness_audit

        df = spark.createDataFrame(
            [("s", None)], "stream_id string, ts timestamp"
        )
        with pytest.raises(Exception) as ei:
            freshness_audit(df, "stream_id", "ts").collect()
        assert "NULL ts" in str(ei.value)
