"""Ingest-path tests (SURVEY S4 variants: 1-based/0-based labels, header
row, label-less mode) against temp CSV renderings of the blob fixture."""

import os

import pytest
from pyspark.sql import functions as F

from mopso_engine.io import points_from_embeddings, read_points_csv


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory, blobs):
    ids, x, labels, _ = blobs
    d = tmp_path_factory.mktemp("csv")
    # labeled, 1-based
    with open(d / "labeled.csv", "w") as f:
        for xi, l in zip(x, labels):
            f.write(",".join(f"{v:.10f}" for v in xi) + f",{l}\n")
    # labeled, 0-based
    with open(d / "zero.csv", "w") as f:
        for xi, l in zip(x, labels):
            f.write(",".join(f"{v:.10f}" for v in xi) + f",{l - 1}\n")
    # with header
    with open(d / "header.csv", "w") as f:
        f.write(",".join(f"f{i}" for i in range(x.shape[1])) + ",label\n")
        for xi, l in zip(x, labels):
            f.write(",".join(f"{v:.10f}" for v in xi) + f",{l}\n")
    # unlabeled
    with open(d / "unlabeled.csv", "w") as f:
        for xi in x:
            f.write(",".join(f"{v:.10f}" for v in xi) + "\n")
    return str(d)


def test_labeled_parse(spark, csv_dir, blobs):
    _, x, labels, _ = blobs
    df = read_points_csv(spark, os.path.join(csv_dir, "labeled.csv"))
    rows = df.collect()
    assert len(rows) == len(x)
    assert {r["label"] for r in rows} == set(labels.tolist())
    assert all(len(r["features"]) == x.shape[1] for r in rows)


def test_zero_based_remap(spark, csv_dir, blobs):
    _, _, labels, _ = blobs
    df = read_points_csv(spark, os.path.join(csv_dir, "zero.csv"), zero_based_labels=True)
    # labels shifted +1 → back to the 1-based originals
    assert {r["label"] for r in df.collect()} == set(labels.tolist())


def test_header_drop(spark, csv_dir, blobs):
    _, x, _, _ = blobs
    df = read_points_csv(spark, os.path.join(csv_dir, "header.csv"), header=True)
    assert df.count() == len(x)


def test_unlabeled_mode(spark, csv_dir, blobs):
    _, x, _, _ = blobs
    df = read_points_csv(spark, os.path.join(csv_dir, "unlabeled.csv"), labeled=False)
    rows = df.collect()
    assert len(rows) == len(x)
    assert all(r["label"] == 0 for r in rows)
    assert all(len(r["features"]) == x.shape[1] for r in rows)  # all columns are features


def test_write_report_and_parquet_sinks(spark, tmp_path, blobs_df):
    import glob
    import json

    from mopso_engine.io import timestamped_path, write_points_parquet, write_report

    p = write_report({"a": 1, "nested": {"b": [1.5]}}, str(tmp_path / "r" / "report.json"))
    assert json.load(open(p)) == {"a": 1, "nested": {"b": [1.5]}}

    out = str(tmp_path / "pts")
    write_points_parquet(blobs_df, out, single_file=True)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 1  # single-partition write (reference S5/X8)
    assert spark.read.parquet(out).count() == blobs_df.count()

    tp = timestamped_path(str(tmp_path))
    assert tp.startswith(str(tmp_path))
    assert len(tp.split("/")[-1]) == 19  # yyyy-MM-dd-HH-mm-ss


def test_points_from_embeddings_schema(spark):
    df = points_from_embeddings(spark, "/root/testdata/sf0.001")
    assert df.schema.simpleString() == "struct<id:bigint,features:array<double>,label:int>"
    assert df.count() == 500
    assert df.agg({"label": "min"}).collect()[0][0] == 1  # 1-based


def test_read_documents_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    """JSONL ingest: declared schema (no inference pass), PERMISSIVE
    quarantine — malformed lines land in _corrupt_record instead of
    failing the job; clean rows parse with stable types."""
    from mopso_engine.io import read_documents_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11}\n'
        '{"doc_id": 2, "text": "guten tag", "lang": "de", "source": "s1", "n_chars": 9}\n'
        "THIS IS NOT JSON{{{\n"
        '{"doc_id": 3, "text": "ok", "lang": "en", "source": "s0", "n_chars": 2}\n'
    )
    df = read_documents_jsonl(spark, str(p))
    rows = df.collect()
    clean = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["doc_id"] for r in clean} == {1, 2, 3}
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt_record"]
    # schema is stable and declared, not inferred
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars", "_corrupt_record"
    ]


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """20 tiny input files compact to the computed file count with
    content preserved exactly."""
    from mopso_engine.io import compact_parquet

    src, dst = str(tmp_path / "small"), str(tmp_path / "compact")
    df = spark.range(2000).withColumn("v", F.col("id") * 2)
    df.repartition(20).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*.parquet")) == 20
    n = compact_parquet(spark, src, dst, target_file_mb=1)
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == n and n < 20
    got = spark.read.parquet(dst).orderBy("id").collect()
    assert len(got) == 2000 and got[7]["v"] == 14


def test_write_sorted_range_partitioned_layout(spark, tmp_path):
    """write_sorted: plan carries a RangePartitioning exchange, and the
    resulting files hold DISJOINT, internally-sorted key ranges — the
    row-group-skipping layout."""
    from mopso_engine.io import write_sorted

    dst = str(tmp_path / "sorted")
    df = spark.range(0, 10000).withColumn("k", (F.col("id") * 7919) % 10000)
    plan_df = df.repartitionByRange(4, "k").sortWithinPartitions("k")
    assert "rangepartitioning" in plan_df._jdf.queryExecution().executedPlan().toString().lower()
    write_sorted(df, dst, sort_by="k", n_files=4)
    import glob

    ranges = []
    for f in sorted(glob.glob(f"{dst}/part-*.parquet")):
        pdf = spark.read.parquet(f).select("k").toPandas()
        assert (pdf["k"].values == sorted(pdf["k"].values)).all()  # sorted within file
        ranges.append((pdf["k"].min(), pdf["k"].max()))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint key ranges across files
    assert spark.read.parquet(dst).count() == 10000


def test_zvalue_interleave_exact(spark):
    """zvalue must be the exact Morton interleave: hand-computed cases
    plus round-trip de-interleave over random pairs."""
    from mopso_engine.io import zvalue

    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (1234, 4321)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in df.withColumn("z", zvalue(["x", "y"])).collect()}

    def morton(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y)


def test_zvalue_bits_overflow_rejected(spark):
    from mopso_engine.io import zvalue
    import pytest as _pt

    with _pt.raises(ValueError):
        zvalue(["a", "b", "c", "d"], bits=16)


def test_write_zordered_clusters_both_dims(spark, tmp_path):
    """After a z-ordered write on (x, y), each file's span in EACH
    dimension must be a small fraction of the global range — the
    property that makes row-group min/max skipping work on both
    columns. A single-key sort can't do this for the second column."""
    from mopso_engine.io import write_zordered
    import glob

    n = 1 << 14
    # x random-ish, y anti-correlated with x: a plain x-sort leaves y
    # spans at ~full range in every file
    df = (
        spark.range(0, n)
        .withColumn("x", (F.col("id") * 7919) % 256)
        .withColumn("y", ((F.col("id") * 104729) + F.col("id") / 7) .cast("long") % 256)
    )
    dst = str(tmp_path / "zord")
    write_zordered(df, dst, by=["x", "y"], bits=8, n_files=16)
    spans_x, spans_y = [], []
    for f in glob.glob(f"{dst}/part-*.parquet"):
        pdf = spark.read.parquet(f).select("x", "y").toPandas()
        spans_x.append(int(pdf.x.max() - pdf.x.min()))
        spans_y.append(int(pdf.y.max() - pdf.y.min()))
    import statistics

    # 16 files over a 256×256 grid → ideal hyper-rectangles span ≤ 1/4
    # of each dimension; allow generous slack for range-boundary
    # sampling, but both dims must be far below the full 255 span
    assert statistics.median(spans_x) <= 128
    assert statistics.median(spans_y) <= 128
    assert spark.read.parquet(dst).count() == n


def test_merge_schema_read_unions_epoch_footers(spark, tmp_path):
    """Schema-evolution seam (orders_schema_evolution's layout claim):
    two parquet epochs whose schemas drift — epoch 2 adds a column —
    must read back under mergeSchema as the footer UNION, with
    pre-evolution rows surfacing the added column as NULL."""
    e1 = str(tmp_path / "epoch1")
    e2 = str(tmp_path / "epoch2")
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long"
    ).write.parquet(e1)
    spark.createDataFrame(
        [(3, 30, "x")], "k long, v long, added string"
    ).write.parquet(e2)
    back = spark.read.option("mergeSchema", "true").parquet(e1, e2)
    assert set(back.columns) == {"k", "v", "added"}
    rows = {r["k"]: r for r in back.collect()}
    assert rows[1]["added"] is None and rows[2]["added"] is None
    assert rows[3]["added"] == "x"
    assert back.count() == 3
