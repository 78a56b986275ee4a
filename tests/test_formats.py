"""Source/sink format round-trips: write-schema == read-schema, lossless."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_estimator_spark.sources.formats import (
    read_csv,
    read_jsonl,
    read_orc,
    read_xml,
    write_csv,
    write_jsonl,
    write_orc,
    write_xml,
)
from flink_estimator_spark.sources.tables import read_table
from tests.conftest import SF_SMALL


def _table(spark, name):
    return read_table(spark, os.path.join(SF_SMALL, f"{name}.parquet"))


def _assert_same(a, b):
    assert a.schema == b.schema, f"{a.schema} != {b.schema}"
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_csv_round_trip_events(spark, tmp_path):
    src = _table(spark, "events").repartition(4)
    p = str(tmp_path / "events_csv")
    write_csv(src, p)
    back = read_csv(spark, p, src.schema)
    _assert_same(src, back)
    parts = [f for f in os.listdir(p) if f.startswith("part-")]
    assert len(parts) > 1, "sink must not serialize through one file"


def test_csv_round_trip_lineitem(spark, tmp_path):
    src = _table(spark, "lineitem")
    p = str(tmp_path / "lineitem_csv")
    write_csv(src, p)
    _assert_same(src, read_csv(spark, p, src.schema))


def test_jsonl_round_trip_embeddings(spark, tmp_path):
    # array<float> column: JSON keeps the nesting CSV cannot
    src = _table(spark, "embeddings")
    p = str(tmp_path / "emb_json")
    write_jsonl(src, p)
    _assert_same(src, read_jsonl(spark, p, src.schema))


def test_jsonl_round_trip_orders(spark, tmp_path):
    src = _table(spark, "orders")
    p = str(tmp_path / "orders_json")
    write_jsonl(src, p)
    _assert_same(src, read_jsonl(spark, p, src.schema))


def test_orc_round_trip_documents(spark, tmp_path):
    src = _table(spark, "documents")
    p = str(tmp_path / "docs_orc")
    write_orc(src, p)
    _assert_same(src, read_orc(spark, p))


def test_orc_round_trip_embeddings(spark, tmp_path):
    src = _table(spark, "embeddings")
    p = str(tmp_path / "emb_orc")
    write_orc(src, p)
    _assert_same(src, read_orc(spark, p))


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    from flink_estimator_spark.sources.formats import (
        read_partitioned,
        write_partitioned,
    )
    from flink_estimator_spark.sources.tables import read_table

    orders = read_table(spark, os.path.join(SF_SMALL, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    path = str(tmp_path / "orders_by_priority")
    write_partitioned(orders, path, "o_orderpriority")

    back = read_partitioned(spark, path)
    one = back.filter(F.col("o_orderpriority") == "1-URGENT")

    # value parity with the unpartitioned filter
    exp = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    assert sorted(r["o_orderkey"] for r in one.collect()) == sorted(
        r["o_orderkey"] for r in exp.collect()
    )

    # the filter must prune at the scan, not post-filter: the physical scan
    # advertises PartitionFilters on the key and reads only that directory
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderpriority" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan

    # and the partition column is NOT materialized in the data files: a
    # pruned read touches strictly fewer files than the full table
    n_all = back.select(F.input_file_name()).distinct().count()
    n_pruned = one.select(F.input_file_name()).distinct().count()
    assert 0 < n_pruned < n_all


def test_compaction_collapses_small_files(spark, tmp_path):
    from flink_estimator_spark.sources.formats import compact

    src = _table(spark, "events")
    many = str(tmp_path / "many_small")
    src.repartition(64).write.parquet(many)  # 64 tiny files
    n_in = len([f for f in os.listdir(many) if f.startswith("part-")])
    assert n_in >= 64

    dst = str(tmp_path / "compacted")
    n_out = compact(spark, many, dst, target_file_bytes=1 * 1024 * 1024)
    assert n_out < n_in / 8, f"{n_in} -> {n_out}: not compacted"
    back = spark.read.parquet(dst)
    assert back.count() == src.count()
    assert back.exceptAll(spark.read.parquet(many)).count() == 0


def test_clustered_write_enables_row_group_skipping(spark, tmp_path):
    """write_clustered's footer-level contract: sorting within files makes
    per-row-group min/max ranges near-disjoint, so a range predicate can
    skip most groups; the same data written unsorted cannot skip."""
    import datetime

    import pyarrow.parquet as pq

    from flink_estimator_spark.sources.formats import write_clustered

    li = _table(spark, "lineitem").select("l_shipdate", "l_orderkey", "l_quantity")
    clustered = str(tmp_path / "clustered")
    unsorted = str(tmp_path / "unsorted")
    write_clustered(li, clustered, "l_shipdate", block_bytes=16 * 1024)
    # control: identical rows, identical block size, no clustering
    li.write.mode("overwrite").option("parquet.block.size", 16 * 1024).parquet(unsorted)

    def group_ranges(path):
        ranges = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = md.schema.to_arrow_schema().get_field_index("l_shipdate")
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                ranges.append((st.min, st.max))
        return ranges

    cr, ur = group_ranges(clustered), group_ranges(unsorted)
    assert len(cr) >= 4, f"fixture too small to form row groups: {len(cr)}"
    assert len(ur) >= 4

    # a one-quarter probe in the middle of the fixture's shipdate range
    # (footer stats for this column surface as naive datetimes)
    lo = datetime.datetime(1999, 1, 1)
    hi = datetime.datetime(1999, 3, 31)

    def candidates(ranges):
        return sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))

    c_hit, u_hit = candidates(cr), candidates(ur)
    # unsorted groups all span ~the full range -> nothing skips
    assert u_hit == len(ur), (u_hit, len(ur))
    # clustered groups are near-disjoint -> most skip (selectivity ~4%)
    assert c_hit <= max(2, len(cr) // 2), (c_hit, len(cr))
    # and the data still round-trips
    assert spark.read.parquet(clustered).count() == li.count()


def test_dynamic_partition_pruning_on_join(spark, tmp_path):
    """Dynamic partition pruning: joining a partitioned fact to a filtered
    dimension prunes fact partitions at RUNTIME from the dim's join keys —
    the plan must carry a dynamicpruning subquery on the partition column.
    At 100 TB this is the difference between scanning a year and scanning
    the three days a dim filter selects, without any literal date filter
    on the fact side."""
    import contextlib
    import io

    ev = _table(spark, "events")
    path = str(tmp_path / "ev_by_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("purchase", 1), ("error", 2), ("view", 3)],
        "event_type string, code int",
    ).filter(F.col("code") == 1)

    joined = fact.join(dim, "event_type").groupBy("event_type").count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]

    rows = {r["event_type"]: r["count"] for r in joined.collect()}
    exp = ev.filter(F.col("event_type") == "purchase").count()
    assert rows == {"purchase": exp}


def test_binary_file_source_roundtrip(spark, tmp_path):
    """binaryFile ingests opaque assets byte-exactly, pathGlobFilter prunes
    by name before read, and the (path, length, content) shape feeds the
    multimodal parquet layout unchanged."""
    import os

    from flink_estimator_spark.sources.formats import read_binary_files

    payloads = {
        "a.img": b"\x89FAKE-IMG\x00" * 7,
        "b.img": b"\x00\x01\x02" * 11,
        "skip.txt": b"not an image",
    }
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)

    df = read_binary_files(spark, str(tmp_path), glob="*.img")
    rows = {os.path.basename(r["path"]): r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}
    for name in rows:
        assert bytes(rows[name]["content"]) == payloads[name]
        assert rows[name]["length"] == len(payloads[name])

    # the multimodal pipeline's parquet layout: binary column survives a
    # parquet round-trip byte-exactly
    out = str(tmp_path / "assets_parquet")
    df.select("path", "content").write.mode("overwrite").parquet(out)
    back = {
        os.path.basename(r["path"]): bytes(r["content"])
        for r in spark.read.parquet(out).collect()
    }
    assert back == {n: p for n, p in payloads.items() if n.endswith(".img")}


def test_zorder_write_skips_row_groups_on_both_dims(spark, tmp_path):
    """write_zordered's footer contract: with rows Morton-ordered on
    (l_partkey, l_suppkey), a range predicate on EITHER column can skip a
    majority of row groups via min/max stats — the single-key sorted
    layout only ever skips on its sort key."""
    import pyarrow.parquet as pq
    from flink_estimator_spark.sources.formats import write_clustered, write_zordered
    from flink_estimator_spark.sources.tables import read_table
    from tests.conftest import SF_SMALL

    # sf0.01 (60k rows -> ~45 row groups at 32 KiB): z-curve locality
    # scales as sqrt(1/n_groups), so the sf0.001 fixture's ~9 groups give
    # half-width projections and prove nothing either way
    li = read_table(spark, "/root/testdata/sf0.01/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    ).repartition(1)
    zpath, spath = str(tmp_path / "zord"), str(tmp_path / "sorted")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", block_bytes=32 * 1024)
    write_clustered(li, spath, "l_partkey", block_bytes=32 * 1024)

    def group_ranges(path, col):
        out = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = md.schema.names.index(col)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                out.append((st.min, st.max))
        return out

    def surviving(ranges, lo, hi):
        return sum(1 for mn, mx in ranges if mx >= lo and mn <= hi)

    # a ~10%-selectivity band on each dimension
    for col in ("l_partkey", "l_suppkey"):
        vals = sorted(r[0] for r in li.select(col).collect())
        lo = vals[int(len(vals) * 0.45)]
        hi = vals[int(len(vals) * 0.55)]
        zr = group_ranges(zpath, col)
        assert len(zr) >= 8, f"need multiple row groups, got {len(zr)}"
        z_hit = surviving(zr, lo, hi) / len(zr)
        assert z_hit < 0.6, f"z-order skipped too little on {col}: {z_hit:.2f}"

    # the single-key layout cannot skip on the OTHER key
    sr = group_ranges(spath, "l_suppkey")
    vals = sorted(r[0] for r in li.select("l_suppkey").collect())
    lo, hi = vals[int(len(vals) * 0.45)], vals[int(len(vals) * 0.55)]
    s_hit = surviving(sr, lo, hi) / len(sr)
    assert s_hit > 0.9, f"sorted-on-partkey unexpectedly skips suppkey: {s_hit:.2f}"


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema evolution on a growing parquet directory: files written
    before a column existed read back as NULL for that column under
    mergeSchema, existing columns stay byte-identical, and the default
    (no-merge) read of the directory still works on the common prefix —
    the append-only evolution contract a long-lived table relies on."""
    from flink_estimator_spark.sources.tables import read_table
    from tests.conftest import SF_SMALL

    docs = read_table(spark, os.path.join(SF_SMALL, "documents.parquet"))
    base = str(tmp_path / "evolving")
    v1 = docs.select("doc_id", "source").filter(F.col("doc_id") < 100)
    v2 = docs.select(
        "doc_id", "source", F.col("n_chars").alias("added_later")
    ).filter(F.col("doc_id") >= 100)
    v1.write.parquet(base + "/batch=1")
    v2.write.parquet(base + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(
        base + "/batch=1", base + "/batch=2"
    )
    assert set(merged.columns) == {"doc_id", "source", "added_later"}
    old = merged.filter(F.col("doc_id") < 100)
    assert old.filter(F.col("added_later").isNotNull()).count() == 0
    new = merged.filter(F.col("doc_id") >= 100)
    assert new.filter(F.col("added_later").isNull()).count() == 0
    exp = {
        (r["doc_id"], r["n_chars"])
        for r in docs.filter(F.col("doc_id") >= 100)
        .select("doc_id", "n_chars")
        .collect()
    }
    got = {(r["doc_id"], r["added_later"]) for r in new.collect()}
    assert got == exp


def test_xml_round_trip_orders(spark, tmp_path):
    src = _table(spark, "orders").repartition(4)
    p = str(tmp_path / "orders_xml")
    write_xml(src, p)
    back = read_xml(spark, p, src.schema)
    _assert_same(src, back)
    parts = [f for f in os.listdir(p) if f.startswith("part-")]
    assert len(parts) > 1, "sink must not serialize through one file"


def test_xml_round_trip_documents(spark, tmp_path):
    # free text with spaces/punctuation must survive XML escaping
    src = _table(spark, "documents")
    p = str(tmp_path / "docs_xml")
    write_xml(src, p)
    _assert_same(src, read_xml(spark, p, src.schema))
