"""Source/sink format round-trips: write-schema == read-schema, lossless."""

from __future__ import annotations

import os

from flink_estimator_spark.sources.formats import (
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
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
