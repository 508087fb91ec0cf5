"""Hash-sharded training-data delivery: deterministic membership, correct
partition layout on disk, and in-shard ordering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.sampling import shard_assign, write_shards
from gmall_flink_yb_spark.sources.readers import read_table


def test_assignment_deterministic_and_complete(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["shard"]
         for r in shard_assign(docs, "doc_id", 8).collect()}
    b = {r["doc_id"]: r["shard"]
         for r in shard_assign(docs, "doc_id", 8).collect()}
    assert a == b
    assert set(a.values()) <= set(range(8))
    assert len(a) == docs.count()


def test_membership_independent_of_corpus(spark, sf_dir):
    """Adding/removing other docs must not move a doc's shard (md5 keying,
    not round-robin): assign on a filtered half and compare."""
    docs = read_table(spark, sf_dir, "documents")
    full = {r["doc_id"]: r["shard"]
            for r in shard_assign(docs, "doc_id", 8).collect()}
    half = {r["doc_id"]: r["shard"]
            for r in shard_assign(
                docs.filter(F.col("doc_id") % 2 == 0), "doc_id", 8
            ).collect()}
    for k, v in half.items():
        assert full[k] == v


def test_write_shards_layout_and_order(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    path = str(tmp_path / "shards")
    write_shards(docs, path, "doc_id", n_shards=4, order_col="doc_id")
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # every row landed in the directory its md5 assignment says
    expect = {r["doc_id"]: r["shard"]
              for r in shard_assign(docs, "doc_id", 4).collect()}
    for r in back.select("doc_id", "shard").collect():
        assert expect[r["doc_id"]] == int(r["shard"])
    # partition dirs exist (hive-style) — the loader's contract
    shard_dirs = {p.name for p in (tmp_path / "shards").iterdir()
                  if p.name.startswith("shard=")}
    assert shard_dirs == {f"shard={i}" for i in range(4)}


def test_validates_n_shards(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="n_shards"):
        shard_assign(docs, "doc_id", 0)
