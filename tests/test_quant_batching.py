"""int8 quantization (operators/similarity.py) and padding-waste
batching accounting (operators/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.curation import padding_waste
from cassandra_slow_queries_spark.operators.similarity import (
    dequantize_cosine,
    quantize_int8,
)


def test_quantize_int8_exact_values(spark):
    df = spark.createDataFrame(
        [
            (1, [127.0, -127.0, 0.0]),  # scale 1 → codes verbatim
            (2, [1.0, 0.5, -0.25]),     # scale 1/127
            (3, [0.0, 0.0]),            # all-zero → scale 0, codes 0
        ],
        ["vec_id", "embedding"],
    )
    q = quantize_int8(df)
    rows = {r["vec_id"]: r for r in q.collect()}
    assert rows[1]["codes"] == [127, -127, 0]
    assert rows[1]["scale"] == 1.0
    assert rows[2]["codes"] == [127, 64, -32]  # round(63.5)=64 half-up
    assert rows[3]["codes"] == [0, 0]
    assert rows[3]["scale"] == 0.0


def test_quantize_int8_bounds_and_fidelity(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-3, 3) for _ in range(32)]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = quantize_int8(df)
    out = q.select(
        "vec_id",
        F.array_max(F.transform("codes", lambda c: F.abs(c))).alias("mx"),
        dequantize_cosine().alias("fid"),
    ).collect()
    assert all(r["mx"] <= 127 for r in out)
    assert all(r["fid"] >= 0.999 for r in out)


def test_quantize_int8_zero_vector_fidelity_null(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], ["vec_id", "embedding"])
    q = quantize_int8(df)
    assert q.select(dequantize_cosine().alias("f")).collect()[0]["f"] is None


# ----------------------------------------------------- padding waste ---


def test_padding_waste_closed_form(spark):
    # lengths 10,1,10,1 at batch_size 2:
    # arrival  → [10,1],[10,1]: padded 2·10+2·10 = 40, total 22
    # sorted   → [1,1],[10,10]: padded 2·1+2·10 = 22, total 22 → 0 waste
    df = spark.createDataFrame(
        [(1, 10), (2, 1), (3, 10), (4, 1)], ["doc_id", "n_tok"]
    )
    arrival = padding_waste(
        df, "n_tok", 2, [F.col("doc_id").asc()]
    ).collect()[0]
    assert (
        arrival["n_batches"],
        arrival["total_tokens"],
        arrival["padded_tokens"],
    ) == (2, 22, 40)
    assert arrival["waste_frac"] == pytest.approx(18 / 40)
    by_len = padding_waste(
        df, "n_tok", 2, [F.col("n_tok").asc(), F.col("doc_id").asc()]
    ).collect()[0]
    assert by_len["padded_tokens"] == 22 and by_len["waste_frac"] == 0.0


def test_padding_waste_partial_last_batch(spark):
    # 3 rows, batch 2: last batch has 1 row → padded = its own length
    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 9)], ["doc_id", "n_tok"]
    )
    r = padding_waste(df, "n_tok", 2, [F.col("doc_id").asc()]).collect()[0]
    assert r["n_batches"] == 2
    assert r["padded_tokens"] == 2 * 5 + 1 * 9
    assert r["waste_frac"] == 0.0


def test_assign_token_shards_and_manifest(spark):
    from cassandra_slow_queries_spark.operators.curation import (
        assign_token_shards,
        shard_manifest,
    )

    # lengths 5,5,5,12,3 at target 10, doc order:
    # cum = 5,10,15,27,30 → shard = (cum-1)//10 = 0,0,1,2,2
    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5), (4, 12), (5, 3)], ["doc_id", "n_tok"]
    )
    sharded = assign_token_shards(
        df, "n_tok", [F.col("doc_id").asc()], target_tokens=10,
        num_ranges=3,
    )
    assign = {r["doc_id"]: r["shard"] for r in sharded.collect()}
    assert assign == {1: 0, 2: 0, 3: 1, 4: 2, 5: 2}
    mani = {
        r["shard"]: (r["n_docs"], r["n_tokens"])
        for r in shard_manifest(sharded, "n_tok").collect()
    }
    assert mani == {0: (2, 10), 1: (1, 5), 2: (2, 15)}


def test_assign_token_shards_zero_token_leader(spark):
    # a zero-token document first in the order (cum = 0) lands in
    # shard 0, not a phantom shard -1 (floor-vs-truncate review finding)
    from cassandra_slow_queries_spark.operators.curation import (
        assign_token_shards,
    )

    df = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 0), (4, 7)], ["doc_id", "n_tok"]
    )
    sharded = assign_token_shards(
        df, "n_tok", [F.col("doc_id").asc()], target_tokens=10,
        num_ranges=2,
    )
    assign = {r["doc_id"]: r["shard"] for r in sharded.collect()}
    # cum = 0,5,5,12 → shards 0,0,0,1
    assert assign == {1: 0, 2: 0, 3: 0, 4: 1}
