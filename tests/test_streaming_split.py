"""Streaming face of dedup-aware split assignment: the
cluster_split_ingest_sink must reproduce the BATCH
split_cluster_assign answer over the same corpus once the stream
drains (the incremental-CC exactness contract, one level up), and a
replayed epoch must leave every output byte-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_data_processing_challenge_spark.queries import llm
from pyspark_data_processing_challenge_spark.streaming import events as sev
from tests.conftest import SF_DIR


def _drain(stream, sink, ckpt):
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_cluster_split_equals_batch(spark, tmp_path):
    corpus = llm._perturbed_docs(spark, SF_DIR).cache()
    src = tmp_path / "src"
    src.mkdir()
    # RANGE split, never a modulus split (a parity-aligned batch split
    # makes cross-batch pairs vacuously impossible — the
    # test_streaming_semdedup_ingest lesson). Cut inside the planted-
    # copy id range: epoch 0 holds every original plus the low copies
    # (within-epoch pairs), epoch 1 holds the high copies (every one
    # of its near-dup pairs must come from the STORE).
    cut = 100_000 + 50
    corpus.filter(F.col("doc_id") < cut).coalesce(1).write.parquet(
        str(src / "b1.parquet")
    )
    corpus.filter(F.col("doc_id") >= cut).coalesce(1).write.parquet(
        str(src / "b2.parquet")
    )
    out_dir, store_dir = str(tmp_path / "out"), str(tmp_path / "store")
    sink = sev.cluster_split_ingest_sink(
        out_dir,
        store_dir,
        num_hashes=llm.MH_HASHES,
        shingle_n=llm.MH_SHINGLE_N,
        bands=llm.MH_ND_BANDS,
        threshold=llm.MH_ND_THRESHOLD,
        weights=llm.SPLIT_WEIGHTS,
    )
    stream = (
        spark.readStream.schema(sev.DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(src))
    )
    _drain(stream, sink, str(tmp_path / "ckpt"))

    # two epochs actually ran, and epoch 1 found cross-batch pairs via
    # the signature store (high copies pair with epoch-0 originals)
    ingest = spark.read.schema(
        "doc_id long, cluster long, split string, __epoch int"
    ).parquet(out_dir)
    assert ingest.select("__epoch").distinct().count() == 2
    e1 = ingest.filter("__epoch = 1")
    assert e1.filter(F.col("cluster") != F.col("doc_id")).count() > 0

    # the authoritative read equals the batch operator row-for-row
    got = {
        (r.doc_id, r.cluster, r.split)
        for r in sev.cluster_split_current(
            spark, store_dir, corpus, weights=llm.SPLIT_WEIGHTS
        ).collect()
    }
    want = {
        (r.doc_id, r.cluster, r.split)
        for r in llm.split_cluster_assign(spark, SF_DIR).collect()
    }
    assert got == want

    # replay a committed epoch: outputs and stores must not change
    before_out = sorted(
        tuple(r) for r in spark.read.parquet(out_dir).collect()
    )
    before_store = sorted(
        map(str, spark.read.parquet(store_dir).collect())
    )
    sink(spark.read.parquet(str(src / "b1.parquet")), 0)
    after_out = sorted(
        tuple(r) for r in spark.read.parquet(out_dir).collect()
    )
    after_store = sorted(
        map(str, spark.read.parquet(store_dir).collect())
    )
    assert after_out == before_out
    assert after_store == before_store
    corpus.unpersist()
