"""Streaming document curation: online near-dup dedup at ingest.

The batch inventory covers one-shot and incremental dedup; this closes
the loop for CONTINUOUS ingestion — the shape of a production training-
data firehose. New document files land in a directory; each micro-batch
is probed against the prebuilt MinHash band index
(:func:`scout_spark.operators.dedup.minhash_probe`), near-dups of the
corpus are dropped, survivors are appended to the corpus parquet AND to
the index (bands + signatures), so later batches dedup against earlier
ones — exactly-once state via the streaming checkpoint plus
idempotent-enough parquet appends (re-delivered batches re-probe
against an index that already contains their survivors, so replays
drop them as dups rather than duplicating them: the probe itself is
the idempotency guard).

At 100 TB the index append is a small sorted write per batch and the
probe reads only matching band buckets; nothing rescans the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_dedup_ingest(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    corpus_path: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, lang string",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
):
    """Start the streaming dedup-ingest query; returns the handle.

    JSON-lines files in ``input_dir`` are the stream. Every micro-batch:
    probe → drop batch docs whose est_jaccard ≥ threshold against the
    CURRENT index → append survivors to corpus parquet → extend the
    index with the survivors' bands/signatures.
    """
    from scout_spark.operators.dedup import (
        _minhash_signature_udf,
        minhash_probe,
    )

    rows_per_band = num_hashes // bands

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sess = batch.sparkSession
        hits = minhash_probe(
            sess,
            index_path,
            batch,
            id_col="doc_id",
            text_col="text",
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
        )
        dup_ids = hits.select(F.col("batch_id").alias("doc_id")).distinct()
        survivors = batch.join(dup_ids, "doc_id", "left_anti")
        if survivors.isEmpty():
            return
        survivors.write.mode("append").parquet(corpus_path)
        sig_udf = _minhash_signature_udf(num_hashes, 3)
        sig = survivors.where(F.trim(F.col("text")) != "").select(
            F.col("doc_id").alias("id"), sig_udf(F.col("text")).alias("mh")
        )
        sig.write.mode("append").parquet(os.path.join(index_path, "signatures"))
        banded = sig.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.hash(
                                F.slice(
                                    F.col("mh"),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                )
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band"),
        ).select("band.band_idx", "band.bucket", "id")
        banded.sortWithinPartitions("band_idx", "bucket").write.mode(
            "append"
        ).parquet(os.path.join(index_path, "bands"))

    stream = (
        spark.readStream.schema(schema)
        .json(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    return stream.start()
