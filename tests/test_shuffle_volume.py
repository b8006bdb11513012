"""Shuffle-VOLUME proofs: plan-shape tests (test_scale_layout) show
WHERE exchanges sit; these execute the query and read the Exchange
nodes' SQLMetrics to assert how much data actually MOVED — the
difference between "the plan looks right" and "the shuffle is provably
bounded by the entity domain, not the fact volume". At 100 TB these
invariants are the whole ballgame: a map-side-combined aggregation that
silently regressed to shuffling raw rows would still pass a plan-shape
test and still return correct results.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def shuffle_profile(df) -> list[tuple[int, int]]:
    """Execute ``df`` and return (records, bytes) for every shuffle
    Exchange in its executed plan (AQE query stages unwrapped)."""
    df.collect()
    qe = df._jdf.queryExecution()

    def kids(node):
        out = []
        it = node.children().iterator()
        while it.hasNext():
            out.append(it.next())
        return out

    acc: list[tuple[int, int]] = []

    def walk(node):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if name == "Exchange":
            mets = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                mets[kv._1()] = kv._2().value()
            acc.append(
                (
                    int(mets.get("shuffleRecordsWritten", 0)),
                    int(mets.get("shuffleBytesWritten", 0)),
                )
            )
        if "QueryStage" in name:
            try:
                walk(node.plan())
            except Exception:
                pass
        for c in kids(node):
            walk(c)

    walk(qe.executedPlan())
    return acc


def _records(df) -> int:
    return sum(r for r, _ in shuffle_profile(df))


def test_retention_bitmap_shuffles_users_not_events(spark):
    """retention_bitmap_daily claims 'raw events reduce to |users|
    bigints in one combine-heavy agg'. Prove it: 10,000 input events,
    150 users — every shuffle together must move a few hundred
    records (per-user masks + the 64-row day spine + the day0
    scalar), nowhere near the event count."""
    from scout_spark.inventory import load_all

    df = load_all()["retention_bitmap_daily"].spark(spark, SF)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    moved = _records(df)
    assert n_events >= 10_000
    assert moved < n_events / 10, (moved, n_events)


def test_feature_hash_shuffles_bucket_partials_not_tokens(spark):
    """feature_hash_tf_md5's groupBy(bucket) must combine map-side:
    the agg shuffles carry (buckets x partitions) partials plus the
    distinct-count expansion's (bucket, tok) partials — bounded by
    the VOCABULARY, never the ~27k-token stream. The only other
    exchange is the _th widening barrier, which moves one row per
    DOC (500), so total shuffled records stay an order of magnitude
    under the token count."""
    from scout_spark.inventory import load_all

    df = load_all()["feature_hash_tf_md5"].spark(spark, SF)
    n_tokens = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr(
            "sum(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)))"
        )
        .collect()[0][0]
    )
    moved = _records(df)
    assert n_tokens > 20_000
    assert moved < n_tokens / 10, (moved, n_tokens)


def test_welch_ttest_shuffles_constant_partials(spark):
    """stats_welch_ttest is 'one map-side-combined aggregation':
    the shuffle must carry only per-partition partial rows (a handful
    per group), not the ~200-doc filtered input."""
    from scout_spark.inventory import load_all

    df = load_all()["stats_welch_ttest"].spark(spark, SF)
    moved = _records(df)
    assert moved < 100, moved


def test_phrase_search_shuffles_posting_lists_not_corpus(spark):
    """text_phrase_search_positional term-filters BEFORE any shuffle:
    only the 3 phrase terms' postings (plus their adjacency-join
    traffic) may move — a small fraction of the exploded token
    stream."""
    from scout_spark.inventory import load_all

    df = load_all()["text_phrase_search_positional"].spark(spark, SF)
    n_tokens = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr(
            "sum(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)))"
        )
        .collect()[0][0]
    )
    moved = _records(df)
    assert moved < n_tokens / 4, (moved, n_tokens)


def test_exact_dedup_shuffle_bounded_by_fingerprints(spark):
    """dedup_exact_fingerprint groups md5 fingerprints with map-side
    combine; the shuffle moves at most one partial row per distinct
    fingerprint per upstream partition — with 500 docs, far under
    10x the doc count and, more importantly, measurable and pinned
    here against silent regression to raw-row shuffles."""
    from scout_spark.inventory import load_all

    df = load_all()["dedup_exact_fingerprint"].spark(spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    moved = _records(df)
    assert moved <= 10 * n_docs, (moved, n_docs)


def test_trigram_search_shuffles_matches_not_corpus(spark):
    """search_trigram_index_like claims the trigram conjunction prunes
    scan-side: the only exchange (the result sort) may move the
    matching docs, never the 500-doc corpus."""
    from scout_spark.inventory import load_all

    df = load_all()["search_trigram_index_like"].spark(spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    moved = _records(df)
    assert n_docs >= 500
    assert moved < n_docs / 3, (moved, n_docs)


def test_cms_estimate_shuffles_sketch_cells_not_explode(spark):
    """estimate_selfjoin_cardinality_cms explodes 4 cells per lineitem
    row but the groupBy(d, bucket) must combine map-side: the _th
    widen barrier moves each input row once (a no-op at real scale —
    the gate is partition count), and on top of that the shuffles may
    carry only sketch-cell partials (<= d*w per partition) plus the
    exact twin's per-key partials — nowhere near the 4x exploded
    cell stream a combine regression would ship."""
    from scout_spark.inventory import load_all

    df = load_all()["estimate_selfjoin_cardinality_cms"].spark(spark, SF)
    n_rows = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    moved = _records(df)
    assert n_rows > 50_000
    # widen (1x rows) + bounded partials << the 4x cell stream
    assert moved < 2 * n_rows, (moved, n_rows)


def test_bh_fdr_shuffles_nation_partials(spark):
    """stats_bh_fdr_discoveries reduces customers to one 2x2 table per
    nation map-side; every shuffle together moves nation-sized
    partials, never customer rows."""
    from scout_spark.inventory import load_all

    df = load_all()["stats_bh_fdr_discoveries"].spark(spark, SF)
    moved = _records(df)
    assert moved < 500, moved


def test_simpson_audit_shuffles_strata_partials(spark):
    """stats_simpsons_paradox_audit: per-stratum conditional counts
    combine map-side; shuffles are |strata|-scale."""
    from scout_spark.inventory import load_all

    df = load_all()["stats_simpsons_paradox_audit"].spark(spark, SF)
    moved = _records(df)
    assert moved < 500, moved


def test_mutual_information_shuffles_bounded_cells(spark):
    """stats_mutual_information collapses 10k events to <=|types|*24
    contingency cells in one combine-heavy agg; everything downstream
    is arithmetic on that bounded frame."""
    from scout_spark.inventory import load_all

    df = load_all()["stats_mutual_information"].spark(spark, SF)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    moved = _records(df)
    assert n_events >= 10_000
    assert moved < n_events / 10, (moved, n_events)


def test_jsd_shuffles_histogram_bins(spark):
    """stats_jensen_shannon_divergence moves length-histogram bin
    partials, never documents."""
    from scout_spark.inventory import load_all

    df = load_all()["stats_jensen_shannon_divergence"].spark(spark, SF)
    moved = _records(df)
    assert moved < 500, moved


def test_hrw_sharding_shuffles_shard_partials(spark):
    """shard_rendezvous_hashing's argmax is row-local (greatest over
    structs, no explode); the only shuffle is |shards| partial counts
    per map task."""
    from scout_spark.inventory import load_all

    df = load_all()["shard_rendezvous_hashing"].spark(spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    moved = _records(df)
    assert moved < n_docs / 3, (moved, n_docs)


def test_watermark_lateness_shuffles_once_plus_histogram(spark):
    """events_watermark_lateness_profile: one inherent per-user window
    shuffle of the events plus histogram-bin partials — never a second
    full pass or a raw-event global sort."""
    from scout_spark.inventory import load_all

    df = load_all()["events_watermark_lateness_profile"].spark(spark, SF)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    moved = _records(df)
    assert moved < 2 * n_events, (moved, n_events)


def test_bloom_filter_prunes_probe_before_shuffle(spark):
    """join_bloom_runtime_filter's whole point: the hinted merge join
    would shuffle all 60k lineitems (plus the members) without the
    bloom; with it, the shuffled volume is matching rows + a tiny
    false-positive tail + the bit table + members. Assert the total
    stays far under one full pass of the fact table."""
    from pyspark.sql import functions as F

    from scout_spark.inventory import load_all

    df = load_all()["join_bloom_runtime_filter"].spark(spark, SF)
    n_rows = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    n_match = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet").where(
                "o_totalprice > 480000"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    moved = _records(df)
    assert n_rows > 50_000
    # matches (shuffled on both join sides) + bits + members + slack
    assert moved < 4 * n_match + 70_000, (moved, n_match, n_rows)
    assert moved < n_rows / 2, (moved, n_rows)
