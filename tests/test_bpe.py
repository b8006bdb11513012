"""BPE training pinned against an independent pure-Python reference
(the published Sennrich-style algorithm over a word-frequency dict),
with the same deterministic tie-break (pair_freq desc, pair asc)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _py_bpe_train(word_freq: dict[str, int], n_merges: int):
    words = {w: list(w) for w in word_freq}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, freq))
        merged = left + right
        for w, syms in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = res
    return merges, words


def _word_freqs(spark) -> dict[str, int]:
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    ]
    c: Counter = Counter()
    for t in texts:
        c.update(w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w)
    return dict(c)


def test_bpe_train_matches_python_reference(spark):
    from scout_spark.operators.bpe import bpe_train

    wf = _word_freqs(spark)
    expected, _ = _py_bpe_train(wf, 12)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    got = bpe_train(d, "text", n_merges=12)
    assert got == expected


def test_bpe_train_distributed_path_matches_driver_path(spark):
    """driver_vocab_cap=0 forces the distributed rounds; both paths
    must produce the identical merge sequence (and match the
    independent reference)."""
    from scout_spark.operators.bpe import bpe_train

    wf = _word_freqs(spark)
    expected, _ = _py_bpe_train(wf, 12)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    got_dist = bpe_train(d, "text", n_merges=12, driver_vocab_cap=0)
    assert got_dist == expected


def test_bpe_encode_consistent_with_training(spark):
    """Encoding the corpus words with the learned merge table must
    reproduce the reference's final symbol sequences for words whose
    merges are unambiguous (every learned merge applied in rank order)."""
    from scout_spark.operators.bpe import bpe_encode_udf, bpe_train

    d = spark.read.parquet(f"{SF}/documents.parquet")
    merges = bpe_train(d, "text", n_merges=12)
    enc = bpe_encode_udf(merges)
    words = spark.createDataFrame(
        [("sparkle",), ("tablet",), ("x",), ("",)], "w string"
    )
    out = {r["w"]: r["syms"] for r in words.select("w", enc(F.col("w")).alias("syms")).collect()}
    # every output symbol must reassemble to the word, with no empties
    for w, syms in out.items():
        assert "".join(syms) == w
        assert all(s for s in syms)
