"""Multimodal plumbing tests: binary columns through mapInPandas —
deterministic fake decode, frame-sample explode shape, stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scout_spark.operators.multimodal import (
    decode_media,
    pack_blobs,
    resize_stub,
    sample_frames,
)


@pytest.fixture(scope="module")
def blobs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    return pack_blobs(
        docs.withColumn("payload", F.encode("text", "utf-8")),
        id_col="doc_id",
        payload_col="payload",
        kind="image",
        source_col="source",
        declared_frames=8,
    ).cache()


def test_blob_schema(blobs):
    kinds = dict(blobs.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<source:string")


def test_decode_deterministic(blobs):
    a = {r["media_id"]: (r["width"], r["height"], r["channels"], r["checksum"])
         for r in decode_media(blobs).collect()}
    b = {r["media_id"]: (r["width"], r["height"], r["channels"], r["checksum"])
         for r in decode_media(blobs).collect()}
    assert a == b and len(a) == 50
    for w, h, c, _ in a.values():
        assert 16 <= w < 256 and 16 <= h < 256 and 1 <= c <= 4


def test_decode_injectable(blobs):
    fixed = decode_media(blobs, decode_fn=lambda b: (640, 480, 3)).collect()
    assert all(r["width"] == 640 and r["height"] == 480 for r in fixed)


def test_frame_sampling_shape(blobs):
    frames = sample_frames(blobs, n_frames=4)
    out = frames.collect()
    assert len(out) == 50 * 4  # declared_frames=8, step=2 → 4 frames each
    per = {}
    for r in out:
        per.setdefault(r["media_id"], []).append(r["frame_index"])
    for idxs in per.values():
        assert sorted(idxs) == [0, 2, 4, 6]
    # frame checksums differ across frames of the same blob
    sums = {r["frame_checksum"] for r in out}
    assert len(sums) > 50


def test_resize_stub_alias_is_real_now(blobs):
    # the former NotImplementedError stub is now the real bilinear path
    out = resize_stub(blobs).collect()
    assert out and all(r["width"] == 224 and r["height"] == 224 for r in out)


def test_multimodal_decode_stats_entry_ground_truth(spark):
    """Driver entry multimodal_decode_stats vs a pandas+hashlib replica
    of the fake codec over the same sf0.001 documents."""
    import hashlib

    import pandas as pd

    from scout_spark.inventory import load_all

    reg = load_all()
    got = {
        r["channels"]: (r["n_media"], r["avg_width"], r["avg_bytes"])
        for r in reg["multimodal_decode_stats"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    }
    pdf = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    rows = []
    for _, r in pdf.iterrows():
        payload = (r["text"] or "").encode("utf-8")
        d = hashlib.sha256(payload).digest()
        rows.append((1 + d[2] % 4, 16 + d[0] % 240, len(payload)))
    exp = pd.DataFrame(rows, columns=["channels", "width", "n_bytes"])
    expected = {
        int(ch): (
            int(g.shape[0]),
            round(float(g["width"].mean()), 4),
            round(float(g["n_bytes"].mean()), 4),
        )
        for ch, g in exp.groupby("channels")
    }
    assert got == expected


def test_bilinear_resize_kernel_exact():
    """Hand-checked bilinear values: 2x2 -> 4x4 with half-pixel centers
    (PIL convention) — corners keep source values, interior blends."""
    import numpy as np

    from scout_spark.operators.multimodal import bilinear_resize

    img = np.array([[[0], [100]], [[200], [40]]], dtype=np.uint8)
    out = bilinear_resize(img, 4, 4)
    assert out.shape == (4, 4, 1)
    assert out[0, 0, 0] == 0 and out[0, 3, 0] == 100
    assert out[3, 0, 0] == 200 and out[3, 3, 0] == 40
    # center of the top edge: between 0 and 100 at x=1.25 -> 75 exact
    assert out[0, 2, 0] == 75
    # identity resize returns the source unchanged
    assert (bilinear_resize(img, 2, 2) == img).all()


def test_resize_media_end_to_end(spark):
    """Full Spark stage: deterministic fake raster -> real bilinear ->
    fixed-size binary payloads with consistent byte counts."""
    from scout_spark.operators.multimodal import pack_blobs, resize_media

    src = spark.createDataFrame(
        [(i, ("payload-%d" % i).encode(), "s") for i in range(6)],
        "id long, body binary, src string",
    )
    blobs = pack_blobs(src, "id", "body", "image", "src")
    out = resize_media(blobs, target=(32, 16)).collect()
    assert len(out) == 6
    for r in out:
        assert (r["width"], r["height"]) == (32, 16)
        assert len(r["payload"]) == 32 * 16 * r["channels"]
    # deterministic: same inputs -> same bytes
    out2 = resize_media(blobs, target=(32, 16)).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == {
        r["media_id"]: bytes(r["payload"]) for r in out2
    }


def test_audio_energy_known_signal(spark):
    """Energy of a constant signal is 0 at offset 128 and exact for a
    known square wave; window count floors."""
    from scout_spark.operators.multimodal import audio_energy

    silence = bytes([128] * 512)           # two windows of zero energy
    square = bytes([128 + 50, 128 - 50] * 256)  # amplitude 50 -> 2500
    short = bytes([200] * 100)             # < one window
    df = spark.createDataFrame(
        [(1, "audio", silence, None), (2, "audio", square, None),
         (3, "audio", short, None)],
        "media_id long, kind string, payload binary,"
        " meta struct<source:string, declared_frames:int>",
    )
    rows = {r["media_id"]: r for r in audio_energy(df).collect()}
    assert rows[1]["n_windows"] == 2 and rows[1]["mean_energy"] == 0.0
    assert rows[2]["n_windows"] == 2 and rows[2]["mean_energy"] == 2500.0
    assert rows[2]["peak_energy"] == 2500.0
    assert rows[3]["n_windows"] == 0 and rows[3]["peak_window"] == -1


def test_audio_energy_deterministic_on_corpus(spark, blobs):
    from scout_spark.operators.multimodal import audio_energy

    a = {r["media_id"]: r["mean_energy"] for r in audio_energy(blobs).collect()}
    b = {r["media_id"]: r["mean_energy"] for r in audio_energy(blobs).collect()}
    assert a == b and len(a) == 50


def test_sample_frames_checksum_injection(spark):
    """checksum_fn injects the per-frame digest; default stays sha256
    (the r7 md5 twin depends on the injection, the rows-only entry on
    the default — both pinned here)."""
    import hashlib

    from scout_spark.operators.multimodal import pack_blobs, sample_frames

    df = spark.createDataFrame(
        [(1, b"abc", "s")], "id long, payload binary, src string"
    )
    blobs = pack_blobs(df, "id", "payload", kind="video", source_col="src")
    default = sample_frames(blobs, n_frames=4).collect()
    assert {r["frame_index"] for r in default} == {0, 2, 4, 6}
    for r in default:
        want = hashlib.sha256(
            b"abc" + r["frame_index"].to_bytes(4, "big")
        ).hexdigest()[:16]
        assert r["frame_checksum"] == want

    injected = sample_frames(
        blobs,
        n_frames=4,
        checksum_fn=lambda p, fi: hashlib.md5(
            p + b"|" + str(fi).encode()
        ).hexdigest(),
    ).collect()
    for r in injected:
        want = hashlib.md5(
            b"abc|" + str(r["frame_index"]).encode()
        ).hexdigest()
        assert r["frame_checksum"] == want


def test_frame_md5_twin_index_sets(spark):
    """The md5 twin's per-document declared_frames (1 + len % 12) must
    produce the documented index sets {step*j < min(d, 4*step)} —
    enumerate all 12 declared values against the kernel."""
    from scout_spark.operators.multimodal import sample_frames

    rows = [(d, b"x" * 1, "s", d) for d in range(1, 13)]
    df = spark.createDataFrame(
        rows, "id long, payload binary, src string, d int"
    )
    from pyspark.sql import functions as F

    blobs = df.select(
        F.col("id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.col("payload"),
        F.struct(
            F.col("src").alias("source"),
            F.col("d").alias("declared_frames"),
        ).alias("meta"),
    )
    got = {}
    for r in sample_frames(blobs, n_frames=4).collect():
        got.setdefault(r["media_id"], []).append(r["frame_index"])
    for d in range(1, 13):
        step = max(d // 4, 1)
        want = list(range(0, min(d, 4 * step), step))
        assert sorted(got[d]) == want, (d, got[d], want)
