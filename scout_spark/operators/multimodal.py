"""Multimodal (image/audio/video) column plumbing (build-brief extension).

Media are opaque ``binary`` columns + a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row
objects. The actual codec step is STUBBED: the image/audio libraries are
not in this container, so ``decode_fn=None`` uses a deterministic fake
decoder (byte-hash-derived dimensions) and a real codec can be injected.
Everything around the stub — schema, batch iteration, partitioning,
output explode — is real and tested.

Scale notes: decode parallelism = partition count; blobs should be
repartitioned to ~executor-core multiples before the mapInPandas stage;
``spark.sql.execution.arrow.maxRecordsPerBatch`` caps batch memory for
large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary,"
    " meta struct<source:string, declared_frames:int>"
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, channels int,"
    " n_bytes long, checksum string"
)

FRAME_SCHEMA = "media_id long, frame_index int, frame_checksum string"


def pack_blobs(
    df: DataFrame, id_col: str, payload_col: str, kind: str, source_col: str,
    declared_frames: int = 8,
) -> DataFrame:
    """Wrap an arbitrary column as a media blob table (test/fixture path —
    production ingests real bytes from object storage)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.struct(
            F.col(source_col).cast("string").alias("source"),
            F.lit(declared_frames).alias("declared_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real image decode — dimensions derived
    from a content digest. Replace via ``decode_fn`` with e.g. PIL:
    ``lambda b: Image.open(io.BytesIO(b)).size + (3,)``."""
    digest = hashlib.sha256(payload or b"").digest()
    return 16 + digest[0] % 240, 16 + digest[1] % 240, 1 + digest[2] % 4


def decode_media(
    blobs: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Decode each blob to (width, height, channels, n_bytes, checksum).

    ``decode_fn`` is the injected codec; None → deterministic fake (the
    container has no image/audio libs — see module docstring)."""
    fn = decode_fn or _fake_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [fn(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "checksum": [
                        hashlib.sha256(p or b"").hexdigest()[:16]
                        for p in pdf["payload"]
                    ],
                }
            )

    return blobs.mapInPandas(decode_batches, DECODED_SCHEMA)


def decode_pnm(payload: bytes) -> tuple[int, int, int]:
    """REAL image decode for binary Netpbm (P5 grayscale / P6 RGB) —
    an actual on-disk image format, parsed from scratch (no image
    library): magic, whitespace/'#'-comment-tolerant ASCII header
    (width, height, maxval), then the raw sample plane. This is the
    production-side ``decode_fn`` injection the module docstring
    promises, implemented without container dependencies; PIL/OpenCV
    slot into the same signature for compressed formats."""
    if not payload or payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    channels = 3 if payload[:2] == b"P6" else 1
    vals: list[int] = []
    i = 2
    while len(vals) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed PNM header")
        vals.append(int(payload[i:j]))
        i = j
    w, h, maxval = vals
    if not (0 < maxval < 65536 and w > 0 and h > 0):
        raise ValueError("malformed PNM header values")
    i += 1  # exactly one whitespace byte after maxval (spec)
    need = w * h * channels * (2 if maxval > 255 else 1)
    if len(payload) - i < need:
        raise ValueError("truncated PNM sample plane")
    return w, h, channels


def pnm_raster(payload: bytes):
    """Real pixels from a binary PNM payload — the ``decode_pnm``
    counterpart for the resize/feature kernels (H×W×C uint8; 16-bit
    maxval planes are scaled down to 8-bit)."""
    import numpy as np

    w, h, c = decode_pnm(payload)
    # re-scan the header end (decode_pnm validated it)
    vals, i = [], 2
    while len(vals) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while payload[j : j + 1].isdigit():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    i += 1
    maxval = vals[2]
    if maxval > 255:
        plane = np.frombuffer(
            payload, dtype=">u2", count=w * h * c, offset=i
        )
        return (plane // 256).astype(np.uint8).reshape(h, w, c)
    return np.frombuffer(
        payload, dtype=np.uint8, count=w * h * c, offset=i
    ).reshape(h, w, c)


def _fake_raster(payload: bytes):
    """Deterministic H×W×C uint8 raster from a payload — the fake-decode
    counterpart that yields actual pixels (digest bytes tiled), so
    downstream numeric kernels run on real arrays."""
    import numpy as np

    w, h, c = _fake_decode(payload)
    digest = hashlib.sha256(payload or b"").digest()
    n = h * w * c
    reps = n // len(digest) + 1
    return np.frombuffer((digest * reps)[:n], dtype=np.uint8).reshape(h, w, c)


def bilinear_resize(img, th: int, tw: int):
    """Real bilinear interpolation (half-pixel centers, PIL/OpenCV
    convention), fully vectorized numpy — no image library needed."""
    import numpy as np

    h, w, _c = img.shape
    ys = np.clip((np.arange(th) + 0.5) * h / th - 0.5, 0, h - 1)
    xs = np.clip((np.arange(tw) + 0.5) * w / tw - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


RESIZED_SCHEMA = (
    "media_id long, kind string, width int, height int, channels int,"
    " payload binary"
)


def resize_media(
    blobs: DataFrame,
    target: tuple[int, int] = (224, 224),
    raster_fn: Callable[[bytes], "object"] | None = None,
) -> DataFrame:
    """Resize stage: payload → raster → REAL numpy bilinear resample →
    resized raw bytes out. The raster decode is the injected codec
    (None → deterministic fake pixels, since no image library ships in
    this container); the interpolation kernel, Arrow batch iteration,
    and binary-out schema are exactly what a PIL/OpenCV deployment
    would run."""
    tw, th = target
    fn = raster_fn or _fake_raster

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bilinear_resize(fn(p if p is not None else b""), th, tw)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [tw] * len(payloads),
                    "height": [th] * len(payloads),
                    "channels": [int(a.shape[2]) for a in payloads],
                    "payload": [a.tobytes() for a in payloads],
                }
            )

    return blobs.mapInPandas(resize_batches, RESIZED_SCHEMA)


def resize_stub(blobs: DataFrame, target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Backward-compat alias for the former stub — now the real
    bilinear path (:func:`resize_media`)."""
    return resize_media(blobs, target)


def sample_frames(
    blobs: DataFrame,
    n_frames: int = 4,
    checksum_fn: Callable[[bytes, int], str] | None = None,
) -> DataFrame:
    """Frame sampling for video-kind blobs: emits ``n_frames`` evenly
    spaced frame rows per blob (row-expanding mapInPandas). Frame decode
    is the deterministic fake; the explode shape, schema, and batch
    iteration are the real plumbing. ``checksum_fn(payload, frame_index)``
    injects the per-frame digest (production: a real frame decode +
    content hash); None keeps the sha256 default."""
    ck = checksum_fn or (
        lambda payload, fi: hashlib.sha256(
            payload + fi.to_bytes(4, "big")
        ).hexdigest()[:16]
    )

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                declared = max(int(meta["declared_frames"]), 1)
                step = max(declared // n_frames, 1)
                payload = payload or b""
                for fi in range(0, min(declared, n_frames * step), step):
                    ids.append(mid)
                    idxs.append(fi)
                    sums.append(ck(payload, fi))
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_checksum": sums}
            )

    return blobs.mapInPandas(frame_batches, FRAME_SCHEMA)


AUDIO_SCHEMA = (
    "media_id long, n_windows int, mean_energy double, peak_energy double,"
    " peak_window int"
)


def audio_energy(
    blobs: DataFrame, window_bytes: int = 256
) -> DataFrame:
    """Audio feature extraction: treat the payload as 8-bit unsigned
    PCM and compute per-window signal energy (mean of (s-128)^2), the
    RMS-style feature every VAD/silence-trim pipeline starts from.
    Unlike the image/video kernels this needs NO fake decode — the
    arithmetic runs on the real bytes, vectorized in numpy over Arrow
    batches (the per-row-heavy-kernel pattern: batch columnar
    transfer, no per-row Python). Production swaps the byte
    interpretation for a real codec (soundfile/ffmpeg) behind the
    same mapInPandas signature."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nw, me, pe, pw = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                n = len(buf) // window_bytes
                ids.append(mid)
                if n == 0:
                    nw.append(0)
                    me.append(0.0)
                    pe.append(0.0)
                    pw.append(-1)
                    continue
                x = buf[: n * window_bytes].astype(np.float64) - 128.0
                en = (x * x).reshape(n, window_bytes).mean(axis=1)
                nw.append(n)
                me.append(float(en.mean()))
                pe.append(float(en.max()))
                pw.append(int(en.argmax()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_windows": nw,
                    "mean_energy": me,
                    "peak_energy": pe,
                    "peak_window": pw,
                }
            )

    return blobs.mapInPandas(batches, AUDIO_SCHEMA)


SHOT_SCHEMA = (
    "media_id long, n_frames int, n_boundaries int,"
    " max_abs_jump long, shots int"
)


def shot_boundaries(
    blobs: DataFrame, frame_bytes: int = 64, threshold: int = 200
) -> DataFrame:
    """Video shot-boundary detection on the frame-signature stream:
    treat the payload as fixed-size frames, signature = integer byte
    sum per frame, boundary where the adjacent-signature jump exceeds
    the threshold — the histogram-difference cut detector every
    video-curation pipeline starts from. Like audio_energy this needs
    NO fake decode (integer arithmetic on the real bytes, numpy over
    Arrow batches; int64 sums are order-exact, so the feature is
    engine-reproducible bit-for-bit). Production swaps the byte
    interpretation for real frame decode behind the same mapInPandas
    signature."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nf, nb, mj, sh = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                n = len(buf) // frame_bytes
                ids.append(mid)
                if n < 2:
                    nf.append(n)
                    nb.append(0)
                    mj.append(0)
                    sh.append(1 if n else 0)
                    continue
                fs = (
                    buf[: n * frame_bytes]
                    .astype(np.int64)
                    .reshape(n, frame_bytes)
                    .sum(axis=1)
                )
                jumps = np.abs(np.diff(fs))
                b = int((jumps > threshold).sum())
                nf.append(n)
                nb.append(b)
                mj.append(int(jumps.max()))
                sh.append(b + 1)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_frames": nf,
                    "n_boundaries": nb,
                    "max_abs_jump": mj,
                    "shots": sh,
                }
            )

    return blobs.mapInPandas(batches, SHOT_SCHEMA)


KEYFRAME_SCHEMA = "media_id long, shot_id int, frame_index int, ph long"


def shot_keyframe_hashes(
    blobs: DataFrame, frame_bytes: int = 64, threshold: int = 200
) -> DataFrame:
    """Per-shot keyframe extraction + 63-bit WHT perceptual hash — the
    composition video-curation pipelines run for cross-video keyframe
    dedup: detect shot boundaries on the frame-signature stream (the
    ``shot_boundaries`` detector: integer byte-sum signatures, a cut
    where the adjacent jump exceeds ``threshold``), take the FIRST
    frame of each shot as its keyframe, and hash that frame's 8x8
    raster with the Walsh-Hadamard sign transform (the integer-exact
    pHash stand-in proven in dedup_image_phash_wht_pairs). All
    intermediates are int64, so every output is engine-reproducible
    bit-for-bit from code points. The WHT runs as ONE batched numpy
    matmul per Arrow batch (hmat @ (m,8,8) @ hmat — no per-keyframe
    Python loop). Production swaps real frame decode in behind the
    same mapInPandas signature.

    100 TB: one map-side pass, output rows = shots (boundary-bounded,
    orders of magnitude below frames); downstream dedup shuffles only
    (media_id, shot_id, ph)."""
    import numpy as np

    if frame_bytes != 64:
        raise ValueError("WHT keyframe hash needs 8x8 = 64-byte frames")

    hmat = np.array(
        [
            [1 - 2 * (bin(u & i).count("1") % 2) for i in range(8)]
            for u in range(8)
        ],
        dtype=np.int64,
    )
    weights = np.zeros(64, dtype=np.int64)
    weights[1:] = np.int64(1) << np.arange(0, 63, dtype=np.int64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            mids, sids, fis, rasters = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                n = len(buf) // frame_bytes
                if n < 1:
                    continue
                fs = (
                    buf[: n * frame_bytes]
                    .astype(np.int64)
                    .reshape(n, frame_bytes)
                    .sum(axis=1)
                )
                # keyframes: frame 0 + every frame after a cut
                kf = np.concatenate(
                    [[0], np.flatnonzero(np.abs(np.diff(fs)) > threshold) + 1]
                )
                for s_ix, fi in enumerate(kf):
                    mids.append(mid)
                    sids.append(s_ix)
                    fis.append(int(fi))
                    rasters.append(
                        buf[fi * frame_bytes : (fi + 1) * frame_bytes]
                        .astype(np.int64)
                        .reshape(8, 8)
                    )
            if mids:
                px = np.stack(rasters)  # (m, 8, 8)
                c = hmat @ px @ hmat  # batched WHT, one matmul pair
                bits = (c > 0).reshape(len(mids), 64)
                bits[:, 0] = False  # DC excluded — 63-bit hash
                phs = bits.astype(np.int64) @ weights
            else:
                phs = np.zeros(0, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "shot_id": pd.array(sids, dtype="int32"),
                    "frame_index": pd.array(fis, dtype="int32"),
                    "ph": phs,
                }
            )

    return blobs.mapInPandas(batches, KEYFRAME_SCHEMA)
