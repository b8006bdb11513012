"""Native OSM PBF ingest (SURVEY.md §2 S1) — no external tools.

The reference shells out to QuackOSM to turn a ``.osm.pbf`` into a
DuckDB table (reference scripts/build_gazetteer.py:159-180). The
Spark-first equivalent implemented here reads the PBF format directly:

- The PBF container is a sequence of independently-decodable blobs
  (4-byte big-endian length, ``BlobHeader``, ``Blob`` — fileformat.proto
  from the public openstreetmap/OSM-binary spec), each holding ~8k
  entities zlib-compressed. That framing is exactly what a distributed
  reader wants: the DRIVER scans only the tiny headers to build a blob
  index (O(#blobs) seeks, no payload reads), then EXECUTORS fetch and
  decode their assigned byte ranges in parallel via ``mapInPandas``.
  At planet scale (~80 GB, ~10k blobs) the index scan is seconds and
  decode parallelism is #blobs — the same shape as Spark's own parquet
  row-group scheduling. The file path must be visible to executors
  (shared/posix or object storage), as with any Spark input.
- Protobuf wire decoding is hand-rolled (varint / zigzag / packed
  fields, ~60 lines): the OSM schema (osmformat.proto) is small and
  frozen, and this avoids a runtime dependency on protobuf/osmium.
  Python-loop decode cost sits inside the Arrow-batched executor task —
  the slow path is per-blob, not per-row-per-operator, and is fully
  parallel. DenseNodes delta+zigzag coding, string tables, granularity /
  lat_offset / lon_offset scaling are all honored.

Outputs are plain DataFrames: nodes ``(id, lat, lon, tags)``, ways
``(id, refs, tags)``, relations ``(id, members, tags)``. ``pbf_features``
reduces them to the QuackOSM-like feature table the gazetteer ETL binds
(``feature_id`` "node/123" / "way/45", centroid lat/lon, tags) — way
centroids come from a refs-explode + node join + mean, the distributed
analogue of the reference's ST_Centroid-at-ingest
(reference sql/migrations/001_pois.sql:30-31).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- wire format


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one unsigned varint at ``pos``; return (value, next_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Iterate (field_number, wire_type, value) over a protobuf message.

    wire type 0 → int, 2 → bytes (length-delimited), 5 → 4 raw bytes,
    1 → 8 raw bytes. Groups (3/4) don't occur in the OSM schema.
    """
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _uvarint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _uvarint(buf, pos)
        elif wt == 2:
            ln, pos = _uvarint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wt == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:  # pragma: no cover - malformed input
            raise ValueError(f"unsupported wire type {wt} (field {fno})")
        yield fno, wt, val


def _packed(buf: bytes, signed: bool = False, delta: bool = False) -> list[int]:
    """Decode a packed varint field; optionally zigzag and delta-decode."""
    out: list[int] = []
    pos, n = 0, len(buf)
    acc = 0
    while pos < n:
        v, pos = _uvarint(buf, pos)
        if signed:
            v = _zigzag(v)
        if delta:
            acc += v
            out.append(acc)
        else:
            out.append(v)
    return out


# ------------------------------------------------------------------ blob scan


@dataclass(frozen=True)
class BlobRef:
    """One independently-decodable unit of a PBF file."""

    kind: str  # "OSMHeader" | "OSMData"
    offset: int  # file offset of the Blob message body
    size: int  # Blob message size in bytes


def scan_blobs(path: str) -> list[BlobRef]:
    """Driver-side blob index: header-only scan, payloads untouched.

    Reads 4 bytes + BlobHeader (~30 bytes) per blob and seeks over the
    payload — the PBF analogue of reading a parquet footer.
    """
    refs: list[BlobRef] = []
    with open(path, "rb") as f:
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                break
            hlen = int.from_bytes(raw, "big")
            header = f.read(hlen)
            kind, datasize = "", 0
            for fno, _wt, val in _fields(header):
                if fno == 1:
                    kind = bytes(val).decode("utf-8")
                elif fno == 3:
                    datasize = int(val)
            refs.append(BlobRef(kind=kind, offset=f.tell(), size=datasize))
            f.seek(datasize, 1)
    return refs


def _blob_payload(blob: bytes) -> bytes:
    """Blob → uncompressed payload (raw or zlib; the two spec-required
    codecs — lzma/lz4/zstd blobs raise, matching osmium's default)."""
    raw: bytes | None = None
    zdata: bytes | None = None
    for fno, _wt, val in _fields(blob):
        if fno == 1:
            raw = bytes(val)
        elif fno == 3:
            zdata = bytes(val)
        elif fno in (4, 5, 6, 7):  # pragma: no cover - rare codecs
            raise ValueError("unsupported PBF blob compression (field %d)" % fno)
    if raw is not None:
        return raw
    if zdata is not None:
        return zlib.decompress(zdata)
    return b""


# ------------------------------------------------------- primitive block walk


def _decode_dense(
    group: bytes, strings: list[str], gran: int, lat_off: int, lon_off: int
) -> list[tuple[int, float, float, dict[str, str]]]:
    ids: list[int] = []
    lats: list[int] = []
    lons: list[int] = []
    keys_vals: list[int] = []
    for fno, _wt, val in _fields(group):
        if fno == 1:
            ids = _packed(val, signed=True, delta=True)
        elif fno == 8:
            lats = _packed(val, signed=True, delta=True)
        elif fno == 9:
            lons = _packed(val, signed=True, delta=True)
        elif fno == 10:
            keys_vals = _packed(val)
    tags_per_node: list[dict[str, str]] = []
    if keys_vals:
        cur: dict[str, str] = {}
        i = 0
        while i < len(keys_vals):
            if keys_vals[i] == 0:
                tags_per_node.append(cur)
                cur = {}
                i += 1
            else:
                cur[strings[keys_vals[i]]] = strings[keys_vals[i + 1]]
                i += 2
    while len(tags_per_node) < len(ids):
        tags_per_node.append({})
    return [
        (
            ids[i],
            1e-9 * (lat_off + gran * lats[i]),
            1e-9 * (lon_off + gran * lons[i]),
            tags_per_node[i],
        )
        for i in range(len(ids))
    ]


def _decode_tags(keys: list[int], vals: list[int], strings: list[str]) -> dict:
    return {strings[k]: strings[v] for k, v in zip(keys, vals)}


_REL_TYPES = ("node", "way", "relation")


def decode_primitive_block(payload: bytes) -> tuple[list, list, list]:
    """PrimitiveBlock payload → (nodes, ways, relations) python rows.

    nodes: (id, lat_deg, lon_deg, {tags}); ways: (id, [refs], {tags});
    relations: (id, [(type, role, ref)], {tags}).
    """
    strings: list[str] = []
    groups: list[bytes] = []
    gran, lat_off, lon_off = 100, 0, 0
    for fno, _wt, val in _fields(payload):
        if fno == 1:  # stringtable
            for sfno, _swt, sval in _fields(val):
                if sfno == 1:
                    strings.append(bytes(sval).decode("utf-8"))
        elif fno == 2:
            groups.append(bytes(val))
        elif fno == 17:
            gran = int(val)
        elif fno == 19:
            lat_off = int(val)
        elif fno == 20:
            lon_off = int(val)
    nodes: list = []
    ways: list = []
    rels: list = []
    for group in groups:
        for fno, _wt, val in _fields(group):
            if fno == 2:  # DenseNodes
                nodes.extend(_decode_dense(val, strings, gran, lat_off, lon_off))
            elif fno == 1:  # plain Node
                nid, nlat, nlon = 0, 0, 0
                keys: list[int] = []
                vals: list[int] = []
                for nfno, _nwt, nval in _fields(val):
                    if nfno == 1:
                        nid = _zigzag(int(nval))
                    elif nfno == 2:
                        keys = _packed(nval)
                    elif nfno == 3:
                        vals = _packed(nval)
                    elif nfno == 8:
                        nlat = _zigzag(int(nval))
                    elif nfno == 9:
                        nlon = _zigzag(int(nval))
                nodes.append(
                    (
                        nid,
                        1e-9 * (lat_off + gran * nlat),
                        1e-9 * (lon_off + gran * nlon),
                        _decode_tags(keys, vals, strings),
                    )
                )
            elif fno == 3:  # Way
                wid = 0
                keys = []
                vals = []
                refs: list[int] = []
                for wfno, _wwt, wval in _fields(val):
                    if wfno == 1:
                        wid = int(wval)
                    elif wfno == 2:
                        keys = _packed(wval)
                    elif wfno == 3:
                        vals = _packed(wval)
                    elif wfno == 8:
                        refs = _packed(wval, signed=True, delta=True)
                ways.append((wid, refs, _decode_tags(keys, vals, strings)))
            elif fno == 4:  # Relation
                rid = 0
                keys = []
                vals = []
                roles: list[int] = []
                memids: list[int] = []
                types: list[int] = []
                for rfno, _rwt, rval in _fields(val):
                    if rfno == 1:
                        rid = int(rval)
                    elif rfno == 2:
                        keys = _packed(rval)
                    elif rfno == 3:
                        vals = _packed(rval)
                    elif rfno == 8:
                        roles = _packed(rval)
                    elif rfno == 9:
                        memids = _packed(rval, signed=True, delta=True)
                    elif rfno == 10:
                        types = _packed(rval)
                members = [
                    (_REL_TYPES[types[i]], strings[roles[i]], memids[i])
                    for i in range(len(memids))
                ]
                rels.append((rid, members, _decode_tags(keys, vals, strings)))
    return nodes, ways, rels


# ------------------------------------------------------------- spark readers

_TAGS = T.MapType(T.StringType(), T.StringType())

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("tags", _TAGS),
    ]
)

WAY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField(
            "refs", T.ArrayType(T.LongType())
        ),
        T.StructField("tags", _TAGS),
    ]
)

REL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField(
            "members",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("member_type", T.StringType()),
                        T.StructField("role", T.StringType()),
                        T.StructField("ref", T.LongType()),
                    ]
                )
            ),
        ),
        T.StructField("tags", _TAGS),
    ]
)

_BLOB_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("size", T.LongType()),
    ]
)


def _blob_index_df(spark: SparkSession, path: str) -> DataFrame:
    refs = [r for r in scan_blobs(path) if r.kind == "OSMData"]
    rows = [(path, r.offset, r.size) for r in refs]
    # one task per blob: decode parallelism == #blobs, the natural unit
    return spark.createDataFrame(rows, _BLOB_SCHEMA).repartition(
        max(1, min(len(rows), 256))
    )


def _read_entities(spark: SparkSession, path: str, which: int, schema):
    import pandas as pd

    def decode(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for p, off, size in zip(pdf["path"], pdf["offset"], pdf["size"]):
                with open(p, "rb") as f:
                    f.seek(int(off))
                    blob = f.read(int(size))
                ents = decode_primitive_block(_blob_payload(blob))[which]
                if ents:
                    yield pd.DataFrame(ents, columns=[f.name for f in schema])

    return _blob_index_df(spark, path).mapInPandas(decode, schema)


def read_nodes(spark: SparkSession, path: str) -> DataFrame:
    """All nodes of a .osm.pbf as (id, lat, lon, tags)."""
    return _read_entities(spark, path, 0, NODE_SCHEMA)


def read_ways(spark: SparkSession, path: str) -> DataFrame:
    """All ways of a .osm.pbf as (id, refs, tags)."""
    return _read_entities(spark, path, 1, WAY_SCHEMA)


def read_relations(spark: SparkSession, path: str) -> DataFrame:
    """All relations of a .osm.pbf as (id, members, tags)."""
    return _read_entities(spark, path, 2, REL_SCHEMA)


def _geo_aggs():
    return (
        F.avg("lat").alias("lat"),
        F.avg("lon").alias("lon"),
        F.min("lon").alias("minx"),
        F.min("lat").alias("miny"),
        F.max("lon").alias("maxx"),
        F.max("lat").alias("maxy"),
    )


def way_centroids(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """(way id, centroid lat/lon, bbox, tags) via refs-explode + node
    join.

    Distributed analogue of the reference's ST_Centroid at ingest
    (001_pois.sql:30-31): shuffle key is the node id (both sides
    already hash-partition on it), mean/min/max are exact aggregates
    over the way's member nodes. Closed ways (first ref == last ref)
    drop the repeated vertex so it isn't double-weighted.
    """
    refs = ways.select(
        F.col("id").alias("way_id"),
        "tags",
        F.when(
            (F.size("refs") > 1)
            & (F.element_at("refs", 1) == F.element_at("refs", -1)),
            F.slice("refs", 1, F.size("refs") - 1),
        )
        .otherwise(F.col("refs"))
        .alias("refs"),
    ).select("way_id", "tags", F.explode("refs").alias("id"))
    return (
        refs.join(nodes.select("id", "lat", "lon"), "id")
        .groupBy("way_id", "tags")
        .agg(*_geo_aggs())
        .select(F.col("way_id").alias("id"), "lat", "lon", "minx", "miny",
                "maxx", "maxy", "tags")
    )


def relation_features(
    nodes: DataFrame, ways: DataFrame, relations: DataFrame
) -> DataFrame:
    """(relation id, centroid, bbox, tags) from member geometry.

    Admin boundaries live on relations; their extent is the min/max
    over every member node — node members directly, way members
    through the way's refs. Two hash joins on node id, one aggregate:
    no geometry library needed for the bbox+centroid reduction the
    gazetteer consumes (reference gets these from QuackOSM's
    ST_Envelope/ST_Centroid columns)."""
    m = relations.select(
        F.col("id").alias("rel_id"), "tags", F.explode("members").alias("m")
    )
    node_refs = m.where(F.col("m.member_type") == "node").select(
        "rel_id", "tags", F.col("m.ref").alias("id")
    )
    way_refs = (
        m.where(F.col("m.member_type") == "way")
        .select("rel_id", "tags", F.col("m.ref").alias("way_id"))
        .join(
            ways.select(F.col("id").alias("way_id"), F.explode("refs").alias("id")),
            "way_id",
        )
        .select("rel_id", "tags", "id")
    )
    coords = node_refs.unionByName(way_refs).join(
        nodes.select("id", "lat", "lon"), "id"
    )
    return coords.groupBy("rel_id", "tags").agg(*_geo_aggs()).select(
        F.col("rel_id").alias("id"), "lat", "lon", "minx", "miny", "maxx",
        "maxy", "tags"
    )


def pbf_features(spark: SparkSession, path: str) -> DataFrame:
    """QuackOSM-like feature table from a raw PBF: ``feature_id``
    ("node/123" / "way/45" / "relation/7"), centroid lat/lon, bbox
    (zero-area for point features), tags map. Drop-in input for
    :func:`scout_spark.etl.gazetteer.build_gazetteer` via the existing
    feature_id/lat/lon source binding; bbox columns feed build_admin."""

    def _fid(kind: str):
        return F.concat(F.lit(kind + "/"), F.col("id").cast("string")).alias(
            "feature_id"
        )

    nodes = read_nodes(spark, path)
    ways = read_ways(spark, path)
    rels = read_relations(spark, path)
    tagged_nodes = nodes.where(F.size(F.map_keys("tags")) > 0).select(
        _fid("node"),
        "lat",
        "lon",
        F.col("lon").alias("minx"),
        F.col("lat").alias("miny"),
        F.col("lon").alias("maxx"),
        F.col("lat").alias("maxy"),
        "tags",
    )
    cols = ["feature_id", "lat", "lon", "minx", "miny", "maxx", "maxy", "tags"]
    way_feats = way_centroids(nodes, ways).select(_fid("way"), *cols[1:])
    rel_feats = relation_features(nodes, ways, rels).where(
        F.size(F.map_keys("tags")) > 0
    ).select(_fid("relation"), *cols[1:])
    return tagged_nodes.unionByName(way_feats).unionByName(rel_feats)
