"""OSM PBF encoder — spec-conformant writer for fixtures and sinks.

Counterpart of :mod:`scout_spark.sources.osmpbf`: encodes nodes (as
DenseNodes with delta+zigzag coding), ways and relations into valid
``.osm.pbf`` blobs (fileformat.proto / osmformat.proto wire layout,
zlib-compressed). Exists so the reader can be tested against
independently-constructed bytes without shipping binary fixtures, and
so a pipeline can round-trip Spark results back into the OSM exchange
format. Entities are chunked into multiple blobs (``blob_size``) to
exercise the reader's parallel per-blob path.
"""

from __future__ import annotations

import zlib
from typing import Iterable, Mapping, Sequence


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _key(fno: int, wt: int) -> bytes:
    return _uvarint((fno << 3) | wt)


def _field_varint(fno: int, v: int) -> bytes:
    return _key(fno, 0) + _uvarint(v)


def _field_bytes(fno: int, b: bytes) -> bytes:
    return _key(fno, 2) + _uvarint(len(b)) + b


def _packed(fno: int, vals: Iterable[int], signed=False, delta=False) -> bytes:
    body = bytearray()
    prev = 0
    for v in vals:
        if delta:
            v, prev = v - prev, v
        if signed:
            v = _zigzag(v)
        body += _uvarint(v)
    return _field_bytes(fno, bytes(body))


class _StringTable:
    def __init__(self) -> None:
        self._idx: dict[str, int] = {"": 0}
        self._items: list[str] = [""]

    def add(self, s: str) -> int:
        i = self._idx.get(s)
        if i is None:
            i = len(self._items)
            self._idx[s] = i
            self._items.append(s)
        return i

    def encode(self) -> bytes:
        body = b"".join(_field_bytes(1, s.encode("utf-8")) for s in self._items)
        return _field_bytes(1, body)


_REL_TYPE_NO = {"node": 0, "way": 1, "relation": 2}
_GRAN = 100  # nanodegrees per unit — the spec default


def _nano(deg: float) -> int:
    """Degrees → granularity units (round-half-away like osmium)."""
    n = round(deg * 1e9)
    return int(round(n / _GRAN))


def _dense_group(nodes: Sequence[tuple], st: _StringTable) -> bytes:
    ids = [n[0] for n in nodes]
    lats = [_nano(n[1]) for n in nodes]
    lons = [_nano(n[2]) for n in nodes]
    kv: list[int] = []
    for n in nodes:
        for k, v in (n[3] or {}).items():
            if k == "":
                # string-table index 0 doubles as the DenseNodes
                # delimiter — the spec reserves it, so empty keys are
                # unrepresentable
                raise ValueError("OSM tag keys must be non-empty")
            kv.extend((st.add(k), st.add(v)))
        kv.append(0)
    dense = (
        _packed(1, ids, signed=True, delta=True)
        + _packed(8, lats, signed=True, delta=True)
        + _packed(9, lons, signed=True, delta=True)
        + _packed(10, kv)
    )
    return _field_bytes(2, dense)


def _tag_fields(tags: Mapping[str, str] | None, st: _StringTable) -> bytes:
    tags = tags or {}
    return _packed(2, [st.add(k) for k in tags]) + _packed(
        3, [st.add(v) for v in tags.values()]
    )


def _way_msg(way: tuple, st: _StringTable) -> bytes:
    wid, refs, tags = way
    return _field_bytes(
        3,
        _field_varint(1, wid)
        + _tag_fields(tags, st)
        + _packed(8, refs, signed=True, delta=True),
    )


def _rel_msg(rel: tuple, st: _StringTable) -> bytes:
    rid, members, tags = rel
    roles = [st.add(role) for (_t, role, _r) in members]
    memids = [r for (_t, _role, r) in members]
    types = [_REL_TYPE_NO[t] for (t, _role, _r) in members]
    return _field_bytes(
        4,
        _field_varint(1, rid)
        + _tag_fields(tags, st)
        + _packed(8, roles)
        + _packed(9, memids, signed=True, delta=True)
        + _packed(10, types),
    )


def _primitive_block(
    nodes: Sequence[tuple], ways: Sequence[tuple], rels: Sequence[tuple]
) -> bytes:
    st = _StringTable()
    groups = b""
    if nodes:
        groups += _field_bytes(2, _dense_group(nodes, st))
    if ways:
        groups += _field_bytes(2, b"".join(_way_msg(w, st) for w in ways))
    if rels:
        groups += _field_bytes(2, b"".join(_rel_msg(r, st) for r in rels))
    # string table MUST precede groups per spec ordering convention
    return st.encode() + groups + _field_varint(17, _GRAN)


def _blob(kind: str, payload: bytes) -> bytes:
    z = zlib.compress(payload)
    blob = _field_varint(2, len(payload)) + _field_bytes(3, z)
    header = _field_bytes(1, kind.encode()) + _field_varint(3, len(blob))
    return len(header).to_bytes(4, "big") + header + blob


def _header_block() -> bytes:
    return _field_bytes(4, b"OsmSchema-V0.6") + _field_bytes(
        4, b"DenseNodes"
    ) + _field_bytes(16, b"scout-spark-osmpbf-writer")


def write_pbf(
    path: str,
    nodes: Sequence[tuple] = (),
    ways: Sequence[tuple] = (),
    relations: Sequence[tuple] = (),
    blob_size: int = 8000,
) -> int:
    """Write entities to ``path`` as a valid .osm.pbf; returns #blobs.

    nodes: (id, lat_deg, lon_deg, {tags}); ways: (id, [refs], {tags});
    relations: (id, [(type, role, ref)], {tags}). Entities are split
    into blobs of ``blob_size`` (spec recommends ~8k) so real files get
    many independently-decodable units — the reader's parallelism.
    """
    blobs = [_blob("OSMHeader", _header_block())]
    chunks: list[bytes] = []
    for i in range(0, len(nodes), blob_size):
        chunks.append(_primitive_block(nodes[i : i + blob_size], (), ()))
    for i in range(0, len(ways), blob_size):
        chunks.append(_primitive_block((), ways[i : i + blob_size], ()))
    for i in range(0, len(relations), blob_size):
        chunks.append(_primitive_block((), (), relations[i : i + blob_size]))
    blobs += [_blob("OSMData", c) for c in chunks]
    with open(path, "wb") as f:
        for b in blobs:
            f.write(b)
    return len(blobs) - 1
