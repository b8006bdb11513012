"""OSM PBF as a Spark 4 Python DataSource: spark.read.format("osmpbf").

The functional readers in :mod:`scout_spark.sources.osmpbf` drive the
blob-parallel decode through createDataFrame + mapInPandas; this module
plugs the same wire decoder into Spark's DataSource V2 Python API
(pyspark.sql.datasource, new in Spark 4) so the file behaves like any
other format:

    spark.dataSource.register(OsmPbfDataSource)
    nodes = spark.read.format("osmpbf").option("entity", "nodes").load(path)

``partitions()`` returns one InputPartition per PBF blob — Spark's
scheduler sees the real parallelism unit (≈8k entities each) exactly as
it sees parquet row groups, so locality, task retry, and speculative
execution apply per blob with no driver-side DataFrame plumbing.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_SCHEMAS = {
    "nodes": "id long, lat double, lon double, tags map<string,string>",
    "ways": "id long, refs array<long>, tags map<string,string>",
    "relations": (
        "id long, members array<struct<member_type: string, role: string, "
        "ref: long>>, tags map<string,string>"
    ),
}


class _BlobPartition(InputPartition):
    def __init__(self, path: str, offset: int, size: int):
        self.path = path
        self.offset = offset
        self.size = size


class OsmPbfReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("osmpbf: .load(path) is required")
        self.entity = options.get("entity", "nodes")
        if self.entity not in _SCHEMAS:
            raise ValueError(f"osmpbf: unknown entity {self.entity!r}")

    def partitions(self):
        from scout_spark.sources.osmpbf import scan_blobs

        return [
            _BlobPartition(self.path, r.offset, r.size)
            for r in scan_blobs(self.path)
            if r.kind == "OSMData"
        ]

    def read(self, partition: _BlobPartition):
        from scout_spark.sources.osmpbf import (
            _blob_payload,
            decode_primitive_block,
        )

        with open(partition.path, "rb") as f:
            f.seek(partition.offset)
            blob = f.read(partition.size)
        which = {"nodes": 0, "ways": 1, "relations": 2}[self.entity]
        yield from decode_primitive_block(_blob_payload(blob))[which]


class OsmPbfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "osmpbf"

    def schema(self) -> str:
        return _SCHEMAS[self.options.get("entity", "nodes")]

    def reader(self, schema: StructType) -> DataSourceReader:
        return OsmPbfReader(self.options)
