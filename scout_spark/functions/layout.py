"""Z-order (Morton) clustering keys — data layout for spatial locality.

SURVEY §2 S6 maps the reference's secondary indexes to sorted parquet
layout; plain single-column sort clusters one dimension only. The
Z-order key interleaves the bits of quantized lat/lon so rows close in
2-D space land close in the sort order → a bbox scan touches few
parquet row groups (min/max stats on the z column prune the rest).
This is the standard lakehouse technique (Delta OPTIMIZE ZORDER BY,
Hudi space-filling curves) expressed as a pure Column — JVM codegen,
oracle-reproducible, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Value → integer cell in [0, 2^bits): floor((x-lo)/(hi-lo)*2^bits),
    clamped. Out-of-range values clamp to the edge cells."""
    cells = 1 << bits
    scaled = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells))
    return F.least(F.lit(cells - 1), F.greatest(F.lit(0), scaled)).cast("long")


def interleave_bits(x: Column, y: Column, bits: int) -> Column:
    """Morton interleave: bit i of x → position 2i, bit i of y → 2i+1."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def zorder_key(
    lon: Column,
    lat: Column,
    bits: int = 16,
    lon_range: tuple[float, float] = (-180.0, 180.0),
    lat_range: tuple[float, float] = (-90.0, 90.0),
) -> Column:
    """2-D Z-order key for geo points (2*bits significant bits)."""
    return interleave_bits(
        quantize(lon, lon_range[0], lon_range[1], bits),
        quantize(lat, lat_range[0], lat_range[1], bits),
        bits,
    )


def zorder_sql(
    lon_expr: str,
    lat_expr: str,
    bits: int = 16,
    lon_range: tuple[float, float] = (-180.0, 180.0),
    lat_range: tuple[float, float] = (-90.0, 90.0),
) -> str:
    """DuckDB twin of :func:`zorder_key` — identical arithmetic so the
    layout key is oracle-checkable."""
    def q(expr: str, lo: float, hi: float) -> str:
        cells = 1 << bits
        return (
            f"least({cells - 1}, greatest(0, "
            f"floor(({expr} - ({lo})) / ({hi - lo}) * {cells})::BIGINT))"
        )

    xq = q(lon_expr, *lon_range)
    yq = q(lat_expr, *lat_range)
    terms = []
    for i in range(bits):
        # parens around the whole shift: DuckDB gives + higher
        # precedence than <<
        terms.append(f"(((({xq}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({yq}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame, path: str, lon_col: str = "lon", lat_col: str = "lat",
    bits: int = 16, num_files: int | None = None,
) -> None:
    """Write parquet clustered on the Z-curve: repartitionByRange on the
    key (range partitioning → each file owns a contiguous z interval)
    then sortWithinPartitions, so row-group min/max stats on _z prune
    bbox scans."""
    keyed = df.withColumn("_z", zorder_key(F.col(lon_col), F.col(lat_col), bits))
    parts = num_files or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    (
        keyed.repartitionByRange(parts, "_z")
        .sortWithinPartitions("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
