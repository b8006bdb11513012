"""Driver-replica differential tests: every oracle-expressible inventory
item must produce identical results in Spark and DuckDB at the driver's
correctness scale factor (sf0.01). This IS the driver's gate, run locally.
"""

from __future__ import annotations

import pytest

from scout_spark.inventory import load_all
from scout_spark.testing import check_item

ITEMS = sorted(load_all().values(), key=lambda i: i.name)


@pytest.mark.parametrize("item", ITEMS, ids=[i.name for i in ITEMS])
def test_oracle_parity(spark, oracle_sf_dir, item):
    ok, msg = check_item(spark, item, oracle_sf_dir)
    assert ok, msg


def test_all_items_have_docs():
    for item in ITEMS:
        assert item.doc and len(item.doc) > 20, item.name


def test_oracle_backed_entries_scalar_only(spark, oracle_sf_dir):
    """The driver's canonicalizer pandas-sorts the result frame before
    hashing and crashes on list cells (r03 reds). Every oracle-backed
    entry must therefore project scalar-only output columns — arrays/
    maps/structs must be serialized (array_join / to_json) on both
    sides. Schema-level guard; scout_spark.testing._canon_cell enforces
    the same at the value level."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for item in ITEMS:
        if item.oracle is None:
            continue
        schema = item.spark(spark, oracle_sf_dir).schema
        for fld in schema.fields:
            if isinstance(fld.dataType, (ArrayType, MapType, StructType)):
                bad.append((item.name, fld.name, fld.dataType.simpleString()))
    assert not bad, f"non-scalar columns in oracle-backed entries: {bad}"
