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
