#!/usr/bin/env python3
"""Regenerate the generated plan gallery in PLANS.md.

Everything between the BEGIN/END markers is rewritten from live
``explain("formatted")`` output at sf0.01; hand-written measurement
sections outside the markers are untouched. Run after changing any
listed query's plan shape:

    python scripts/gen_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BEGIN = "<!-- BEGIN GENERATED PLAN GALLERY (scripts/gen_plans.py) -->"
END = "<!-- END GENERATED PLAN GALLERY -->"
SF_DIR = "/root/testdata/sf0.01"

# round-2 additions; round-1 plans keep their hand-annotated sections
GALLERY = [
    "dedup_span_exact_c4",
    "dedup_groups_connected_components",
    "spatial_point_in_polygon_join",
    "timeseries_gapfill_locf",
    "quality_unigram_perplexity",
    "pipeline_curate_end_to_end",
    "funnel_view_click_purchase",
    "merge_into_upsert_delete",
    "events_transition_matrix",
    "ingest_osm_pbf_roundtrip",
    "layout_zorder_key",
    "embedding_mean_pool_by_label",
    "quality_constraint_report",
    "cohort_monthly_retention",
    "basket_part_cooccurrence",
    "bm25_topk_retrieval",
    "sketch_heavy_hitter_tokens",
    "join_salted_skew",
    # round-3 additions
    "mixture_temperature_resample",
    "dedup_component_size_histogram",
    "semdedup_embedding_prune",
    # round-4 additions
    "graph_triangle_count",
    "timeseries_ewma_bounded",
    "scd2_event_type_dimension",
    "skyline_pareto_orders",
    "embedding_dimension_profile",
    "text_token_entropy",
    "text_oov_rate_by_source",
    "sample_weighted_priority",
    "mining_hard_negatives",
    "quality_perplexity_decile_mix",
    "join_lateral_topk_per_customer",
    "audit_snapshot_diff",
    "window_count_distinct_running",
    "dedup_ppjoin_prefix",
    "er_record_linkage",
    "scalar_jaro_winkler_rank",
    # round-4 third wave
    "text_cooccurrence_pmi",
    "timeseries_linear_interpolate",
    "agg_weighted_percentile",
    "graph_link_prediction",
]


def tree_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # keep only the tree block (up to the first blank-line-separated detail)
    tree = text.split("\n\n")[0]
    return tree.strip()


def main() -> None:
    from scout_spark.inventory import load_all
    from scout_spark.session import get_spark

    spark = get_spark("gen-plans", cpus=8)
    registry = load_all()
    parts = [BEGIN, ""]
    for name in GALLERY:
        df = registry[name].spark(spark, SF_DIR)
        parts += [f"### {name}", "", "```", tree_of(df), "```", ""]
    parts.append(END)
    gallery = "\n".join(parts)

    path = os.path.join(REPO, "PLANS.md")
    text = open(path).read()
    if BEGIN in text:
        pre, rest = text.split(BEGIN, 1)
        _, post = rest.split(END, 1)
        text = pre + gallery + post
    else:
        text = text.rstrip() + "\n\n## Round-2 plan gallery (generated)\n\n" + gallery + "\n"
    open(path, "w").write(text)
    print(f"wrote {len(GALLERY)} plans into PLANS.md")


if __name__ == "__main__":
    main()
