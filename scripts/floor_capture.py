"""Floor decomposition for perf-weak entries → FLOOR_r{N}.json.

VERDICT r07 item 2: six entries exceed the 2× per-query DuckDB budget
with real walls, but their plans are the scale-correct partitioned
forms — the claim that the residual gap is Spark's exchange/scheduler
floor (which a 1000-executor cluster amortizes and DuckDB avoids only
by being single-machine) needs a MEASUREMENT, not prose. Per entry:

  (i)   spark_noop_s   — warm-session fresh-build noop wall, median of
                         N passes (bench methodology: fresh build per
                         pass, noop sink, no collect);
  (ii)  spark_sp1_s    — same with spark.sql.shuffle.partitions=1 and
                         a coalesce(1) input hint via the same noop
                         path: every exchange degenerates to one
                         partition, isolating the scheduler+exchange
                         floor from genuine plan work;
  (iii) duck_s         — DuckDB fetchall wall, median of N.

Adjudication rule (recorded in PLANS.md): if (ii) still exceeds
2 × (iii), the entry has REAL plan slack — fix it; if (ii) is within
~2× of DuckDB, the remaining (i)−(ii) delta is the distributed
engine's parallel-execution overhead at toy scale, and the weak label
retires with evidence.

Usage:
    python3 scripts/floor_capture.py --round 8
    python3 scripts/floor_capture.py --only graph_triangle_count
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The six r07-adjudicated weak entries, plus the round-8 additions
# whose sf0.1 walls exceeded 1.3 s at >2x on first measurement.
DEFAULT_ENTRIES = [
    "graph_butterfly_count_bipartite",
    "embedding_neardup_pairs",
    "dedup_simhash_hamming_pairs",
    "graph_triangle_count",
    "market_basket_association_rules",
    "agg_weighted_percentile",
    "dedup_longest_duplicated_substring",
    "dedup_duplicated_ngram_coverage",
    "lm_kneser_ney_bigram",
]


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _median_fresh(fn, spark, sf_dir, passes) -> float:
    _noop(fn(spark, sf_dir))  # warm (codegen, footers)
    runs = []
    for _ in range(passes):
        t0 = time.time()
        _noop(fn(spark, sf_dir))
        runs.append(time.time() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    out = (
        os.path.join(REPO, f"FLOOR_r{args.round:02d}.json")
        if args.round
        else "/tmp/floor.json"
    )
    sys.path.insert(0, REPO)
    from scout_spark.session import get_spark
    from scout_spark.testing import oracle_connection

    m = _load_entry_module()
    q, o = m.queries(), m.oracle_sql()
    names = [
        n
        for n in (args.only or DEFAULT_ENTRIES)
        if n in q
    ]
    spark = get_spark("floor-capture", cpus=args.cpus)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    con = oracle_connection(args.sf_dir)

    load0 = os.getloadavg()
    entries: dict[str, dict] = {}
    for name in names:
        rec: dict = {"load_1m": round(os.getloadavg()[0], 2)}
        fn = q[name]
        # (i) bench-methodology wall at the default partitioning
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        rec["spark_noop_s"] = _median_fresh(
            fn, spark, args.sf_dir, args.passes
        )
        # (ii) single-partition: exchanges still exist in the plan but
        # move one partition each — what remains is scheduler floor +
        # the actual single-stream compute, the closest Spark gets to
        # DuckDB's in-process execution
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        rec["spark_sp1_s"] = _median_fresh(
            fn, spark, args.sf_dir, args.passes
        )
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        # (iii) oracle wall
        if name in o:
            con.execute(o[name]).fetchall()  # warm
            runs = []
            for _ in range(args.passes):
                t0 = time.time()
                con.execute(o[name]).fetchall()
                runs.append(time.time() - t0)
            rec["duck_s"] = round(statistics.median(runs), 3)
            rec["ratio_noop"] = round(
                rec["spark_noop_s"] / rec["duck_s"], 2
            )
            rec["ratio_sp1"] = round(
                rec["spark_sp1_s"] / rec["duck_s"], 2
            )
            rec["adjudication"] = (
                "plan_slack"
                if rec["ratio_sp1"] > 2.0
                else "engine_floor"
            )
        entries[name] = rec
        print(name, rec, flush=True)

    result = {
        "sf_dir": args.sf_dir,
        "cpus": args.cpus,
        "passes": args.passes,
        "load_avg_start": [round(x, 2) for x in load0],
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
        "method": (
            "per entry: median of fresh-build noop walls at "
            "shuffle.partitions=8 (bench config) and =1 (floor "
            "isolation), vs DuckDB fetchall median; sp1 > 2x duck "
            "=> plan slack, else engine floor"
        ),
        "entries": entries,
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("→", out, flush=True)


if __name__ == "__main__":
    main()
