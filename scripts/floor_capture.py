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
    con = oracle_connection(args.sf_dir)

    load0 = os.getloadavg()
    entries: dict[str, dict] = {}
    for name in names:
        rec: dict = {"load_1m": round(os.getloadavg()[0], 2)}
        fn = q[name]
        # (i) bench-methodology wall: AQE on (session default, matches
        # bench.py), default shuffle partitioning
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        rec["spark_noop_s"] = _median_fresh(
            fn, spark, args.sf_dir, args.passes
        )
        # (ii) single-partition + AQE off: exchanges still exist in the
        # plan but move one partition each and nothing re-plans — what
        # remains is scheduler floor + the actual single-stream
        # compute, the closest Spark gets to DuckDB's in-process
        # execution. CAVEAT recorded in `method`: DuckDB itself runs
        # multi-threaded, so for genuinely compute-bound entries sp1
        # serializes work DuckDB parallelizes — read ratio_sp1 > 2
        # as "investigate", and close with a like-for-like check
        # (e.g. duck_threads=1) before calling it plan slack.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        rec["spark_sp1_s"] = _median_fresh(
            fn, spark, args.sf_dir, args.passes
        )
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        # (iii) oracle wall, default threads AND single-threaded —
        # duck_1t is the like-for-like partner for spark_sp1
        if name in o:

            def _duck_median() -> float:
                con.execute(o[name]).fetchall()  # warm
                runs = []
                for _ in range(args.passes):
                    t0 = time.time()
                    con.execute(o[name]).fetchall()
                    runs.append(time.time() - t0)
                return round(statistics.median(runs), 3)

            rec["duck_s"] = _duck_median()
            con.execute("SET threads=1")
            rec["duck_1t_s"] = _duck_median()
            con.execute(f"SET threads={args.cpus}")
            rec["ratio_noop"] = round(
                rec["spark_noop_s"] / rec["duck_s"], 2
            )
            rec["ratio_sp1"] = round(
                rec["spark_sp1_s"] / rec["duck_s"], 2
            )
            rec["ratio_sp1_vs_1t"] = round(
                rec["spark_sp1_s"] / rec["duck_1t_s"], 2
            )
            # single-stream vs single-stream is the honest test: if
            # Spark's one-partition pipeline is still >2x a
            # one-thread DuckDB on identical work, the plan carries
            # real slack; if it's within 2x, the parallel-path gap
            # (ratio_noop) is exchange/scheduler floor that a real
            # cluster amortizes.
            rec["adjudication"] = (
                "plan_slack"
                if rec["ratio_sp1_vs_1t"] > 2.0
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
            "per entry: median of fresh-build noop walls with AQE on "
            "at shuffle.partitions=8 (bench config) and AQE off at "
            "=1 (single-stream isolation), vs DuckDB fetchall medians "
            "at default threads and threads=1; adjudication compares "
            "single-stream to single-stream (spark_sp1 vs duck_1t): "
            ">2x => plan slack, else engine floor (the ratio_noop gap "
            "is then exchange/scheduler overhead a cluster amortizes)"
        ),
        "entries": entries,
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("→", out, flush=True)


if __name__ == "__main__":
    main()
