"""Automated physical-plan lint over the whole query registry.

The scale contract this repo claims — no cartesian products, no
non-equi nested-loop join fallbacks, no unpartitioned windows over
unbounded domains, no row-at-a-time Python UDFs on relational paths —
is asserted query by query in docstrings and pinned for a sample in
tests. This tool checks it MECHANICALLY for every registered query:
build each DataFrame at sf0.001, inspect the executed plan string, and
flag

- ``cartesian``   CartesianProduct anywhere
- ``bnl_noncross`` BroadcastNestedLoopJoin that is NOT the deliberate
                  ``crossJoin(broadcast(<1-row scalar / bounded
                  grid>))`` pattern (Cross-type BNL with a broadcast
                  build is that pattern — reported as the
                  ``bnl_cross`` info count instead, matching the
                  r07 verdict's audit of all 63 crossJoins)
- ``global_sort`` Exchange SinglePartition feeding a Sort — the
                  unpartitioned-window / global-sort signature
- ``python_udf``  BatchEvalPython (row-at-a-time Python; Arrow
                  batches show as ArrowEvalPython and do not flag)

Queries whose docstrings DOCUMENT a bounded single-partition step
(calendar grids, value-domain frames, ≤33-row bucket stitches) are
waived with the same justification — every flag is either absent or
explicitly accounted for, never silent.

Streaming drains are NOT skipped (VERDICT r08 #4): each drain runs at
sf0.001 with SPARK_GRAFT_CAPTURE_BATCH_PLANS set and THREE plans get
the same lint — the engine's final incremental micro-batch plan
(explainInternal: the one holding StreamingSymmetricHashJoin /
StateStoreSave / watermark exchanges), each foreachBatch sink's
executed plan (q84's in-sink merge is a real join-aggregate), and the
returned read-back frame. The inside of a foreachBatch is exactly
where a silent nested-loop fallback would hide at scale.

NOTE: drains clear and reuse deterministic work dirs — do not run this
tool concurrently with another process that drives the same streaming
queries at sf0.001 (e.g. the pytest suite).

Usage: python tools/plan_audit.py [out.json]
Exit 0 iff every flag is waived; prints one line per unwaived flag.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"

# flag -> {query: documented justification} — reconciled to the set of
# queries that actually fire the flag (a stale waiver is an error in
# itself: it would hide a future regression behind an old excuse)
WAIVERS: dict[str, dict[str, str]] = {
    "global_sort": {
        "q137_rfm_segments": "R/F/M NTILE over per-customer aggregates"
        " — deliberate operator demo, input pre-shrunk to one row per"
        " customer (docstring)",
        "q150_pareto_abc": "≤33-row per-bucket offset stitch of the"
        " two-phase prefix scan",
        "q163_rle_audit": "≤33-row per-bucket offset stitch (two-phase"
        " run-length scan)",
        "q189_pareto_skyline": "prefix-min over price GROUPS — bounded"
        " by the price value domain",
        "q199_bootstrap_ci": "64 replicate-mean rows",
        "q225_weekly_growth": "calendar-week grid (epoch-anchored)",
        "q251_mann_whitney": "doc-length value-domain cumsum (q127"
        " ECDF argument)",
        "q252_spearman_rank_corr": "50- and 11-row value-domain"
        " midrank frames",
        "q253_kruskal_wallis": "doc-length value-domain cumsum",
        "q255_theil_sen": "calendar-bounded monthly pair grid",
        "q258_t_closeness": "length-bucket grid cumsum",
        "q260_neyman_allocation": "20-stratum remainder ranking",
        "q65_global_rank": "≤33-row per-bucket offset stitch",
    },
    "python_udf": {
        "q46_udtf_chunk": "deliberate Python UDTF operator demo"
        " (SURVEY §2.I); relational paths stay Arrow/JVM",
    },
    "bnl_noncross": {
        # the two-phase prefix-scan offset stitch: LeftOuter BNL whose
        # BROADCAST side is the ≤33-row per-bucket totals frame and
        # whose condition is the _bkt triangular inequality — bounded
        # by the bucket count, not the corpus (plans/_buckets.py)
        "q155_score_auc": "≤33-row _bkt triangular offset stitch",
        "q159_kaplan_meier": "≤33-row _bkt triangular offset stitch",
        "q191_heaps_law": "≤33-row _bkt triangular offset stitch",
        "q194_cusum_changepoint": "≤33-row _bkt triangular offset stitch",
        "q196_average_precision": "≤33-row _bkt triangular offset stitch",
        "q197_gini_best_split": "≤33-row _bkt triangular offset stitch",
        "q202_rrf_fusion": "≤33-row _bkt triangular offset stitch",
        "q212_quantile_normalization": "≤33-row _bkt triangular offset"
        " stitch",
        "q240_mixture_schedule": "≤33-row _bkt triangular offset stitch",
        "q263_wilcoxon_signed_rank": "≤33-row _bkt triangular offset"
        " stitch",
        "q268_equidepth_histogram": "≤33-row _bkt triangular offset"
        " stitch",
        "q255_theil_sen": "calendar-bounded monthly pair grid"
        " (broadcast side ≤ ~100 rows at any corpus size)",
        "q64_rare_term_weights": "no-condition inner join of a"
        " broadcast 1-row scalar (crossJoin equivalent)",
    },
    "cartesian": {},
}


def _lint_plan(plan: str) -> tuple[dict, dict]:
    """The four scale-killer checks over one physical plan string."""
    bnl_lines = re.findall(r"BroadcastNestedLoopJoin[^\n]*", plan)
    flags = {
        "cartesian": "CartesianProduct" in plan,
        "bnl_noncross": any(", Cross" not in ln for ln in bnl_lines),
        "global_sort": bool(
            re.search(r"Sort \[[^\n]*\n[^\n]*Exchange SinglePartition", plan)
        ),
        "python_udf": "BatchEvalPython" in plan,
    }
    stats = {
        "exchanges": plan.count("Exchange "),
        "scans": plan.count("Scan parquet"),
        "codegen_spans": plan.count("WholeStageCodegen"),
        "bnl_cross": sum(1 for ln in bnl_lines if ", Cross" in ln),
    }
    return flags, stats


def main() -> int:
    import os

    from pyspark.sql import SparkSession

    from weatherapi_data_engineering_project_spark.plans import (
        registry,
        streaming_queries,
    )

    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLAN_AUDIT.json"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # turn on final-micro-batch plan capture inside every drain sink
    os.environ["SPARK_GRAFT_CAPTURE_BATCH_PLANS"] = "1"
    drains = set(streaming_queries.QUERIES) - {"q43_approx_distinct"}
    results: dict[str, dict] = {}
    unwaived: list[tuple[str, str]] = []
    stale = []
    fired: dict[str, set] = {k: set() for k in WAIVERS}
    for name, fn in sorted(registry.all_queries().items()):
        is_drain = name in drains
        try:
            df = fn(spark, SF_DIR)  # for a drain this RUNS the stream
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — record, don't abort
            results[name] = {"error": str(e)[:200]}
            unwaived.append((name, "error"))
            continue
        flags, rec = _lint_plan(plan)
        if is_drain:
            # lint every captured drain plan too — the engine's final
            # incremental micro-batch plan ("<tag>/engine", the one with
            # the stateful operators) and each sink-side plan — and
            # OR-merge their flags (a BNLJ inside the drain is as real
            # as one outside)
            tag = name.split("_", 1)[0]
            captured = {
                k: v
                for k, v in streaming_queries.LAST_BATCH_PLANS.items()
                if k.split("/", 1)[0] == tag
            }
            if f"{tag}/engine" not in captured:
                results[name] = {"error": "no engine plan captured"}
                unwaived.append((name, "error"))
                continue
            for key, bplan in sorted(captured.items()):
                bflags, bstats = _lint_plan(bplan)
                flags = {k: flags[k] or bflags[k] for k in flags}
                bstats["stateful_ops"] = sum(
                    bplan.count(op)
                    for op in (
                        "StateStoreSave",
                        "StreamingSymmetricHashJoin",
                        "FlatMapGroupsInPandasWithState",
                        "TransformWithStateInPySpark",
                        "StreamingDeduplicate",
                        "SessionWindowStateStore",
                    )
                )
                rec[key.split("/", 1)[1] + "_plan"] = bstats
        for flag, hit in flags.items():
            if not hit:
                continue
            fired[flag].add(name)
            waiver = WAIVERS.get(flag, {}).get(name)
            rec.setdefault("flags", {})[flag] = waiver or "UNWAIVED"
            if not waiver:
                unwaived.append((name, flag))
        results[name] = rec

    for flag, waived in WAIVERS.items():
        for name in waived:
            if name not in fired[flag]:
                stale.append(f"{name}:{flag}")

    n_flagged = sum(1 for r in results.values() if r.get("flags"))
    summary = {
        "queries": len(results),
        "streaming_drains_linted": sorted(drains),
        "flagged": n_flagged,
        "unwaived": [f"{n}:{f}" for n, f in unwaived],
        "stale_waivers": stale,
        "bnl_cross_total": sum(
            r.get("bnl_cross", 0) for r in results.values()
        ),
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(
        f"plan-audit: {len(results)} queries, {n_flagged} flagged, "
        f"{len(unwaived)} UNWAIVED, {len(stale)} stale waivers, "
        f"{summary['bnl_cross_total']} broadcast-scalar cross joins "
        f"-> {out_path}"
    )
    for n, f in unwaived:
        print(f"  UNWAIVED {n}: {f}")
    for s in stale:
        print(f"  STALE WAIVER {s}")
    return 1 if (unwaived or stale) else 0


if __name__ == "__main__":
    raise SystemExit(main())
