"""100× empirical scale check (VERDICT r09 #5): push the cheapest
flagships two orders of magnitude past bench scale and measure wall
AND shuffle volume — the first direct evidence for the "100×" design
claims (BENCH_SCALE_r09's 10× runs found one fixed-width scale-killer;
this is the instrument pointed further out).

Corpus: sf0.1 facts replicated 100× via ONE crossJoin against a
replica-index range (no 100-way union — the plan stays flat), PKs
offset by a power-of-10 stride, dims kept 1× (FK columns are not
offset, so star joins stay valid). Documents get the alternate-word
copy salt (cross-copy token Jaccard ~1/3 — the BENCH_SCALE_r09 lesson:
un-salted replicas make every doc a 100-way true near-dup and the
similarity output, not the plan, goes quadratic). Only the tables the
target queries read are replicated:

  q02_star_revenue    — orders + lineitem (60M rows at 100×) over 1× dims
  q23_exact_dedup     — documents (500k docs)
  q47_dedup_clusters  — documents (shingle→minhash→band→verify→closure)
  q93_semantic_contamination — embeddings (200k vectors): the r09
                        fixed-width scale-killer, now corpus-derived
  q25_minhash_lsh     — documents (500k docs): the corpus-derived
                        MinHash band depth at 100×

Embeddings are replicated by per-copy rotation + (for replicas ≥ dim)
alternate-sign flip — orthogonal transforms, so each replica's internal
near-dup structure matches the base while cross-replica cosines are
~random/zero (no artificial 100-way true-duplicate groups).

Each query runs best-of-2 at sf0.1 and ONCE at 100× in the same warmed
session; shuffle read/write bytes come from the Spark UI REST API
(per-stage totals, delta around each run) — a super-linear shuffle
term shows up here even when the wall hides behind parallel slack.

Usage: python tools/scale100_bench.py [out.json]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_SCALE100_DIR (default /tmp/spark_graft_scale100x),
     SPARK_GRAFT_SCALE100_REPLICAS (default 100).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from weatherapi_data_engineering_project_spark.session import get_spark  # noqa: E402
from weatherapi_data_engineering_project_spark.schemas import load_table  # noqa: E402
from weatherapi_data_engineering_project_spark.plans import registry  # noqa: E402
from weatherapi_data_engineering_project_spark.caching import release_all  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE100_DIR", "/tmp/spark_graft_scale100x"
)
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE100_REPLICAS", "100"))
UI_PORT = int(os.environ.get("SPARK_GRAFT_SCALE100_UI_PORT", "4097"))

TARGETS = [
    "q02_star_revenue",
    "q23_exact_dedup",
    "q47_dedup_clusters",
    # the two corpus-derived-LSH paths (r09's fixed-width scale-killer
    # finding): at 200k vectors / 500k docs the derived widths must
    # keep candidate mass ~linear or the log(n) rule is wrong
    "q93_semantic_contamination",
    "q25_minhash_lsh",
]
# SPARK_GRAFT_SCALE100_TARGETS (comma-separated) overrides for focused
# per-round rows; SPARK_GRAFT_SCALE100_BUILD_ONLY=1 builds the corpus
# and exits so the measurement runs in a fresh session.
_t_env = os.environ.get("SPARK_GRAFT_SCALE100_TARGETS")
if _t_env is not None:
    TARGETS = [t for t in _t_env.split(",") if t]

COPY_1X = ["region", "nation", "customer", "supplier", "part"]
REPLICATE = ["orders", "lineitem", "documents", "embeddings"]


def build_corpus(spark) -> None:
    marker = os.path.join(SCALE_DIR, "_BUILT")
    if os.path.exists(marker):
        return
    os.makedirs(SCALE_DIR, exist_ok=True)
    rep = F.broadcast(spark.range(REPLICAS).select(F.col("id").alias("k")))
    for t in COPY_1X:
        load_table(spark, SF_DIR, t).write.mode("overwrite").parquet(
            os.path.join(SCALE_DIR, f"{t}.parquet")
        )
    for t in REPLICATE:
        base = load_table(spark, SF_DIR, t)
        big = base.crossJoin(rep)
        if t == "orders":
            big = big.withColumn(
                "o_orderkey",
                F.col("o_orderkey") + F.col("k") * F.lit(100_000_000),
            )
        elif t == "lineitem":
            big = big.withColumn(
                "l_orderkey",
                F.col("l_orderkey") + F.col("k") * F.lit(100_000_000),
            )
        elif t == "documents":
            words = F.split(F.col("text"), " ")
            text = F.array_join(
                F.transform(
                    words,
                    lambda w, i: F.when(
                        (i % 2 == 0) & (F.col("k") > 0),
                        F.concat(w, F.lit("x"), F.col("k").cast("string")),
                    ).otherwise(w),
                ),
                " ",
            )
            big = big.select(
                (F.col("doc_id") + F.col("k") * F.lit(10_000_000)).alias(
                    "doc_id"
                ),
                text.alias("text"),
                "lang",
                "source",
                F.length(text).cast("long").alias("n_chars"),
            )
        elif t == "embeddings":
            # 100 semantically-distinct replicas of 64-dim vectors:
            # rotation alone gives only dim-1 distinct copies, so
            # replicas 64+ also alternate-sign-flip. Both transforms
            # are orthogonal — WITHIN a replica all inner products
            # (and so the true near-dup structure) are preserved;
            # ACROSS replicas cosine is ~random (different rotation)
            # or ~0 (same rotation, one side sign-flipped).
            emb = F.col("embedding")
            dim = F.size(emb)
            r = F.when(F.col("k") == 0, F.lit(0)).otherwise(
                ((F.col("k") - 1) % (dim - 1)) + 1
            )
            rotated = F.when(r == 0, emb).otherwise(
                F.concat(F.slice(emb, r + 1, dim - r), F.slice(emb, 1, r))
            )
            flip = ((F.col("k") - 1) / (dim - 1)).cast("int") >= 1
            emb2 = F.when(
                (F.col("k") > 0) & flip,
                F.transform(
                    rotated,
                    lambda x, i: F.when(i % 2 == 1, -x).otherwise(x),
                ),
            ).otherwise(rotated)
            big = big.select(
                (F.col("vec_id") + F.col("k") * F.lit(10_000_000)).alias(
                    "vec_id"
                ),
                emb2.cast("array<float>").alias("embedding"),
                "label",
            )
        big = big.drop("k")
        # spread the write across the session's parallelism: the
        # crossJoin inherits the (single-footer) scan's partitioning
        big.repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(
            os.path.join(SCALE_DIR, f"{t}.parquet")
        )
    open(marker, "w").write("ok")


def shuffle_totals(app_id: str) -> tuple[int, int]:
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages"
    stages = json.load(urllib.request.urlopen(url))
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALE100_r10.json"
    spark = get_spark(
        app_name="scale100-bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "5000",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    t0 = time.perf_counter()
    build_corpus(spark)
    build_s = round(time.perf_counter() - t0, 1)
    if os.environ.get("SPARK_GRAFT_SCALE100_BUILD_ONLY"):
        print(json.dumps({"built": SCALE_DIR, "build_seconds": build_s}))
        return

    queries = registry.all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in COPY_1X + REPLICATE:
        load_table(spark, SF_DIR, t).count()
        load_table(spark, SCALE_DIR, t).count()

    def measured(fn, sf_dir: str, runs: int) -> tuple[float, int, int]:
        best, d_w, d_r = None, 0, 0
        for _ in range(runs):
            w0, r0 = shuffle_totals(app_id)
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            w1, r1 = shuffle_totals(app_id)
            if best is None or elapsed < best:
                best, d_w, d_r = elapsed, w1 - w0, r1 - r0
            release_all()
        return round(best, 3), d_w, d_r

    rows = {}
    for name in TARGETS:
        fn = queries[name]
        w1, sw1, sr1 = measured(fn, SF_DIR, 2)
        w100, sw100, sr100 = measured(fn, SCALE_DIR, 1)
        rows[name] = {
            "wall_1x": w1,
            "wall_100x": w100,
            "wall_ratio": round(w100 / w1, 1),
            "shuffle_write_bytes_1x": sw1,
            "shuffle_write_bytes_100x": sw100,
            "shuffle_write_ratio": round(sw100 / sw1, 1) if sw1 else None,
            "shuffle_read_bytes_1x": sr1,
            "shuffle_read_bytes_100x": sr100,
        }
        print(json.dumps({"query": name, **rows[name]}), flush=True)

    result = {
        "metric": "scale_ratio_100x",
        "replicas": REPLICAS,
        "base_sf_dir": SF_DIR,
        "corpus_build_seconds": build_s,
        "queries": rows,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps({"written": out_path, "n": len(rows)}))


if __name__ == "__main__":
    main()
