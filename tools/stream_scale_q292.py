"""Focused streaming scale row for q292 (round 10): measure the
bounded-state attribution drain at 1× and 10× events and merge the row
into an existing BENCH_SCALE JSON artifact's "streaming" section.

q292 only reads `events`, so the 10× corpus here is an events-only dir
built with scale_bench's exact replication rule (event_id offset by a
power-of-10 stride per copy, ts/user_id untouched — same user base at
10× throughput). The claim under test is the q218 contrast: q218's
interval-join peak state grew 100k → 1M rows at 10× events
(BENCH_SCALE_r10.json) because stream-stream join state holds EVENTS
in the watermark horizon; q292's counter state must stay at the
distinct-key count (identical at both scales, since replicated events
reuse the same (user, hour) keys).

Usage: python tools/stream_scale_q292.py [artifact.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from weatherapi_data_engineering_project_spark.session import get_spark  # noqa: E402
from weatherapi_data_engineering_project_spark.schemas import load_table  # noqa: E402
from weatherapi_data_engineering_project_spark.caching import release_all  # noqa: E402

# shared with the full-table replicator: even stride = parity-stable
# side assignment for q292/q218 (ADVICE r10)
from scale_bench import EVENT_ID_STRIDE  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = os.environ.get(
    "SPARK_GRAFT_STREAM_SCALE_DIR", "/tmp/spark_graft_scale10x_events"
)
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))


def main() -> None:
    artifact = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALE_r10.json"
    spark = get_spark(app_name="stream-scale-q292")
    spark.sparkContext.setLogLevel("ERROR")

    marker = os.path.join(SCALE_DIR, "_BUILT")
    if not os.path.exists(marker):
        os.makedirs(SCALE_DIR, exist_ok=True)
        base = load_table(spark, SF_DIR, "events")
        copies = [
            base.withColumn(
                "event_id", F.col("event_id") + F.lit(k * EVENT_ID_STRIDE)
            )
            for k in range(REPLICAS)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(
            os.path.join(SCALE_DIR, "events.parquet")
        )
        open(marker, "w").write("ok")

    from weatherapi_data_engineering_project_spark.plans import (
        streaming_queries as SQ,
    )

    def run(sf_dir: str) -> tuple[float, int]:
        start = time.perf_counter()
        SQ.q292_stream_bounded_attribution(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        elapsed = round(time.perf_counter() - start, 3)
        release_all()
        peak = max(
            (r[1] for r in SQ.LAST_STATE_METRICS.get("q292", [])),
            default=None,
        )
        return elapsed, peak

    w1, peak1 = run(SF_DIR)
    w10, peak10 = run(SCALE_DIR)
    row = {
        "wall_1x": w1,
        f"wall_{REPLICAS}x": w10,
        "ratio": round(w10 / w1, 2),
        "state_rows_peak_1x": peak1,
        f"state_rows_peak_{REPLICAS}x": peak10,
    }
    print(json.dumps({"query": "q292_stream_bounded_attribution", **row}))
    with open(artifact) as fh:
        data = json.load(fh)
    section = "streaming" if REPLICAS == 10 else f"streaming_{REPLICAS}x"
    data.setdefault(section, {})["q292_stream_bounded_attribution"] = row
    with open(artifact, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    print(json.dumps({"merged_into": artifact}))


if __name__ == "__main__":
    main()
