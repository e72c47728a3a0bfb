"""Full-registry differential: run EVERY `queries()` entry against its
`oracle_sql()` twin at sf0.01 and emit a driver-shaped per-query JSON.

This is the generator for `CORRECTNESS_FULL_r{N}.json` (VERDICT r03 #6):
the driver samples ~50 queries per round; this runs all of them in a
vanilla session so the judge can audit un-sampled queries without
rerunning them.

Usage:
    python tools/full_differential.py [out.json]

Exit status is non-zero if any query errors or mismatches.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_DIFF_SF_DIR", "/root/testdata/sf0.01")


def value_hash(canon_rows) -> str:
    h = hashlib.sha256()
    for row in canon_rows:
        h.update(repr(row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_FULL.json"

    from pyspark.sql import SparkSession

    from conftest import df_to_comparable, make_duck
    import __spark_entry__ as entry

    # Vanilla session on purpose: no engine confs beyond what queries
    # themselves require — mirrors the judge's independent setup.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("full-differential")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    report: dict[str, dict] = {}
    failures = 0

    for name in sorted(queries):
        qfn = queries[name]
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t0 = time.time()
        try:
            sdf = qfn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            row["spark_rows"] = len(srows)

            if name in oracles:
                con = make_duck(SF_DIR)
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = [tuple(r) for r in res.fetchall()]
                con.close()
                row["oracle_rows"] = len(drows)
                sc, sv = df_to_comparable(scols, srows)
                dc, dv = df_to_comparable(dcols, drows)
                row["rows_match"] = len(srows) == len(drows)
                row["schema_match"] = sc == dc
                row["hash_match"] = value_hash(sv) == value_hash(dv)
                if not (row["rows_match"] and row["schema_match"] and row["hash_match"]):
                    failures += 1
            else:
                # rows-only contract: q42/q43/q62 (state-store program +
                # foreign sketches) — record the weaker check explicitly.
                row["rows_match"] = row["spark_rows"] >= 0
                row["err"] = "no_oracle"
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            row["err"] = f"{type(exc).__name__}: {exc}"[:400]
            failures += 1
        row["wall_s"] = round(time.time() - t0, 3)
        report[name] = row
        status = (
            "ERR" if row["err"] not in (None, "no_oracle")
            else ("ok" if row.get("hash_match") else "rows-only")
        )
        print(f"{name}: {status} ({row['wall_s']}s)", flush=True)

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    n_hash = sum(1 for r in report.values() if r["hash_match"])
    print(
        f"RESULT: {'ALL MATCH' if failures == 0 else f'{failures} FAILURES'} "
        f"— {len(report)} queries, {n_hash} hash-matched, "
        f"{len(report) - n_hash} rows-only → {out_path}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
