"""Layout & sketch queries (q106-q108): differentials + the sketch
invariants that make each operator trustworthy at scale."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, SF_DIR_ORACLE, compare_query_to_oracle
from weatherapi_data_engineering_project_spark.plans import layout as L


@pytest.mark.parametrize("name", sorted(L.ORACLE))
def test_layout_oracle_differential(spark, name):
    compare_query_to_oracle(
        spark, name, L.QUERIES[name], L.ORACLE[name], SF_DIR_ORACLE
    )


def test_zorder_buckets_are_tight_on_both_dims(spark):
    """The point of the z-layout: per-bucket bounding boxes must be
    narrow on BOTH dimensions (each leading-6-bit bucket spans 3 of
    each dim's 16 quantized bits -> ~1/8 of the range + edge slack)."""
    rows = L.q106_zorder_layout(spark, SF_DIR_ORACLE).collect()
    assert rows and sum(r.n for r in rows) > 0
    span_cap = 65535 // 8 + 2  # 3 leading bits per dim -> 1/8 range
    for r in rows:
        assert 0 <= r.min_xq <= r.max_xq <= 65535
        assert 0 <= r.min_yq <= r.max_yq <= 65535
        assert r.max_xq - r.min_xq <= span_cap
        assert r.max_yq - r.min_yq <= span_cap


def test_zorder_projection_has_no_extra_shuffle(spark):
    """z-value + bucket assignment must be a projection: exactly the
    scalar-range broadcast and the final 64-key audit aggregate may
    exchange — no shuffle touches the fact rows before bucketing."""
    plan = L.q106_zorder_layout(spark, SF_DIR)._jdf.queryExecution().toString()
    # one shuffle for the audit groupBy (+AQE may note it); the fact
    # side itself must never hash-repartition before the aggregate
    assert plan.count("Exchange hashpartitioning") <= 1


def test_countmin_never_underestimates(spark):
    rows = L.q107_countmin_sketch(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.overest >= 0
        assert r.cms_est == r.exact_n + r.overest


def test_countmin_matches_definition(spark):
    """cms_est for a key equals the min over seeds of that key's
    bucket counter, recomputed independently in Python."""
    from collections import Counter

    from weatherapi_data_engineering_project_spark.schemas import load_table

    ev = [r.user_id for r in load_table(spark, SF_DIR, "events")
          .select("user_id").collect()]
    grid = [Counter() for _ in L._CMS_SEEDS]
    for uid in ev:
        for (i, a, b) in L._CMS_SEEDS:
            grid[i][((a * uid + b) % L._CMS_P) % L._CMS_W] += 1
    for r in L.q107_countmin_sketch(spark, SF_DIR).collect():
        expect = min(
            grid[i][((a * r.user_id + b) % L._CMS_P) % L._CMS_W]
            for (i, a, b) in L._CMS_SEEDS
        )
        assert r.cms_est == expect


def test_bloom_has_no_false_negatives(spark):
    """Every true member that appears on the probe side must pass the
    bloom — false positives are allowed, false negatives never."""
    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.schemas import load_table

    out = {r.l_suppkey: r.is_member
           for r in L.q108_bloom_prune(spark, SF_DIR_ORACLE).collect()}
    sup = load_table(spark, SF_DIR_ORACLE, "supplier")
    members = {r.s_suppkey for r in
               sup.filter(F.col("s_nationkey") <= 2).select("s_suppkey")
               .collect()}
    probed = {r.l_suppkey for r in
              load_table(spark, SF_DIR_ORACLE, "lineitem")
              .select("l_suppkey").distinct().collect()}
    for k in members & probed:
        assert k in out and out[k] is True
    # everything the bloom passes that isn't a member is flagged FP
    for k, is_m in out.items():
        assert is_m == (k in members)


def test_hll_merge_equals_direct_sketch(spark):
    """Mergeability: zero register mismatches between the partition-
    merged and direct-pass sketches, and the merged estimate equals
    q120's single-pass estimate exactly (same registers → same
    float chain)."""
    merged = {r.event_type: r for r in L.q148_hll_merge(spark, SF_DIR).collect()}
    direct = {r.event_type: r for r in L.q120_hll_sketch(spark, SF_DIR).collect()}
    assert set(merged) == set(direct)
    for t, m in merged.items():
        assert m.n_register_mismatches == 0
        assert m.est_users == direct[t].est_users
        assert m.exact_users == direct[t].exact_users
        # m=64 HLL: |rel_err| within 4x the 1.04/sqrt(64) rsd
        assert abs(m.rel_err) < 4 * 1.04 / 8


def test_rle_audit_matches_python_run_count(spark):
    """Run counts recomputed in Python under the same total order
    (k1, k2, value); the two-phase bucketed scan must be exact."""
    from weatherapi_data_engineering_project_spark.schemas import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        "l_linestatus", "l_suppkey",
    ).collect()
    cols = {
        "l_returnflag": lambda r: r.l_returnflag,
        "l_linestatus": lambda r: r.l_linestatus,
        "l_suppkey": lambda r: str(r.l_suppkey),
    }
    want = {}
    for name, get in cols.items():
        seq = [
            get(r)
            for r in sorted(
                li,
                key=lambda r: (r.l_orderkey, r.l_linenumber, get(r)),
            )
        ]
        runs = sum(
            1 for i, v in enumerate(seq) if i == 0 or v != seq[i - 1]
        )
        want[name] = runs
    rows = L.q163_rle_audit(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_rows == len(li)
        assert r.n_runs == want[r.column_name]
        assert abs(r.avg_run_len - round(len(li) / r.n_runs, 6)) < 1e-9
    by = {r.column_name: r.n_runs for r in rows}
    # the audit's point: flag columns run long, suppkey doesn't
    assert by["l_returnflag"] < by["l_suppkey"]
    assert by["l_linestatus"] < by["l_suppkey"]


def test_reshard_audit_matches_python_ring(spark):
    """Ring assignment recomputed with bisect over the same literal
    node positions; the consistent-hashing guarantee must hold: a key
    moves iff its 48-ring owner is one of the 16 ADDED nodes, and the
    ring moves strictly fewer keys than mod resharding."""
    import bisect
    import hashlib

    from weatherapi_data_engineering_project_spark.plans.layout import (
        _RING_NEW,
        _RING_OLD,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    def assign(nodes, h):
        i = bisect.bisect_right(nodes, h)
        return nodes[i] if i < len(nodes) else nodes[0]

    added = set(_RING_NEW) - set(_RING_OLD)
    keys = [
        r.o_orderkey
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey")
        .collect()
    ]
    m_ring = m_mod = 0
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        a32, a48 = assign(_RING_OLD, h), assign(_RING_NEW, h)
        moved = a32 != a48
        assert moved == (a48 in added), "ring moved a key off a kept node"
        m_ring += moved
        m_mod += (k % 32) != (k % 48)
    got = {
        r.strategy: r for r in L.q172_reshard_audit(spark, SF_DIR).collect()
    }
    assert got["ring"].n_moved == m_ring
    assert got["mod"].n_moved == m_mod
    assert got["ring"].n_keys == got["mod"].n_keys == len(keys)
    assert got["ring"].n_moved < got["mod"].n_moved
    assert abs(
        got["ring"].moved_share - round(m_ring / len(keys), 6)
    ) < 1e-9


def test_bitmap_index_matches_python_sets(spark):
    """Set algebra recomputed from raw per-flag orderkey sets — the
    packed-popcount identities must equal plain set arithmetic."""
    from weatherapi_data_engineering_project_spark.schemas import load_table

    sets: dict = {}
    for r in load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_orderkey"
    ).collect():
        sets.setdefault(r.l_returnflag, set()).add(r.l_orderkey)
    rows = {
        (r.flag_a, r.flag_b): r
        for r in L.q185_bitmap_index(spark, SF_DIR).collect()
    }
    flags = sorted(sets)
    assert set(rows) == {
        (a, b) for i, a in enumerate(flags) for b in flags[i + 1:]
    }
    for (a, b), r in rows.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert (r.n_a, r.n_b) == (len(sets[a]), len(sets[b]))
        assert (r.n_intersect, r.n_union) == (inter, union)
        assert abs(r.jaccard - round(inter / union, 6)) < 1e-9
        assert r.n_intersect > 0, "multi-flag orders must exist"


def test_zonemap_prune_brute_force(spark):
    """q192: the scan audit recomputed in Python from the raw orders —
    file assignment, zone maps, and per-probe scan counts must match,
    and the date-clustered layout must never scan more files than the
    arrival layout in total."""
    import datetime

    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = load_table(spark, SF_DIR, "orders").collect()
    epoch = datetime.date(1970, 1, 1)
    days = [
        (r.o_orderkey, (r.o_orderdate.date() - epoch).days) for r in rows
    ]
    mind = min(d for _, d in days)
    maxd = max(d for _, d in days)
    maxk = max(k for k, _ in days)
    span = maxd - mind + 1
    zm: dict = {}
    for k, d in days:
        for layout, f in (
            ("arrival", k * 64 // (maxk + 1)),
            ("clustered", (d - mind) * 64 // span),
        ):
            lo, hi, n = zm.get((layout, f), (10**9, -(10**9), 0))
            zm[(layout, f)] = (min(lo, d), max(hi, d), n + 1)
    want = {}
    for p in range(8):
        plo = mind + p * span // 8
        phi = mind + (p + 1) * span // 8
        for layout in ("arrival", "clustered"):
            files = [v for (la, _), v in zm.items() if la == layout]
            scanned = [
                (lo, hi, n) for lo, hi, n in files if hi >= plo and lo < phi
            ]
            want[(layout, p)] = (
                len(files),
                len(scanned),
                sum(n for _, _, n in scanned),
            )
    got = {
        (r.layout, r.probe): (r.n_files, r.files_scanned, r.rows_scanned)
        for r in L.q192_zonemap_prune(spark, SF_DIR).collect()
    }
    assert got == want
    tot_arr = sum(v[1] for (la, _), v in got.items() if la == "arrival")
    tot_clu = sum(v[1] for (la, _), v in got.items() if la == "clustered")
    assert tot_clu < tot_arr, "clustering must actually prune"
