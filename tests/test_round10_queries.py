"""Round-10 unit tests: corpus-derived LSH sizing (the VERDICT r09
scale-killer fix) and the q289/q290 grid tuners.

The sizing rules turn BENCH_SCALE_r09's measured failure (fixed-width
sign-LSH: q93 at 20.5× wall for 10× corpus) into plan-build-time
arithmetic; these tests pin the rules' integer identities, the
derived-equals-pinned equivalence at test scale, and the tuners'
chosen-row logic against brute-force replays.
"""

from __future__ import annotations

import math

import pytest

from conftest import SF_DIR

from weatherapi_data_engineering_project_spark.operators.dedup import (
    scaled_rows_per_band,
)
from weatherapi_data_engineering_project_spark.operators.similarity import (
    ceil_log2,
    scaled_band_bits,
)


def test_ceil_log2_matches_math_for_every_small_n():
    for n in range(2, 4097):
        assert ceil_log2(n) == math.ceil(math.log2(n)), n
    # degenerate corpora clamp to n=2 instead of raising
    assert ceil_log2(0) == 1 and ceil_log2(1) == 1


def test_scaled_band_bits_rule_points():
    """The rule's contract: 2^band_bits >= n/128 (bucket occupancy
    bounded), floored at 4 — including the three corpus sizes the
    scale bench exercises (sf0.01=500, sf0.1=2000, 10x=20000) and the
    100 TB design point."""
    assert scaled_band_bits(500) == 4
    assert scaled_band_bits(2000) == 4
    assert scaled_band_bits(20_000) == 8  # the measured-good width
    assert scaled_band_bits(2_000_000_000) == 24
    for n in (100, 1000, 50_000, 10**7):
        bb = scaled_band_bits(n)
        assert 2**bb >= n / 128 or bb == 4
        # minimality above the floor: one bit fewer would overflow
        if bb > 4:
            assert 2 ** (bb - 1) < n / 128


def test_scaled_rows_per_band_rule_points():
    """r = max(2, ceil((ceil_log2(n) - 7)/3)) via the integer identity
    (x+2)//3 — the false-candidate mass bound at J_bg <= 1/8."""
    assert scaled_rows_per_band(500) == 2
    assert scaled_rows_per_band(5000) == 2
    assert scaled_rows_per_band(8192) == 2  # last r=2 corpus
    assert scaled_rows_per_band(8193) == 3
    assert scaled_rows_per_band(50_000) == 3
    assert scaled_rows_per_band(2_000_000_000) == 8
    for n in (100, 1000, 50_000, 10**7):
        assert scaled_rows_per_band(n) == max(
            2, math.ceil((ceil_log2(n) - 7) / 3)
        )


def test_derived_width_equals_pinned_at_test_scale(spark, sf=SF_DIR):
    """At n=500 the derived width IS 4 bits / r=2, so the corpus-derived
    default must reproduce the old pinned plan's output exactly —
    the invariant that kept every historical oracle green through the
    default switch."""
    from weatherapi_data_engineering_project_spark.operators import (
        dedup as DD,
        similarity as SIM,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    e = load_table(spark, sf, "embeddings")
    derived = sorted(
        tuple(r)
        for r in SIM.cosine_neardup_pairs(e, threshold=0.4).collect()
    )
    pinned = sorted(
        tuple(r)
        for r in SIM.cosine_neardup_pairs(
            e, threshold=0.4, n_bands=4, band_bits=4
        ).collect()
    )
    assert derived == pinned and len(derived) > 0

    d = load_table(spark, sf, "documents")
    derived_m = sorted(
        (r.id1, r.id2)
        for r in DD.minhash_lsh_pairs(d, "text", "doc_id", 0.4).collect()
    )
    pinned_m = sorted(
        (r.id1, r.id2)
        for r in DD.minhash_lsh_pairs(
            d, "text", "doc_id", 0.4, rows_per_band=2
        ).collect()
    )
    assert derived_m == pinned_m and len(derived_m) > 0


def test_lsh_sizing_tuner_chosen_row(spark, sf=SF_DIR):
    """q289's grid is centered on the derived width (r11: {max(2,
    bb-2), bb, bb+2}) and the chosen config must be the cheapest
    log2-cost-bucket clearing the 0.45 integer floor (bucket ties to
    the narrower width; else max recall), recomputed here from the
    emitted measurements themselves."""
    from weatherapi_data_engineering_project_spark.operators.similarity import (
        corpus_row_count,
        scaled_band_bits,
    )
    from weatherapi_data_engineering_project_spark.plans.corpus import (
        q289_lsh_sizing_tuner,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    bb = scaled_band_bits(corpus_row_count(load_table(spark, sf, "embeddings")))
    rows = q289_lsh_sizing_tuner(spark, sf).collect()
    assert sorted(r.band_bits for r in rows) == sorted(
        {max(2, bb - 2), bb, bb + 2}
    )
    assert [r.band_bits for r in rows if r.derived == 1] == [bb]
    assert sum(r.chosen for r in rows) == 1
    for r in rows:
        assert r.meets_floor == int(20 * r.n_found >= 9 * r.n_true)
        assert r.recall == pytest.approx(
            round(r.n_found / r.n_true, 6), abs=0
        )
    passers = [r for r in rows if r.meets_floor == 1]
    if passers:
        want = min(
            passers,
            key=lambda r: (r.n_candidates.bit_length(), r.band_bits),
        )
    else:
        want = max(rows, key=lambda r: (r.recall, -r.band_bits))
    got = next(r for r in rows if r.chosen == 1)
    assert got.config == want.config
    # wider bands must never cost MORE candidates (amplification is
    # monotone in width)
    by_bits = sorted(rows, key=lambda r: r.band_bits)
    for a, b in zip(by_bits, by_bits[1:]):
        assert a.n_candidates >= b.n_candidates


def test_minhash_sizing_tuner_chosen_row(spark, sf=SF_DIR):
    """q290's grid is centered on the derived depth (r11: {max(1,
    r0-1), r0, r0+1}); chosen = cheapest log2-cost-bucket clearing the
    floor, bucket ties to the shallower depth."""
    from weatherapi_data_engineering_project_spark.operators.dedup import (
        scaled_rows_per_band,
    )
    from weatherapi_data_engineering_project_spark.operators.similarity import (
        corpus_row_count,
    )
    from weatherapi_data_engineering_project_spark.plans.llm import (
        q290_minhash_sizing_tuner,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    r0 = scaled_rows_per_band(
        corpus_row_count(load_table(spark, sf, "documents"))
    )
    rows = q290_minhash_sizing_tuner(spark, sf).collect()
    assert sorted(r.rows_per_band for r in rows) == sorted(
        {max(1, r0 - 1), r0, r0 + 1}
    )
    assert [r.rows_per_band for r in rows if r.derived == 1] == [r0]
    assert sum(r.chosen for r in rows) == 1
    for r in rows:
        assert r.meets_floor == int(20 * r.n_found >= 9 * r.n_true)
    passers = [r for r in rows if r.meets_floor == 1]
    if passers:
        want = min(
            passers,
            key=lambda r: (r.n_candidates.bit_length(), r.rows_per_band),
        )
    else:
        want = max(rows, key=lambda r: (r.recall, -r.rows_per_band))
    assert next(r for r in rows if r.chosen == 1).config == want.config
    # deeper bands prune candidates; shallower bands can only find more
    by_r = sorted(rows, key=lambda r: r.rows_per_band)
    for a, b in zip(by_r, by_r[1:]):
        assert a.n_candidates >= b.n_candidates
        assert a.recall >= b.recall


def test_sizing_tuners_self_consistent_at_sf001(spark):
    """The rule's self-consistency check (VERDICT r10 #4 done-
    criterion): at sf0.01 the measured winner IS the derived default
    for BOTH tuners — the zero-cost log(n) rule picks the same row the
    measurement grid picks."""
    from weatherapi_data_engineering_project_spark.plans.corpus import (
        q289_lsh_sizing_tuner,
    )
    from weatherapi_data_engineering_project_spark.plans.llm import (
        q290_minhash_sizing_tuner,
    )

    sf = "/root/testdata/sf0.01"
    for fn in (q289_lsh_sizing_tuner, q290_minhash_sizing_tuner):
        rows = fn(spark, sf).collect()
        chosen = next(r for r in rows if r.chosen == 1)
        assert chosen.derived == 1, (fn.__name__, rows)


def test_streaming_state_is_key_bounded_not_row_bounded(spark, tmp_path):
    """The streaming waivers claim state is watermark/key-bounded, NOT
    corpus-proportional (VERDICT r09 #4). Replay the same user
    universe at 1x and 5x the event volume through q285's real
    EventTimeTimeout eviction drain: peak state-store rows
    (numRowsTotal from the engine's own progress metrics) must be
    IDENTICAL at both scales — state tracks keys, so 5x the rows with
    the same keys adds zero state — while the drained totals scale by
    exactly 5 (same users, each event replayed 5 times)."""
    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.plans.streaming_queries import (
        LAST_STATE_METRICS,
        q285_stream_timeout_flush,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    ev = load_table(spark, SF_DIR, "events")
    d1 = tmp_path / "ev1x"
    d5 = tmp_path / "ev5x"
    ev.write.mode("overwrite").parquet(str(d1 / "events.parquet"))
    reps = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(k * 100_000_000))
        for k in range(5)
    ]
    big = reps[0]
    for c in reps[1:]:
        big = big.unionByName(c)
    big.write.mode("overwrite").parquet(str(d5 / "events.parquet"))

    out1 = {
        r.user_id: (r.n_events, r.sum_cents)
        for r in q285_stream_timeout_flush(spark, str(d1)).collect()
    }
    peak1 = max(m[1] for m in LAST_STATE_METRICS["q285"])
    out5 = {
        r.user_id: (r.n_events, r.sum_cents)
        for r in q285_stream_timeout_flush(spark, str(d5)).collect()
    }
    peak5 = max(m[1] for m in LAST_STATE_METRICS["q285"])

    assert peak1 == peak5, (
        f"state grew with ROWS not KEYS: peak 1x={peak1} 5x={peak5}"
    )
    assert set(out1) == set(out5) and len(out1) > 0
    for uid, (n, cents) in out1.items():
        assert out5[uid] == (5 * n, 5 * cents), uid
    # eviction actually fired at both scales: total removals cover the
    # full user universe (every real user retired exactly once)
    removed5 = sum(m[2] for m in LAST_STATE_METRICS["q285"])
    assert removed5 >= len(out5)


def test_state_budget_planner_bounds(spark):
    """q291's sweep-line budget must obey the physical bounds: state
    occupancy never exceeds the shard's event count, is at least 1
    wherever events exist, the shard/side partition is exhaustive
    (every event lands in exactly one row's count), and the modeled
    lifetimes mean a side with MORE state time per row can never peak
    below an equal-traffic side with less (clicks hold 3 h vs
    purchases' 2 h — checked aggregate-level, not per shard, since
    traffic splits are uneven)."""
    from weatherapi_data_engineering_project_spark.plans.behavior import (
        q291_stream_state_budget,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = q291_stream_state_budget(spark, SF_DIR).collect()
    n_total = load_table(spark, SF_DIR, "events").count()
    assert sum(r.n_events for r in rows) == n_total
    assert {r.side for r in rows} <= {"click", "purchase"}
    for r in rows:
        assert 0 <= r.shard < 32
        assert 1 <= r.peak_state_rows <= r.n_events, r
    clicks = sum(r.peak_state_rows for r in rows if r.side == "click")
    purchases = sum(
        r.peak_state_rows for r in rows if r.side == "purchase"
    )
    n_clicks = sum(r.n_events for r in rows if r.side == "click")
    n_purch = sum(r.n_events for r in rows if r.side == "purchase")
    # longer lifetime => proportionally more peak state per event
    assert clicks / max(n_clicks, 1) >= purchases / max(n_purch, 1)


def test_bounded_attribution_state_is_key_bounded(spark):
    """q292's whole point, asserted from engine metrics: the streaming
    state peaks at the COUNTER count (distinct (hour, user, side) keys
    + the 2 sentinel groups), never at the event count — the contrast
    with q218, whose interval-join state holds every event in the
    watermark horizon (BENCH_SCALE_r10: 100k → 1M rows at 10×). Also
    re-derives the pairing arithmetic as a batch twin in Spark so the
    test stands without the DuckDB harness."""
    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.plans.streaming_queries import (
        LAST_STATE_METRICS,
        q292_stream_bounded_attribution,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in q292_stream_bounded_attribution(spark, sf).collect()
    )

    ev = load_table(spark, sf, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.lit("click"))
        .otherwise(F.lit("purchase"))
        .alias("side"),
        "user_id",
        (F.unix_micros("ts") / F.lit(3_600_000_000))
        .cast("bigint")
        .alias("b"),
    )
    n_keys = ev.select("side", "user_id", "b").distinct().count()
    counts = ev.groupBy("side", "user_id", "b").agg(
        F.count(F.lit(1)).alias("n")
    )
    c = counts.filter(F.col("side") == "click")
    p = counts.filter(F.col("side") == "purchase")
    twin = (
        c.alias("c")
        .join(
            p.alias("p1"),
            (F.col("c.user_id") == F.col("p1.user_id"))
            & (F.col("c.b") == F.col("p1.b")),
            "left",
        )
        .join(
            p.alias("p2"),
            (F.col("c.user_id") == F.col("p2.user_id"))
            & (F.col("c.b") + 1 == F.col("p2.b")),
            "left",
        )
        .groupBy(F.col("c.b").alias("hour_idx"))
        .agg(
            F.sum("c.n").cast("bigint").alias("n_clicks"),
            F.sum(
                F.col("c.n")
                * (
                    F.coalesce(F.col("p1.n"), F.lit(0))
                    + F.coalesce(F.col("p2.n"), F.lit(0))
                )
            )
            .cast("bigint")
            .alias("n_attr_pairs"),
        )
    )
    want = sorted(tuple(r) for r in twin.collect())
    assert got == want and len(got) > 0

    metrics = LAST_STATE_METRICS["q292"]
    assert metrics, "no state metrics recorded"
    totals = [t for _bid, t, _rm in metrics]
    # peak state = counters, bounded by distinct keys (+2 sentinel
    # window groups), NOT by events
    assert max(totals) <= n_keys + 2
    # append-mode finalization actually RETIRES counters: by the last
    # batch only the not-yet-final sentinel window group survives
    assert totals[-1] <= 2


def test_corpus_row_count_memo_is_filter_safe(spark):
    """The sizing-rule count memo must key on plan SEMANTICS, not just
    scan files: a filtered frame over the same parquet gets its own
    count, repeated calls hit the memo (no second job), and distinct
    directories never collide."""
    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.operators.similarity import (
        _COUNT_MEMO,
        corpus_row_count,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    d1 = load_table(spark, "/root/testdata/sf0.001", "documents")
    n_all = corpus_row_count(d1)
    assert n_all == d1.count() > 0
    # fixture-derived threshold (ADVICE r10): the median n_chars keeps
    # both sides non-empty for ANY regenerated fixture; assert the
    # precondition explicitly instead of baking in a magic 200
    chars = sorted(r[0] for r in d1.select("n_chars").collect())
    threshold = chars[len(chars) // 2]
    assert chars[0] <= threshold < chars[-1], "degenerate fixture"
    filtered = d1.filter(F.col("n_chars") > threshold)
    n_f = corpus_row_count(filtered)
    assert n_f == filtered.count() < n_all
    # repeat calls are memo hits returning the SAME values
    size_before = len(_COUNT_MEMO)
    assert corpus_row_count(d1) == n_all
    assert corpus_row_count(filtered) == n_f
    assert len(_COUNT_MEMO) == size_before
    d2 = load_table(spark, SF_DIR, "documents")
    assert corpus_row_count(d2) == d2.count()


def test_interval_join_state_model_matches_engine(spark, tmp_path):
    """Validate q291's state-budget MODEL against the ENGINE, batch by
    batch: replay sf0.001 events as 3 time-ordered files (one per
    micro-batch) through the real q218-shaped interval join and assert
    the state store's numRowsTotal brackets the sweep-line occupancy
    evaluated under the engine's own eviction rule — a click held
    while wm ≤ click_ts + 1 h, a purchase while wm ≤ p_ts, with wm =
    (max event time through the PREVIOUS batch) − 2 h. q291 computes
    that occupancy's continuous peak; this proves the engine follows
    the modeled retention at batch granularity: it never holds FEWER
    rows than the model (eviction is never premature) and at most a
    small conservative boundary margin more (observed ≤3 of ~339),
    plus end-to-end conservation — every arrived event not still
    buffered was evicted exactly once (numRowsRemoved units are
    half-events: each eviction releases two store rows)."""
    import json as _json
    import time as _time

    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.schemas import load_table
    from weatherapi_data_engineering_project_spark.session import (
        cloned_session,
    )
    from weatherapi_data_engineering_project_spark.streaming.windows import (
        stream_interval_join,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_id", "ts", "user_id")
    rows = sorted(ev.collect(), key=lambda r: r.ts)
    K, n = 3, len(rows)
    bounds = [i * n // K for i in range(K + 1)]
    slices = [rows[bounds[i]:bounds[i + 1]] for i in range(K)]
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    # micro-batch ordering: FileStreamSource with maxFilesPerTrigger=1
    # drains files in MTIME order. Stamp each wave's files with an
    # explicit, strictly-increasing mtime instead of sleeping between
    # writes (ADVICE r10: wall-clock sleeps flake on a loaded box);
    # the sub-second settle sleep only lets the writer finish renames.
    import glob as _glob
    import os as _os

    def _wave_files():
        return set(_glob.glob(src + "/*.parquet"))

    seen: set = set()
    wave_idx = 0
    base_mtime = _time.time()

    def _stamp_wave():
        nonlocal wave_idx, seen
        new = _wave_files() - seen
        assert new, "writer produced no files for this wave"
        for f in new:
            _os.utime(f, (base_mtime + wave_idx, base_mtime + wave_idx))
        seen |= new
        wave_idx += 1

    for sl in slices:
        spark.createDataFrame(
            sl, "event_id bigint, ts timestamp, user_id bigint"
        ).coalesce(1).write.mode("append").parquet(src)
        _stamp_wave()
    mx = rows[-1].ts
    spark.createDataFrame(
        [(-2, None, -1), (-1, None, -1)],
        "event_id bigint, ts timestamp, user_id bigint",
    ).withColumn("ts", F.lit(mx) + F.expr("INTERVAL 20 DAYS")).coalesce(
        1
    ).write.mode("append").parquet(src)
    _stamp_wave()

    s2 = cloned_session(spark)
    stream = (
        s2.readStream.schema("event_id bigint, ts timestamp, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    joined = stream_interval_join(
        stream.filter(F.col("event_id") % 2 == 0),
        stream.filter(F.col("event_id") % 2 != 0),
        max_lag="1 hour",
        watermark="2 hours",
        how="left_outer",
    )
    q = (
        joined.writeStream.foreachBatch(lambda b, i: b.count())
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    metrics = {}
    for p in q.recentProgress:
        d = _json.loads(p.json)
        if d.get("stateOperators"):
            so = d["stateOperators"][0]
            metrics[d["batchId"]] = (
                so["numRowsTotal"],
                so["numRowsRemoved"],
            )
    assert set(metrics) >= {0, 1, 2, 3}, metrics

    US = 1_000_000
    H1, H2 = 3600 * US, 7200 * US

    def us(t):
        import calendar

        return calendar.timegm(t.timetuple()) * US + t.microsecond

    sent_us = us(mx) + 20 * 86400 * US
    batches = [
        [(us(r.ts), r.event_id % 2 == 0) for r in sl] for sl in slices
    ] + [[(sent_us, True), (sent_us, False)]]
    wm, arrived, pred = 0, [], {}
    for k, b in enumerate(batches):
        arrived.extend(b)
        pred[k] = sum(
            1 for (t, is_click) in arrived
            if t + (H1 if is_click else 0) >= wm
        )
        wm = max(wm, max(t for (t, _c) in arrived) - H2)

    # model vs engine, per batch: the engine must NEVER hold fewer rows
    # than the modeled occupancy (eviction is never premature — the
    # safety property q291's budget relies on), and holds at most a
    # small conservative margin more (observed ≤3: ms-truncated
    # watermark keys + the state-watermark's exclusive-boundary guard
    # retain a handful of boundary rows the idealized continuous rule
    # would already drop).
    # the safety direction (never fewer rows than the model — eviction
    # is never premature) is the property q291's budget relies on and
    # is asserted on EVERY Spark version
    for k in range(K + 1):
        total, _rm = metrics[k]
        assert pred[k] <= total, (k, total, pred[k])
    # batch 0 is exact: nothing evictable under wm=0
    assert metrics[0][0] == pred[0] == len(batches[0])
    # conservation + tight upper margin pin VERSION-SPECIFIC metric
    # semantics (numRowsRemoved counted as half-events; ≤3-row
    # conservative boundary retention, asserted at +5) — validated on
    # Spark 4.1; on another minor an engine metrics change should read
    # as drift, not a model violation (ADVICE r10), so soft-report.
    import pyspark

    totals_last = metrics[max(metrics)][0]
    n_arrived = n + 2
    n_evicted = 2 * sum(rm for (_t, rm) in metrics.values())
    version_pinned = pyspark.__version__.startswith("4.1")
    if version_pinned:
        for k in range(K + 1):
            total, _rm = metrics[k]
            assert total <= pred[k] + 5, (k, total, pred[k])
        assert n_evicted == n_arrived - totals_last, (n_evicted, metrics)
    else:  # pragma: no cover — other Spark minors
        import warnings

        if n_evicted != n_arrived - totals_last:
            warnings.warn(
                "numRowsRemoved conservation differs on Spark "
                f"{pyspark.__version__}: evicted={n_evicted} "
                f"arrived={n_arrived} buffered={totals_last} — engine "
                "metric semantics drift, not a state-model violation"
            )
