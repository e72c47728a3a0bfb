"""Physical-plan regression tests: the plans that make these queries
scale must survive refactors — broadcast dims, pushed filters, pruned
scans, single-shuffle windows. A correctness-preserving change that
re-introduces a full shuffle would pass every value test and still be
a 100 TB regression; these tests fail it."""

from __future__ import annotations

import re

import pytest

from weatherapi_data_engineering_project_spark.plans import analytics as A
from weatherapi_data_engineering_project_spark.plans import star
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan: str) -> int:
    return len(re.findall(r"Exchange (hash|range|Single)", plan))


def test_star_join_broadcasts_all_dims(spark):
    """q02: every dim side of the star join must broadcast — a
    sort-merge fallback would shuffle the fact table per join."""
    plan = _plan(star.q02_star_revenue(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    # the only shuffle is the final aggregation
    assert _shuffles(plan) == 1


def test_projection_pushes_filters_and_prunes_columns(spark):
    """q10: predicate reaches the parquet scan; scan reads only the
    selected columns."""
    plan = _plan(star.q10_projection(spark, SF_DIR))
    # the plan string truncates long filter lists without a closing
    # bracket — only require a non-empty list start
    pushed = re.findall(r"PushedFilters: \[(\w)", plan)
    assert pushed, "no pushed filters in scan"
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, "no scan schema"
    # part has 9 columns; the projection + predicate need only 5
    assert all(len(s.split(",")) <= 5 for s in schemas), schemas


def test_flagship_aggregation_single_shuffle(spark):
    """q01: partial (map-side) aggregation then ONE exchange."""
    plan = _plan(star.q01_pricing_summary(spark, SF_DIR))
    assert _shuffles(plan) == 1
    assert "partial_sum" in plan  # map-side combine present


@pytest.mark.parametrize(
    "qname", ["q31_sessionize", "q32_asof_join", "q33_rollup", "q36_exact_median"]
)
def test_window_analytics_single_shuffle(spark, qname):
    """Sessionize/as-of/rollup/median: exactly one exchange each — the
    design claim in plans/analytics.py's module docstring."""
    plan = _plan(A.QUERIES[qname](spark, SF_DIR))
    assert _shuffles(plan) == 1, f"{qname}: {_shuffles(plan)} shuffles"


def test_semi_and_anti_join_planned_as_hash_joins(spark):
    """q03/q04: IN / NOT IN shapes must plan as broadcast hash
    semi/anti joins, never nested loops."""
    for fn in (star.q03_semi_join, star.q04_anti_join):
        plan = _plan(fn(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "LeftSemi" in plan or "LeftAnti" in plan


def test_extension_windows_single_shuffle(spark):
    """q54 (range frame), q52 (stratified window), q48 (cube): exactly
    one hash exchange each — Expand and window frames must not add
    shuffles."""
    from weatherapi_data_engineering_project_spark.plans import extensions as X

    for qname in ("q48_cube", "q52_stratified_sample", "q54_moving_window"):
        plan = _plan(X.QUERIES[qname](spark, SF_DIR))
        assert _shuffles(plan) == 1, f"{qname}: {_shuffles(plan)} shuffles"


def test_bigjoin_no_nested_loop_and_partial_agg(spark):
    """q55: fact-fact join must stay a hash/merge join (AQE picks
    broadcast at small SF, SMJ at scale); the final groupBy must ride a
    map-side partial aggregate."""
    from weatherapi_data_engineering_project_spark.plans import extensions as X

    plan = _plan(X.q55_bigjoin_revenue(spark, SF_DIR))
    assert "NestedLoop" not in plan
    assert "partial" in plan.lower()


def test_correlated_subquery_decorrelates(spark):
    """q56: Catalyst must rewrite the per-row scalar subqueries into
    aggregate + join (no per-row subquery execution survives in the
    physical plan)."""
    from weatherapi_data_engineering_project_spark.plans import extensions as X

    plan = _plan(X.q56_correlated_subquery(spark, SF_DIR))
    assert "Subquery" not in plan or "ReusedSubquery" in plan
    assert "Join" in plan


def test_contamination_linear_join_shapes(spark):
    """q63: the cross-corpus check must be hash joins on the shingle
    key — any nested-loop/cartesian node means the plan went doc×doc
    quadratic."""
    from weatherapi_data_engineering_project_spark.plans import extensions as X

    plan = _plan(X.q63_contamination(spark, SF_DIR))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan


def test_global_rank_never_single_partitions(spark):
    """q65: the whole point is avoiding the one-task global window —
    the plan must contain NO SinglePartition exchange and no empty
    window partition spec over the data path."""
    from weatherapi_data_engineering_project_spark.plans import extensions as X

    plan = _plan(X.q65_global_rank(spark, SF_DIR))
    data_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "bkt" in ln
    ]
    assert data_windows, "expected the bucket-partitioned ranking window"
    # the offsets frame (a ~33-row agg) may legitimately single-partition;
    # the DATA path must not: its window partitions by bkt
    for ln in data_windows:
        assert "SinglePartition" not in ln


def test_decile_stats_never_single_partitions(spark):
    """q49 (VERDICT r02 #7): the NTILE rewrite must rank inside
    bucket-partitioned windows — no single-task window on the data
    path (the offsets frame, a ~33-row agg, may legitimately
    single-partition)."""
    from weatherapi_data_engineering_project_spark.plans import extensions as X

    plan = _plan(X.q49_decile_stats(spark, SF_DIR))
    data_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "bkt" in ln
    ]
    assert data_windows, "expected the bucket-partitioned ranking window"
    for ln in data_windows:
        assert "SinglePartition" not in ln


def test_label_centroids_partial_agg_no_vector_shuffle(spark):
    """q66: the per-(label,pos) sum must ride a map-side partial
    aggregate (the shuffle carries label×dim partials, never whole
    vectors)."""
    from weatherapi_data_engineering_project_spark.plans import extensions as X

    plan = _plan(X.q66_label_centroids(spark, SF_DIR))
    assert "partial" in plan.lower()
    assert _shuffles(plan) <= 2


def test_ivf_probe_has_no_window_below_the_probe_join(spark):
    """q30 (VERDICT r02 #1): the quantization step must be a row-local
    projection — every Window in the plan is PER-QUERY (partitioned by
    qid/query_id), never a rank over corpus×centroids (the old
    16×-amplified shuffle this test was written against). Since the
    late-r12 re-rank prefilter the contract is exactly three such
    windows — the double prefilter's row_number + k-th-score max on
    THIN (qid, cid, fcos) rows, then the final decimal re-rank on the
    ~k survivors — and two hash exchanges (the thin qid shuffle feeds
    both prefilter windows; the survivor re-rank adds one)."""
    from weatherapi_data_engineering_project_spark.plans import llm

    plan = _plan(llm.q30_ivf_ann(spark, SF_DIR))
    windows = [
        ln
        for ln in plan.splitlines()
        if re.search(r"\bWindow \[", ln)  # WindowGroupLimit excluded
    ]
    assert len(windows) == 3, windows
    # every window is per-query — none partitioned by the corpus side
    for w in windows:
        assert re.search(r"\[(qid|query_id)#\d+L\]", w), w
    # exactly one window ranks the decimal cosine (the output contract)
    assert sum("cosine" in w for w in windows) == 1, windows
    assert _shuffles(plan) == 2, f"{_shuffles(plan)} shuffles"


def test_cosine_topk_is_take_ordered_not_global_window(spark):
    """q26: global top-k must plan as TakeOrderedAndProject (per-
    partition heaps merged at the driver), never an unpartitioned
    ranking window that funnels every scored row through one task."""
    from weatherapi_data_engineering_project_spark.plans import llm

    plan = _plan(llm.q26_cosine_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan


def test_pq_adc_scan_is_pure_projection_topk(spark):
    """q73: the ADC scan must be m literal table lookups over the codes
    column + TakeOrderedAndProject — no join, no hash/range shuffle, no
    single-partition window below the top-k."""
    from weatherapi_data_engineering_project_spark.plans import llm

    plan = _plan(llm.q73_pq_ann(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan
    assert _shuffles(plan) == 0, f"{_shuffles(plan)} shuffles"
    assert "Join" not in plan


def test_ivfpq_is_pruned_projection_topk(spark):
    """q83: the IVF+PQ composite must keep its components' shapes — the
    candidate prune is an equi-/broadcast-join (never a cartesian), the
    ADC scan stays a projection, and the global top-k is a
    TakeOrderedAndProject."""
    from weatherapi_data_engineering_project_spark.plans import llm

    plan = _plan(llm.q83_ivfpq_ann(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_salted_join_query_shards_key(spark):
    """q69: the salted join must actually join on (key, _salt) — the
    sharded key pair — before the salt is dropped."""
    from weatherapi_data_engineering_project_spark.plans import extensions as X

    plan = _plan(X.q69_salted_join(spark, SF_DIR))
    assert "_salt" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_registry_contract_pins_rows_only_set():
    """Driver contract: every oracle key is a registered query, and the
    rows-only set (no SQL twin) is EXACTLY the documented two — a new
    query silently missing its oracle would otherwise downgrade to the
    weaker rows-only check without anyone noticing."""
    from weatherapi_data_engineering_project_spark.plans import registry

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == {
        # q42 moved to a full oracle in r6: integer-cent state makes
        # the drained totals equal the batch GROUP BY twin exactly
        "q43_approx_distinct",   # foreign sketch (HLL++)
        "q62_approx_quantiles",  # foreign sketch (GK)
        # q60/q73/q74 moved to full oracles in r4: FIXED-round trainers
        # unroll into SQL CTEs (_KM_CTES / _PQ_CTES)
    }
    # both rows-only queries carry an error-bound differential instead
    assert set(registry.all_bounds()) == set(qs) - set(oracles)
    assert registry.IMPORT_FAILURES == {}


def test_sequence_pack_never_single_partitions(spark):
    """q40 (VERDICT r03 #1): the per-source packing cumsum must run as
    the two-phase bucketed prefix sum — the data-path window partitions
    by (source, bkt), never a whole-source (or SinglePartition) task.
    The offsets frame (a sources×buckets-row agg) may legitimately
    window per source."""
    from weatherapi_data_engineering_project_spark.plans import llm

    plan = _plan(llm.q40_sequence_pack(spark, SF_DIR))
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert any(
        "bkt" in ln and "doc_id" in ln for ln in windows
    ), "expected the (source, bkt)-partitioned local-cumsum window"
    for ln in windows:
        assert "SinglePartition" not in ln


def test_training_prep_packing_never_single_partitions(spark):
    """q77's packing stage must share q40's two-phase shape — no
    whole-source single-task cumsum window on the composite's data
    path either."""
    from weatherapi_data_engineering_project_spark.plans import llm

    plan = _plan(llm.q77_training_prep(spark, SF_DIR))
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert any(
        "bkt" in ln and "doc_id" in ln for ln in windows
    ), "expected the (source, bkt)-partitioned local-cumsum window"
    for ln in windows:
        assert "SinglePartition" not in ln


def test_training_prep_composite_has_no_quadratic_node(spark):
    """q77 composes three verified stages; the composition itself must
    not regress to a cartesian/nested-loop anywhere (e.g. a lost join
    key between the keep-list anti-join and the packing window)."""
    from weatherapi_data_engineering_project_spark.plans import llm

    plan = _plan(llm.q77_training_prep(spark, SF_DIR))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_unpivot_is_single_pass_expand(spark):
    """q78: the melt must be one Expand projection — no shuffle, no
    join (a UNION ALL of scans would read the table twice)."""
    plan = _plan(A.q78_unpivot(spark, SF_DIR))
    assert "Expand" in plan
    assert _shuffles(plan) == 0, f"{_shuffles(plan)} shuffles"
    assert "Join" not in plan


def test_resize_runs_on_skew_spread_shards(spark):
    """q75: the Arrow kernel must sit above the (size_class, shard)
    repartition so fat blobs spread across executors instead of
    hash-clumping."""
    from weatherapi_data_engineering_project_spark.plans import llm

    plan = _plan(llm.q75_image_resize(spark, SF_DIR))
    assert "MapInPandas" in plan
    assert "size_class" in plan and "shard" in plan


def test_dup_spans_no_broadcast_hint_no_single_partition(spark):
    """q86: the duplicated-hash set is data-dependent and must not be
    HINTED broadcast (the optimizer may still choose broadcast from
    runtime/stats sizes — correct at sf0.001, impossible at 100 TB —
    but a hint would force it at every scale), and no stage may funnel
    the corpus through one task."""
    from weatherapi_data_engineering_project_spark.plans import corpus as C

    df = C.q86_dup_spans(spark, SF_DIR)
    plan = _plan(df)
    assert "SinglePartition" not in plan
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical


def test_mmr_pool_is_take_ordered(spark):
    """q88: pool selection (the only corpus-sized stage) must plan as
    TakeOrderedAndProject, not a global ranking window. Inspected on the
    lazy pool helper — in the full query the pool is checkpointed, so
    the final plan only shows its LogicalRDD scan."""
    from weatherapi_data_engineering_project_spark.operators import (
        similarity as SIM,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = _plan(SIM._mmr_pool(emb, 0, 16, "vec_id", "embedding"))
    assert "TakeOrderedAndProject" in plan
    assert not re.search(r"Window \[.*row_number.*SinglePartition", plan)


def test_mmr_plan_grows_linearly_in_select_k(spark):
    """q88 (VERDICT r04 #1): each greedy pick is eagerly checkpointed,
    so the returned plan is a union of select_k LogicalRDD scans —
    node count LINEAR in select_k. The pre-fix plan nested every prior
    pick's subplan twice per round (~2^k copies): doubling select_k
    would far more than double the plan."""
    from weatherapi_data_engineering_project_spark.operators import (
        similarity as SIM,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table
    from weatherapi_data_engineering_project_spark.caching import release_all

    emb = load_table(spark, SF_DIR, "embeddings")

    def n_lines(k):
        df = SIM.mmr_rerank(emb, select_k=k)
        return len(
            df._jdf.queryExecution().optimizedPlan().toString().splitlines()
        )

    try:
        n3, n6 = n_lines(3), n_lines(6)
    finally:
        release_all()
    # linear: doubling k at most ~doubles the plan (+ slack for the
    # fixed header); exponential would be ~8x here
    assert n6 <= 2 * n3 + 4, (n3, n6)


def test_pagerank_round_is_partial_agg(spark):
    """q89: each PageRank round must push a map-side partial sum ahead
    of the per-destination shuffle (contributions combine before they
    move)."""
    from weatherapi_data_engineering_project_spark.operators.graph import (
        pagerank_fixed,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")],
        "src string, dst string",
    )
    plan = _plan(pagerank_fixed(edges, n_rounds=1, checkpoint=False))
    assert "partial" in plan.lower()
    assert "SinglePartition" not in plan


def test_anomaly_zscore_window_is_partitioned(spark):
    """q117: the rolling-baseline window must partition by event_type —
    a SinglePartition window would funnel the (already tiny) hourly
    frame AND would not survive a many-series scale-up."""
    from weatherapi_data_engineering_project_spark.plans import behavior as B

    plan = _plan(B.q117_anomaly_zscore(spark, SF_DIR))
    assert not re.search(r"Window \[.*SinglePartition", plan)


def test_pmi_vocab_and_final_cut_are_take_ordered(spark):
    """q118: both rank cuts (vocabulary head, final top-20) must plan
    as TakeOrderedAndProject — a global sort of the pair frame is the
    scale failure mode."""
    from weatherapi_data_engineering_project_spark.plans import curation as C

    plan = _plan(C.q118_term_pmi(spark, SF_DIR))
    assert plan.count("TakeOrderedAndProject") >= 2


def test_tfidf_head_is_window_group_limit(spark):
    """q119: the per-source top-5 must run under WindowGroupLimit
    (bounded per-task state), like q82's Zipf head."""
    from weatherapi_data_engineering_project_spark.plans import curation as C

    plan = _plan(C.q119_tfidf_terms(spark, SF_DIR))
    assert "WindowGroupLimit" in plan
    assert not re.search(r"Window \[.*row_number.*SinglePartition", plan)


def test_bm25_final_cut_is_take_ordered(spark):
    """q122: the top-10 must be TakeOrderedAndProject, and the corpus
    stats side must broadcast (1-row frame), never shuffle the docs."""
    from weatherapi_data_engineering_project_spark.plans import curation as C

    plan = _plan(C.q122_bm25_rank(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_hll_register_agg_is_partial(spark):
    """q120: the register build must push a map-side partial max ahead
    of the (event_type, bucket) shuffle — registers combine before
    they move, the property that makes sketch builds linear."""
    from weatherapi_data_engineering_project_spark.plans import layout as L

    plan = _plan(L.q120_hll_sketch(spark, SF_DIR))
    assert "partial_max" in plan or "partial" in plan.lower()


def test_rfm_ntile_windows_partition_by_bucket(spark):
    """q137: each of the three quartile rankings must run inside a
    bucket-partitioned window (the q65/q49 two-phase shape) — a bare
    NTILE window would move every customer into ONE task. The offsets
    frames (≤17-row aggs) may legitimately single-partition."""
    plan = _plan(A.q137_rfm_segments(spark, SF_DIR))
    data_windows = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "row_number" in ln
    ]
    assert len(data_windows) >= 3, "expected three bucketed rankings"
    for ln in data_windows:
        assert "_bkt" in ln, f"ranking window not bucket-partitioned: {ln}"


def test_ks_drift_windows_partition_by_lang(spark):
    """q127: the ECDF cumulative windows partition by lang — the grid
    frame is (langs × distinct lengths), and no window on it may
    collapse to a single partition."""
    plan = _plan(A.q127_ks_drift(spark, SF_DIR))
    cum_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "cum" in ln
    ]
    assert cum_windows
    for ln in cum_windows:
        assert "lang" in ln
        assert "SinglePartition" not in ln


def test_chisq_single_shuffle_to_cells(spark):
    """q124: raw documents collapse to the contingency cells in ONE
    hash-aggregate exchange; the marginal joins must all broadcast
    (the cell table is sources × 4 rows)."""
    plan = _plan(A.q124_chisq_independence(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 3


def test_containment_join_is_capped_not_banded(spark):
    """q123: the candidate join must be the df-capped shingle
    equi-join (anti-join against the hot list present), NOT a MinHash
    band join — banding would silently reintroduce the Jaccard
    collision curve and miss subset duplicates."""
    from weatherapi_data_engineering_project_spark.plans import llm

    plan = _plan(llm.q123_containment_dedup(spark, SF_DIR))
    assert "band" not in plan.lower()
    # the hot-shingle guard: one anti join on the shingle column
    assert "LeftAnti" in plan


def test_local_supplier_volume_plan_shape(spark):
    """q175: every dimension side broadcasts; the only candidate for a
    wide exchange is lineitem ⋈ orders on orderkey."""
    from weatherapi_data_engineering_project_spark.plans import (
        extensions as X,
    )

    plan = _plan(X.q175_local_supplier_volume(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3
    # lineitem ⋈ orders may be SMJ/shuffled-hash or (at tiny SF under
    # AQE) also broadcast; what must NOT appear is a shuffled dim join
    assert plan.count("SortMergeJoin") <= 1
    assert "CartesianProduct" not in plan


def test_exclusive_fault_supplier_decorrelates(spark):
    """q177: Catalyst must turn EXISTS into a semi join and NOT EXISTS
    into an anti join — a correlated re-scan would appear as a nested
    subquery or cartesian product."""
    from weatherapi_data_engineering_project_spark.plans import (
        extensions as X,
    )

    plan = _plan(X.q177_exclusive_fault_supplier(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_reshard_audit_is_scan_side_only(spark):
    """q172: the ring lookup is a literal-array projection — no join
    and no shuffle before the final 2-row aggregate."""
    from weatherapi_data_engineering_project_spark.plans import (
        layout as L,
    )

    plan = _plan(L.q172_reshard_audit(spark, SF_DIR))
    assert "Join" not in plan
    # one exchange for the global aggregate, nothing else
    assert _shuffles(plan) <= 1


def test_rolling_active_users_has_no_per_day_rescan(spark):
    """q179: the sliding distinct is ONE contribution explode + one
    count-distinct — no range join, no cartesian, no window sort over
    the event log."""
    from weatherapi_data_engineering_project_spark.plans import (
        behavior as B,
    )

    plan = _plan(B.q179_rolling_active_users(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("Generate explode") >= 1


def test_bpe_pair_counts_window_is_word_keyed(spark):
    """q166: every window in the trainer partitions by word — a
    global (unpartitioned) window over the symbol table would
    serialize the vocab into one task."""
    from weatherapi_data_engineering_project_spark.plans.curation import (
        _bpe_pair_counts,
        _bpe_word_symbols,
    )

    plan = _plan(_bpe_pair_counts(_bpe_word_symbols(spark, SF_DIR)))
    assert "Window" in plan
    import re as _re

    for spec in _re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "word" in spec


def test_lateral_topk_decorrelates_to_window_limit(spark):
    """q186: the per-customer LIMIT must become a partitioned window
    (WindowGroupLimit), never a per-row re-scan or cartesian."""
    from weatherapi_data_engineering_project_spark.plans import (
        extensions as X,
    )

    plan = _plan(X.q186_lateral_topk(spark, SF_DIR))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_score_auc_windows_partition_by_bucket(spark):
    """q155 (VERDICT r05 #2): the rank-offset cumsum must run as the
    q150 two-phase rewrite — every window partitioned by the sampled
    score bucket, never an unpartitioned scan over the score-distinct
    frame (which grows with corpus richness)."""
    plan = _plan(A.q155_score_auc(spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the bucket-local cumsum window"
    for spec in specs:
        assert "_bkt" in spec, f"unpartitioned window: {spec}"


def test_kaplan_meier_windows_partition_by_bucket(spark):
    """q159 (VERDICT r05 #2): all three cumulations (at-risk suffix
    sum, cumulative hazard, zero flag) must be bucket-partitioned
    two-phase scans — no unpartitioned window over the time grid."""
    from weatherapi_data_engineering_project_spark.plans import (
        behavior as B,
    )

    plan = _plan(B.q159_kaplan_meier(spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the bucket-local scan windows"
    for spec in specs:
        assert "_bkt" in spec, f"unpartitioned window: {spec}"


def test_quality_representatives_window_is_cluster_keyed(spark):
    """q173 (VERDICT r05 #6): the representative-selection windows
    must partition by cluster — a global window would serialize the
    members frame — and no cartesian product may appear anywhere in
    the composed q47+score pipeline."""
    from weatherapi_data_engineering_project_spark.plans import llm as L

    plan = _plan(L.q173_quality_representatives(spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the cluster-keyed selection windows"
    for spec in specs:
        assert "cluster" in spec, f"non-cluster window: {spec}"
    assert "CartesianProduct" not in plan


def test_average_precision_windows_partition_by_bucket(spark):
    """q196: both prefix scans (global rank k, cumulative positives)
    must be bucket-partitioned two-phase windows — never an
    unpartitioned scan over the corpus-sized ranking frame."""
    plan = _plan(A.q196_average_precision(spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the bucket-local rank windows"
    for spec in specs:
        assert "_bkt" in spec, f"unpartitioned window: {spec}"
    assert "CartesianProduct" not in plan


def test_gini_best_split_plan_shape(spark):
    """q197: prefix sums bucket-partitioned; the argmin must compile
    to TakeOrderedAndProject (per-partition top-1), not a global
    sort."""
    df = A.q197_gini_best_split(spark, SF_DIR)
    plan = _plan(df)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the bucket-local cumsum windows"
    for spec in specs:
        assert "_bkt" in spec, f"unpartitioned window: {spec}"
    assert "TakeOrderedAndProject" in plan


def test_quantile_normalization_windows_partition_by_bucket(spark):
    """q212: both rank pipelines (per-source and global) must run as
    bucket-partitioned two-phase windows — never an unpartitioned (or
    whole-source) ranking scan."""
    from weatherapi_data_engineering_project_spark.plans import (
        curation as C,
    )

    plan = _plan(C.q212_quantile_normalization(spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the bucket-local rank windows"
    for spec in specs:
        assert "_bkt" in spec, f"unpartitioned window: {spec}"
    assert "CartesianProduct" not in plan


def test_tpch_q3_plan_shape(spark):
    """q219: the top-10 must compile to TakeOrderedAndProject
    (per-partition top-k) and the customer gate to a semi join — no
    global sort, no cartesian."""
    from weatherapi_data_engineering_project_spark.plans import (
        extensions as X,
    )

    plan = _plan(X.q219_shipping_priority(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q7_broadcasts_nation(spark):
    """q220: the 25-row nation dim must broadcast onto supplier and
    customer — never shuffle as an equal-sized side."""
    from weatherapi_data_engineering_project_spark.plans import (
        extensions as X,
    )

    plan = _plan(X.q220_nation_volume(spark, SF_DIR))
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_dedup_bias_audit_shuffles_fingerprints_not_bodies(spark):
    """q223: the keep-set aggregation must key on the md5 fingerprint
    (32-char shuffle rows), and the only text read is the row-local
    md5 projection — `text` must not survive past the scan-side
    project into any exchange."""
    from weatherapi_data_engineering_project_spark.plans import llm as L

    df = L.q223_dedup_bias_audit(spark, SF_DIR)
    plan = _plan(df)
    assert "md5" in plan
    assert "CartesianProduct" not in plan
    # no window at all — this is a pure agg/join pipeline
    assert "windowspecdefinition" not in plan
