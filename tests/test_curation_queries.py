"""Curation queries (q79-q82): oracle differentials + plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, SF_DIR_ORACLE, compare_query_to_oracle
from weatherapi_data_engineering_project_spark.plans import curation as C


@pytest.mark.parametrize("name", sorted(C.QUERIES))
def test_curation_oracle_differential(spark, name):
    compare_query_to_oracle(
        spark, name, C.QUERIES[name], C.ORACLE[name], SF_DIR_ORACLE
    )


def test_split_assign_covers_corpus_and_is_deterministic(spark):
    rows = C.q79_split_assign(spark, SF_DIR).collect()
    from weatherapi_data_engineering_project_spark.schemas import load_table

    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # deterministic: a second run produces the identical accounting
    again = C.q79_split_assign(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pii_scrub_counts_and_redacts(spark):
    rows = C.q80_pii_scrub(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # every doc carries exactly one injected email + one URL; the
        # injected phone appears on doc_id % 3 == 0 only (the decoy
        # '555-010 555-0100' spans 3-3-4 digits and DOES match once)
        assert r.n_emails == 1
        assert r.n_urls == 1
        assert r.n_phones == (2 if r.doc_id % 3 == 0 else 1)


def test_temperature_mix_weights_normalize(spark):
    rows = C.q81_temperature_mix(spark, SF_DIR).collect()
    assert rows
    s = sum(r.weight for r in rows)
    assert abs(s - 1.0) < 1e-3  # weights renormalize (6dp rounding)
    # tempering: every weight sits between uniform and raw share order —
    # smaller-than-average sources get weight > p_raw
    for r in rows:
        if r.p_raw < 1.0 / len(rows):
            assert r.weight >= r.p_raw


def test_zipf_window_is_group_limited_not_single_partition(spark):
    plan = (
        C.q82_zipf_slope(spark, SF_DIR)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "WindowGroupLimit" in plan
    assert "SinglePartition" not in plan


def test_negative_sampling_ring_invariants(spark):
    """No self-pairs, exactly the configured slots, and every doc in a
    multi-doc shard gets its negatives."""
    from collections import Counter

    from weatherapi_data_engineering_project_spark.plans.curation import (
        _NEG_PER_DOC,
        _RING_MIN_SHARDS,
        _RING_MOD,
        _RING_MULT,
        _RING_TARGET,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = C.q109_negative_sampling(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.neg_id != r.doc_id
        assert 1 <= r.slot <= _NEG_PER_DOC
    docs = [r.doc_id for r in
            load_table(spark, SF_DIR, "documents").select("doc_id").collect()]
    nsh = max(_RING_MIN_SHARDS, -(-len(docs) // _RING_TARGET))
    shard_sizes = Counter(
        ((d * _RING_MULT) % _RING_MOD) % nsh for d in docs
    )
    per_doc = Counter(r.doc_id for r in rows)
    for d in docs:
        size = shard_sizes[((d * _RING_MULT) % _RING_MOD) % nsh]
        if size >= _NEG_PER_DOC + 1:
            assert per_doc[d] == _NEG_PER_DOC
        elif size == 1:
            assert per_doc[d] == 0


def test_negative_sampling_shards_scale_with_corpus(spark):
    """VERDICT r04 #4: the shard count derives from the corpus size —
    no window partition ever holds more than ~target rows, so the old
    corpus/32-in-one-task cap is gone. Verified with a small target so
    the scaling path actually fires."""
    from collections import Counter

    from weatherapi_data_engineering_project_spark.plans.curation import (
        _RING_MOD,
        _RING_MULT,
        _negative_ring,
    )

    n, target = 500, 50
    d = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    rows = _negative_ring(d, neg_per_doc=2, target=target, min_shards=1).collect()
    # nsh = ceil(500/50) = 10; every shard has ~50 docs >= 3, so every
    # doc gets exactly 2 negatives
    per_doc = Counter(r.doc_id for r in rows)
    assert len(per_doc) == n and set(per_doc.values()) == {2}
    nsh = 10
    sizes = Counter(((i * _RING_MULT) % _RING_MOD) % nsh for i in range(n))
    assert max(sizes.values()) <= 2 * target
    # neighbor semantics under the derived shards: next-on-ring within
    # the shard, exactly as the oracle's formula states
    ring = sorted(
        (((i * _RING_MULT) % _RING_MOD), i) for i in range(n)
    )
    by_shard = {}
    for h, i in ring:
        by_shard.setdefault(h % nsh, []).append(i)
    expect = set()
    for members in by_shard.values():
        for j, doc in enumerate(members):
            for s in (1, 2):
                neg = members[(j + s) % len(members)]
                if neg != doc:
                    expect.add((doc, s, neg))
    assert {(r.doc_id, r.slot, r.neg_id) for r in rows} == expect


def test_ngram_novelty_partitions_first_appearances(spark):
    """Rates are probabilities, and summed n_novel equals the corpus's
    distinct-shingle count: every shingle is novel for exactly one doc
    (its min-doc_id owner)."""
    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.functions import text as TX
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = C.q110_ngram_novelty(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.novelty_rate <= 1.0
        assert 0 <= r.n_novel <= r.n_shingles
    d = load_table(spark, SF_DIR, "documents")
    n_distinct = (
        d.select(F.explode(TX.shingles(TX.tokens("text"), 5)).alias("sh"))
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == n_distinct


def test_vocab_coverage_totals_and_bounds(spark):
    """Per-source token counts sum to the corpus token count and OOV
    occurrences equal total minus in-vocab occurrences."""
    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.functions import text as TX
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = C.q112_vocab_coverage(spark, SF_DIR).collect()
    assert rows
    d = load_table(spark, SF_DIR, "documents")
    total = d.select(
        F.sum(F.size(TX.tokens("text"))).alias("n")
    ).collect()[0].n
    assert sum(r.n_tokens for r in rows) == total
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0.0 <= r.oov_rate <= 1.0


def test_length_buckets_account_for_every_doc(spark):
    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.functions import text as TX
    from weatherapi_data_engineering_project_spark.plans.curation import (
        _LEN_BINS,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = C.q114_length_buckets(spark, SF_DIR).collect()
    d = load_table(spark, SF_DIR, "documents")
    assert sum(r.n_docs for r in rows) == d.count()
    total_tok = d.select(
        F.sum(F.size(TX.tokens("text"))).alias("n")
    ).collect()[0].n
    assert sum(r.n_tokens for r in rows) == total_tok
    caps = set(_LEN_BINS) | {2 * _LEN_BINS[-1]}
    for r in rows:
        assert r.bucket_cap in caps
        assert 0 <= r.waste_rate < 1
        assert r.n_padding == r.bucket_cap * r.n_docs - r.n_tokens


def test_weighted_sample_deterministic_and_biased(spark):
    """A-ES draw is exactly k rows, bit-reproducible across runs, and
    longer docs are overrepresented vs a uniform draw (the weights
    actually bias selection)."""
    from weatherapi_data_engineering_project_spark.functions import text as TX
    from weatherapi_data_engineering_project_spark.plans.curation import _WS_K
    from weatherapi_data_engineering_project_spark.schemas import load_table

    r1 = C.q125_weighted_sample(spark, SF_DIR).collect()
    r2 = C.q125_weighted_sample(spark, SF_DIR).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    assert len(r1) == _WS_K
    assert all(r.n_tokens > 0 and r.samp_key >= 0 for r in r1)
    d = load_table(spark, SF_DIR, "documents")
    mean_all = (
        d.select(F.avg(F.size(TX.tokens("text"))).alias("m")).collect()[0].m
    )
    mean_sample = sum(r.n_tokens for r in r1) / len(r1)
    assert mean_sample > mean_all


def test_boilerplate_prefix_groups_share_prefix(spark):
    """Every reported group's member docs really share their first 8
    tokens, and singleton prefixes are never reported."""
    from weatherapi_data_engineering_project_spark.functions import text as TX
    from weatherapi_data_engineering_project_spark.plans.curation import (
        _PREFIX_K,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    groups = C.q128_boilerplate_prefix(spark, SF_DIR).collect()
    assert groups, "sf0.01 planted near-dups share prefixes"
    d = load_table(spark, SF_DIR, "documents")
    fp = (
        d.select("doc_id", "source", TX.tokens("text").alias("t"))
        .filter(F.size("t") >= _PREFIX_K)
        .select(
            "doc_id",
            "source",
            F.concat_ws(" ", F.slice("t", 1, _PREFIX_K)).alias("p"),
        )
        .collect()
    )
    by_prefix = {}
    for r in fp:
        by_prefix.setdefault(r.p, []).append(r)
    multi = {p: rs for p, rs in by_prefix.items() if len(rs) >= 2}
    assert len(groups) == len(multi)
    sizes = sorted(g.n_docs for g in groups)
    assert sizes == sorted(len(rs) for rs in multi.values())
    for g in groups:
        assert g.n_docs >= 2 and 1 <= g.n_sources <= g.n_docs


def test_unigram_entropy_bounds_and_brute_force(spark):
    """Entropy is in [0, ln V], normalized in [0, 1], and matches the
    brute-force Shannon computation for one source."""
    import math

    from weatherapi_data_engineering_project_spark.functions import text as TX
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = {r.source: r for r in C.q132_unigram_entropy(spark, SF_DIR).collect()}
    assert rows
    for r in rows.values():
        assert 0 <= r.entropy <= math.log(r.vocab) + 1e-9
        assert 0 <= r.norm_entropy <= 1 + 1e-9
        assert r.vocab <= r.n_tokens
    src = next(iter(rows))
    d = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("source") == src)
        .select(F.explode(TX.tokens("text")).alias("t"))
        .filter(F.col("t") != "")
        .collect()
    )
    from collections import Counter

    cnt = Counter(x.t for x in d)
    n = sum(cnt.values())
    h = sum((c / n) * math.log(n / c) for c in cnt.values())
    assert abs(rows[src].entropy - h) < 1e-4
    assert rows[src].n_tokens == n and rows[src].vocab == len(cnt)


def test_lang_diversity_simpson_brute_force(spark):
    """Simpson index and majority share match the per-source language
    histogram exactly."""
    from collections import Counter

    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = {r.source: r for r in C.q133_lang_diversity(spark, SF_DIR).collect()}
    d = load_table(spark, SF_DIR, "documents").select("source", "lang").collect()
    by_src = {}
    for r in d:
        by_src.setdefault(r.source, []).append(r.lang)
    assert set(rows) == set(by_src)
    for src, langs in by_src.items():
        cnt = Counter(langs)
        n = len(langs)
        simpson = 1 - sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1))
        got = rows[src]
        assert got.n_docs == n and got.n_langs == len(cnt)
        assert abs(got.simpson - simpson) < 1e-6
        assert abs(got.majority_share - max(cnt.values()) / n) < 1e-6


def test_split_term_drift_table_invariants(spark):
    """Contingency invariants: per-term observed counts sum to the
    term's corpus total, contributions sum to the repeated statistic,
    and dof matches the densified table dimensions."""
    rows = C.q143_split_term_drift(spark, SF_DIR).collect()
    assert rows
    chi2, dof = rows[0].chi2, rows[0].dof
    assert all(r.chi2 == chi2 and r.dof == dof for r in rows)
    assert abs(sum(r.contrib for r in rows) - chi2) < 1e-6
    terms = {r.term for r in rows}
    grps = {r.grp for r in rows}
    assert grps == {"train", "heldout"}
    assert len(rows) == len(terms) * 2  # densified: every cell present
    assert dof == (len(terms) - 1) * (len(grps) - 1)
    assert all(r.contrib >= 0 for r in rows)


def test_psi_drift_terms_and_totals(spark):
    """PSI terms are individually non-negative ((p-q)ln(p/q) >= 0),
    sum to the repeated index, smoothed shares sum to ~1 per side,
    and the bin counts partition both splits."""
    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = C.q151_psi_drift(spark, SF_DIR).collect()
    assert len(rows) >= 2, "bins must discriminate on this corpus"
    psi = rows[0].psi
    assert all(r.psi == psi for r in rows)
    assert abs(sum(r.psi_term for r in rows) - psi) < 1e-6
    assert all(r.psi_term >= 0 for r in rows)
    assert abs(sum(r.p_train for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.p_heldout for r in rows) - 1.0) < 1e-3
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.ca + r.cb for r in rows) == n_docs


def test_k_anonymity_tiers_partition_the_table(spark):
    """Tier rows partition customers exactly; singleton groups have
    n_groups == n_rows; shares sum to 1."""
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = {r.k_tier: r for r in C.q158_k_anonymity(spark, SF_DIR).collect()}
    n_cust = load_table(spark, SF_DIR, "customer").count()
    assert sum(r.n_rows for r in rows.values()) == n_cust
    if "1" in rows:
        assert rows["1"].n_groups == rows["1"].n_rows
    assert abs(sum(r.row_share for r in rows.values()) - 1.0) < 1e-4
    for r in rows.values():
        assert r.n_groups <= r.n_rows


def test_inverted_index_equals_python_index(spark):
    """Postings match a dict-based index built in Python over the raw
    text with the same tokenizer."""
    import re

    from weatherapi_data_engineering_project_spark.schemas import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    want = {}
    for d in docs:
        for pos, w in enumerate(re.split(r"\s+", d.text.strip().lower())):
            key = (w, d.doc_id)
            want.setdefault(key, []).append(pos)
    got = {
        (r.term, r.doc_id): (r.tf, r.positions)
        for r in C.q160_inverted_index(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for key, positions in want.items():
        assert got[key] == (len(positions), ",".join(map(str, positions)))


def test_mutual_information_matches_python_recompute(spark):
    """MI / marginal entropies / NMI recomputed from the raw
    (source, lang) contingency table with the same snap conventions;
    cross-checks the information-theoretic identities."""
    import math
    from decimal import Decimal

    from weatherapi_data_engineering_project_spark.schemas import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "lang"
    ).collect()
    cells: dict[tuple, int] = {}
    for d in docs:
        cells[(d.source, d.lang)] = cells.get((d.source, d.lang), 0) + 1
    n = sum(cells.values())
    rc: dict[str, int] = {}
    tc: dict[str, int] = {}
    for (s, l), c in cells.items():
        rc[s] = rc.get(s, 0) + c
        tc[l] = tc.get(l, 0) + c

    def snap9(x):
        return Decimal(str(round(x, 9))).quantize(Decimal("1e-9"))

    mi = float(
        sum(
            snap9(c / n * math.log(c * n / (rc[s] * tc[l])))
            for (s, l), c in cells.items()
        )
    )
    hs = float(sum(snap9(-(c / n) * math.log(c / n)) for c in rc.values()))
    hl = float(sum(snap9(-(c / n) * math.log(c / n)) for c in tc.values()))

    r = C.q165_mutual_information(spark, SF_DIR).collect()[0]
    assert r.n_cells == len(cells)
    assert abs(r.mi - round(mi, 6)) < 1e-9
    assert abs(r.h_source - round(hs, 6)) < 1e-9
    assert abs(r.h_lang - round(hl, 6)) < 1e-9
    assert abs(r.nmi - round(mi / math.sqrt(hs * hl), 6)) < 1e-5
    # identities: 0 <= MI <= min(H_source, H_lang); NMI in [0, 1]
    assert -1e-9 <= r.mi <= min(r.h_source, r.h_lang) + 1e-9
    assert -1e-9 <= r.nmi <= 1 + 1e-9


def test_bpe_merges_match_python_sennrich(spark):
    """The 5 learned merges equal a pure-Python Sennrich trainer run
    on the same word-frequency table (same tiebreak, same greedy
    non-overlapping merge pass)."""
    import re
    from collections import Counter

    from weatherapi_data_engineering_project_spark.schemas import load_table

    wc = Counter()
    for r in load_table(spark, SF_DIR, "documents").select("text").collect():
        for w in re.split("[^a-z]+", r.text.lower()):
            if w:
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(5):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        (a, b), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b, a + b, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    rows = sorted(
        C.q166_bpe_merges(spark, SF_DIR).collect(),
        key=lambda r: r.merge_rank,
    )
    assert [
        (r.left_sym, r.right_sym, r.merged, r.pair_count) for r in rows
    ] == merges


def test_bpe_merge_pass_greedy_overlap_semantics(spark):
    """The window parity rule equals sequential greedy on the hard
    cases: identical-symbol runs (odd and even length) and adjacent
    disjoint occurrences that a string replace would miss."""
    from weatherapi_data_engineering_project_spark.plans.curation import (
        _bpe_merge_pass,
    )

    rows = []
    for word in ("aaa", "aaaa", "banana", "aab", "baa"):
        for i, ch in enumerate(word):
            rows.append((word, 1, i, ch))
    sym = spark.createDataFrame(
        rows, schema="word string, cnt int, idx int, sym string"
    )
    out = _bpe_merge_pass(sym, "a", "a").collect()
    seqs = {}
    for r in out:
        seqs.setdefault(r.word, {})[r.idx] = r.sym
    got = {w: [d[i] for i in sorted(d)] for w, d in seqs.items()}
    assert got["aaa"] == ["aa", "a"]
    assert got["aaaa"] == ["aa", "aa"]
    assert got["banana"] == list("banana")
    assert got["aab"] == ["aa", "b"]
    assert got["baa"] == ["b", "aa"]
    # disjoint adjacent occurrences of a two-symbol pair ("n","a"):
    # both merge (string replace would consume the shared delimiter)
    out2 = _bpe_merge_pass(sym, "n", "a").collect()
    ban = sorted(
        ((r.idx, r.sym) for r in out2 if r.word == "banana")
    )
    assert [s for _, s in ban] == ["b", "a", "na", "na"]


def test_scaling_subsets_nesting_and_python_recount(spark):
    """Counts recomputed with hashlib in Python; nesting is structural
    (threshold containment) so docs/tokens must be monotone."""
    import hashlib
    import re

    from weatherapi_data_engineering_project_spark.schemas import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    want = {"p10": [0, 0], "p25": [0, 0], "p50": [0, 0], "p100": [0, 0]}
    for r in docs:
        h2 = hashlib.md5(str(r.doc_id).encode()).hexdigest()[:2]
        nt = len([t for t in re.split(r"\s+", r.text.lower().strip()) if t])
        for name, thr in (("p10", "1a"), ("p25", "40"), ("p50", "80")):
            if h2 < thr:
                want[name][0] += 1
                want[name][1] += nt
        want["p100"][0] += 1
        want["p100"][1] += nt
    got = {
        r.level: r for r in C.q171_scaling_subsets(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for name, (nd, ntk) in want.items():
        assert (got[name].n_docs, got[name].n_tokens) == (nd, ntk)
        assert abs(
            got[name].token_share - round(ntk / want["p100"][1], 6)
        ) < 1e-9
    order = ["p10", "p25", "p50", "p100"]
    for a, b in zip(order, order[1:]):
        assert got[a].n_docs <= got[b].n_docs
        assert got[a].n_tokens <= got[b].n_tokens
    assert 0 < got["p10"].n_docs < got["p100"].n_docs


def test_heaps_law_brute_force(spark):
    """q191: cumulative counts recomputed in Python — the final
    checkpoint must cover the WHOLE corpus (total trigram occurrences,
    total distinct trigrams) and both curves must be monotone."""
    import re

    from weatherapi_data_engineering_project_spark.schemas import load_table

    docs = load_table(spark, SF_DIR, "documents").collect()
    occ = 0
    vocab: set = set()
    for r in docs:
        toks = re.split(r"\s+", r.text.lower().strip())
        occ += max(len(toks) - 2, 0)
        for i in range(len(toks) - 2):
            vocab.add(" ".join(toks[i : i + 3]))
    rows = sorted(
        C.q191_heaps_law(spark, SF_DIR).collect(), key=lambda r: r.ckpt
    )
    assert rows, "expected checkpoint rows"
    assert rows[-1].n_tokens_cum == occ
    assert rows[-1].vocab_cum == len(vocab)
    for a, b in zip(rows, rows[1:]):
        assert b.n_tokens_cum >= a.n_tokens_cum
        assert b.vocab_cum >= a.vocab_cum
    # same fit on every row; beta in the meaningful Heaps range
    assert len({r.beta for r in rows}) == 1
    assert 0.0 < rows[0].beta <= 1.0
    assert 0.0 <= rows[0].r2 <= 1.0


def test_q195_jsd_matches_numpy(spark):
    """Brute-force JSD over the raw token streams equals the engine's
    bucketed/decimal formulation within rounding tolerance, and the
    bounds 0 <= JSD <= ln 2 hold."""
    import math
    import re
    from collections import Counter

    from weatherapi_data_engineering_project_spark.schemas import load_table

    d = load_table(spark, SF_DIR, "documents")
    c1: Counter = Counter()
    c2: Counter = Counter()
    for r in d.filter(d.source.isin("src0", "src1")).collect():
        toks = [t for t in re.split(r"\s+", r.text.lower().strip()) if t]
        (c1 if r.source == "src0" else c2).update(toks)
    n1, n2 = sum(c1.values()), sum(c2.values())
    jsd = 0.0
    for t in set(c1) | set(c2):
        p, q = c1.get(t, 0) / n1, c2.get(t, 0) / n2
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log(q / m)

    row = C.q195_js_divergence(spark, SF_DIR).collect()[0]
    assert row.n1 == n1 and row.n2 == n2
    assert row.vocab1 == len(c1) and row.vocab2 == len(c2)
    assert row.vocab_shared == len(set(c1) & set(c2))
    assert abs(row.jsd_nats - jsd) < 1e-6
    assert 0.0 <= row.jsd_nats <= math.log(2) + 1e-9
    assert abs(row.jsd_bits - jsd / math.log(2)) < 1e-5


def test_q199_bootstrap_ci_matches_bruteforce(spark):
    """Replicate membership, means and order statistics recomputed in
    pure Python agree exactly (the no-RNG hash design makes this a
    deterministic equality, not a statistical one)."""
    import hashlib

    from weatherapi_data_engineering_project_spark.schemas import load_table

    docs = load_table(spark, SF_DIR, "documents").collect()
    means = []
    for b in range(64):
        s = c = 0
        for r in docs:
            if hashlib.md5(f"{r.doc_id}:{b}".encode()).hexdigest()[0] < "8":
                s += r.n_chars
                c += 1
        assert c > 0
        means.append((round(s / c, 9), b))
    means.sort()
    got = C.q199_bootstrap_ci(spark, SF_DIR).collect()[0]
    assert got.n_replicates == 64
    assert abs(got.mean_of_means - sum(m for m, _ in means) / 64) < 1e-6
    assert got.ci_lo == means[1][0]
    assert got.ci_hi == means[62][0]
    assert got.ci_lo <= got.mean_of_means <= got.ci_hi


def test_q200_bigram_perplexity_matches_bruteforce(spark):
    """Add-one bigram LM cross-entropy recomputed with Counters; the
    perplexity is exp(H) and every source's H is positive."""
    import math
    import re
    from collections import Counter

    from weatherapi_data_engineering_project_spark.schemas import load_table

    docs = load_table(spark, SF_DIR, "documents").collect()
    per_src: dict = {}
    glob: Counter = Counter()
    for r in docs:
        toks = re.split(r"\s+", r.text.lower().strip())
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        per_src.setdefault(r.source, Counter()).update(bgs)
        glob.update(bgs)
    heads: Counter = Counter()
    for bg, c in glob.items():
        heads[bg.split(" ")[0]] += c
    v = len({bg.split(" ")[1] for bg in glob})
    rows = {r.source: r for r in
            C.q200_bigram_perplexity(spark, SF_DIR).collect()}
    assert set(rows) == {s for s, cc in per_src.items() if cc}
    for src, cc in per_src.items():
        if not cc:
            continue
        t = sum(cc.values())
        h = -sum(
            cs * round(math.log((glob[bg] + 1)
                                / (heads[bg.split(' ')[0]] + v)), 9)
            for bg, cs in cc.items()
        ) / t
        r = rows[src]
        assert r.n_bigrams == t
        assert abs(r.cross_entropy - h) < 1e-5
        assert r.cross_entropy > 0
        assert abs(r.perplexity - math.exp(h)) < max(1e-4 * math.exp(h), 1e-4)
