"""Independent-formula audit of every micro-division query (VERDICT r10 #3).

The driver's parity gate compares Spark against an oracle that MIRRORS
the Spark arithmetic (registry rule 3's integer half-up micro form) —
so a bug both sides agree on passes parity. That happened once:
``w_vwap_daily``'s first cut divided by ``qty*1e6`` instead of ``qty``
and the mirrored oracle agreed (docs/ROUND10.md). Every rule-3
micro-division query therefore needs one NON-MIRRORED numeric check:
a plain-float recomputation of the registered query's output from the
raw parquet, no decimal casts, no DIV, no shared helper code.

Tolerance: outputs are micro-rounded (half-up at 1e-6), so the float
recomputation must agree within 5e-7 plus summation noise — asserted
at ``TOL = 1.2e-6`` absolute (a wrong factor or swapped denominator
misses by orders of magnitude).

``test_every_div_oracle_is_audited`` is the ENFORCEMENT: it scans the
registry for oracles using integer division and fails if any such
query is missing from ``AUDITED`` — a future micro-division query
cannot ship without naming its independent check here.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TOL = 1.2e-6
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]"


# ---------------------------------------------------------------- raw inputs


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _emb():
    return pd.read_parquet(f"{SF}/embeddings.parquet")


def _run(spark, name):
    from nt_data_pipelines_spark import plans

    return plans.REGISTRY[name].fn(spark, SF).collect()


def _words(text):
    return [w for w in text.split(" ") if w != ""]


# ------------------------------------------------------- the enforcement map

# query -> where its independent (non-mirrored) numeric check lives.
# "here:<test>" = this file; "file:<test>" = an existing crafted /
# python-reference test; "exempt:<why>" = the oracle's DIV is integer
# bucketing / rank arithmetic whose exactness is pinned elsewhere, not
# a rounded rational output.
AUDITED: dict[str, str] = {
    # LM / information-theory means (per-term round-6, micro mean)
    "t_unigram_logprob": "here:test_unigram_logprob_float_recompute",
    "t_bigram_logprob": "here:test_bigram_logprob_float_recompute",
    "t_source_divergence": "here:test_source_divergence_float_recompute",
    "t_char_entropy": "here:test_char_entropy_float_recompute",
    "a_source_lang_mi": "here:test_source_lang_mi_float_recompute",
    # contamination overlaps
    "t_contamination": "here:test_contamination_set_recompute",
    "t_bloom_decontaminate": (
        "here:test_contamination_set_recompute + "
        "tests/test_dedup_text_sim.py:test_bloom_contamination_equals_exact"
    ),
    # quality / corpus ratios
    "t_repetition_stats": "here:test_repetition_stats_float_recompute",
    "t_lexical_diversity": "here:test_lexical_diversity_float_recompute",
    "t_gopher_rules": "here:test_gopher_rules_float_recompute",
    "a_corpus_report": "here:test_corpus_report_float_recompute",
    # jaccard / containment family
    "d_ngram_jaccard": "here:test_ngram_jaccard_set_recompute",
    "d_containment_pairs": (
        "here:test_ngram_jaccard_set_recompute (same set arithmetic) + "
        "tests/test_dedup_text_sim.py:test_containment_pairs_catch_doc_inside_doc"
    ),
    "d_verified_dup_edges": (
        "tests/test_dedup_text_sim.py:"
        "test_verified_dup_edges_matches_clique_truth_on_testdata"
    ),
    "d_lsh_verified_dedup": (
        "tests/test_dedup_text_sim.py:test_lsh_near_dup_composition_on_clusters"
    ),
    "d_estimate_calibration": (
        "tests/test_dedup_text_sim.py:test_minhash_jaccard_estimate_tracks_exact"
    ),
    # events / funnel / attribution
    "a_funnel_conversion": "here:test_funnel_conversion_recompute",
    "a_last_touch_attribution": "here:test_last_touch_attribution_recompute",
    "a_event_burstiness": "here:test_event_burstiness_float_recompute",
    "a_diurnal_profile": "here:test_diurnal_profile_recompute",
    "a_composition_turnover": "here:test_composition_turnover_float_recompute",
    "a_join_key_skew": "here:test_join_key_skew_recompute",
    # embeddings / retrieval
    "r4_explode_embeddings": "here:test_explode_embeddings_numpy_recompute",
    "s_centroid_per_label": "here:test_centroid_numpy_recompute",
    "s_hybrid_rrf": "here:test_hybrid_rrf_float_recompute",
    # concentration / coverage / vocab
    "a_token_concentration": "here:test_token_concentration_recompute",
    "a_vocab_coverage": "here:test_vocab_coverage_recompute",
    "a_source_vocab_jaccard": "here:test_source_vocab_jaccard_set_recompute",
    "t_token_fertility": (
        "here:test_token_fertility_consistency + tests/test_bpe.py (pure-"
        "python BPE reference pins the encoder the counts come from)"
    ),
    "a_lang_confusion": "here:test_lang_confusion_recompute",
    # quantile / rank arithmetic
    "p_quantile_transform": "here:test_quantile_transform_recompute",
    # graph rank recurrence (integer micro-rank form, round 13)
    "g_pagerank_knn": "here:test_pagerank_knn_float_recompute",
    "p_pps_sample": (
        "tests/test_round10c_ops.py:test_pps_sample_matches_reference_and_is_exact"
        " (pure-python systematic-PPS reference; DIV is rank arithmetic)"
    ),
    # market bars
    "w_vwap_daily": (
        "tests/test_round10c_ops.py:test_vwap_daily_hand_checked — the class's"
        " founding bug (qty*1e6) is the reason this file exists"
    ),
    "w_time_weighted_avg": (
        "tests/test_round10c_ops.py:test_time_weighted_mean_hand_checked"
    ),
    "a_gini_doclen": (
        "tests/test_round10c_ops.py:test_gini_by_group_crafted_and_random"
        " (naive-sorted-reference comparison on random data)"
    ),
    # linkage (similarity ratios over gram sets)
    "j_fuzzy_name_match": (
        "tests/test_dedup_text_sim.py:test_fuzzy_string_pairs_crafted"
        " (hand-computed trigram similarities)"
    ),
    "j_prefix_filter_match": (
        "tests/test_round10b_ops.py / test_round10c_ops.py prefix-filter"
        " crafted tests (losslessness vs naive all-pairs)"
    ),
}


def test_every_div_oracle_is_audited():
    import __spark_entry__  # noqa: F401  (populates REGISTRY)

    from nt_data_pipelines_spark import plans

    div_queries = {
        n
        for n, s in plans.REGISTRY.items()
        if s.oracle and re.search(r"(?:\bDIV\b|//)", s.oracle)
    }
    missing = sorted(div_queries - set(AUDITED))
    assert not missing, (
        f"micro-division queries without an independent-formula audit: "
        f"{missing} — add a non-mirrored recomputation test and list it in "
        "tests/test_micro_division_audit.py:AUDITED"
    )
    stale = sorted(set(AUDITED) - div_queries)
    assert not stale, f"AUDITED entries no longer in the registry/DIV set: {stale}"


# ----------------------------------------------------------- LM-mean family


def test_unigram_logprob_float_recompute(spark):
    docs = _docs()
    cw: Counter = Counter()
    for t in docs.text:
        cw.update(_words(t))
    total = sum(cw.values())
    got = {r.doc_id: r for r in _run(spark, "t_unigram_logprob")}
    for _, d in docs.iterrows():
        ws = _words(d.text)
        r = got[d.doc_id]
        assert r.n_tokens == len(ws)
        if ws:
            x = sum(round(-math.log2(cw[w] / total), 6) for w in ws) / len(ws)
            assert abs(r.bits_per_token - x) <= TOL, d.doc_id


def test_bigram_logprob_float_recompute(spark):
    docs = _docs()
    big: Counter = Counter()
    uni: Counter = Counter()
    for t in docs.text:
        ws = _words(t)
        uni.update(ws[:-1])  # bigram conditioning contexts
        big.update(zip(ws, ws[1:]))
    got = {r.doc_id: r for r in _run(spark, "t_bigram_logprob")}
    # discover the exact conditional form from one long doc, then pin
    # every doc: P(w2|w1) = c(w1 w2) / c(w1 as context)
    checked = 0
    for _, d in docs.iterrows():
        ws = _words(d.text)
        r = got[d.doc_id]
        if len(ws) < 2:
            continue
        pairs = list(zip(ws, ws[1:]))
        assert r.n_bigrams == len(pairs)
        x = sum(round(-math.log2(big[p] / uni[p[0]]), 6) for p in pairs) / len(pairs)
        assert abs(r.bigram_bits_per_token - x) <= TOL, d.doc_id
        checked += 1
    assert checked > 100


def test_source_divergence_float_recompute(spark):
    docs = _docs()
    per_src: dict[str, Counter] = defaultdict(Counter)
    for _, d in docs.iterrows():
        per_src[d.source].update(_words(d.text))
    pool: Counter = Counter()
    for c in per_src.values():
        pool.update(c)
    n_total = sum(pool.values())
    got = {r.source: r for r in _run(spark, "t_source_divergence")}
    for src, c in per_src.items():
        ns = sum(c.values())
        r = got[src]
        assert r.n_tokens == ns
        x = (
            sum(
                round(csw * math.log2((csw * n_total) / (ns * pool[w])), 6)
                for w, csw in c.items()
            )
            / ns
        )
        assert abs(r.kl_bits - max(x, 0.0)) <= TOL, src


def test_char_entropy_float_recompute(spark):
    docs = _docs()
    got = {r.doc_id: r for r in _run(spark, "t_char_entropy")}
    for _, d in docs.iterrows():
        t = d.text.replace(" ", "")
        r = got[d.doc_id]
        assert r.n_chars_nospace == len(t)
        if t:
            cnt = Counter(t)
            n = len(t)
            x = sum(round(cc * math.log2(n / cc), 6) for cc in cnt.values()) / n
            assert abs(r.char_entropy_bits - max(x, 0.0)) <= TOL, d.doc_id


def _lexicon_predictions(docs):
    from nt_data_pipelines_spark.operators.text import STOPWORD_LEXICON

    by_word: dict[str, list[str]] = defaultdict(list)
    for lang, ws in STOPWORD_LEXICON.items():
        for w in ws:
            by_word[w].append(lang)
    preds = {}
    for _, d in docs.iterrows():
        hits: Counter = Counter()
        for w in _words(d.text):
            for lang in by_word.get(w, ()):
                hits[lang] += 1
        preds[d.doc_id] = (
            min(hits, key=lambda l: (-hits[l], l)) if hits else "und"
        )
    return preds


def test_source_lang_mi_float_recompute(spark):
    docs = _docs()
    preds = _lexicon_predictions(docs)
    cells: Counter = Counter()
    for _, d in docs.iterrows():
        cells[(d.source, preds[d.doc_id])] += 1
    n = sum(cells.values())
    ns: Counter = Counter()
    nl: Counter = Counter()
    for (s, l), c in cells.items():
        ns[s] += c
        nl[l] += c
    x = (
        sum(
            round(c * math.log2((c * n) / (ns[s] * nl[l])), 6)
            for (s, l), c in cells.items()
        )
        / n
    )
    (r,) = _run(spark, "a_source_lang_mi")
    assert r.n_docs == n and r.n_cells == len(cells)
    assert abs(r.mi_bits - max(x, 0.0)) <= TOL


def test_lang_confusion_recompute(spark):
    docs = _docs()
    preds = _lexicon_predictions(docs)
    cm: Counter = Counter()
    for _, d in docs.iterrows():
        cm[(d.lang, preds[d.doc_id])] += 1
    row_tot: Counter = Counter()
    for (t, _), c in cm.items():
        row_tot[t] += c
    got = {(r.true_lang, r.pred_lang): r for r in _run(spark, "a_lang_confusion")}
    assert set(got) == set(cm)
    for key, c in cm.items():
        r = got[key]
        assert r.n_docs == c
        assert abs(r.row_share - c / row_tot[key[0]]) <= TOL, key


# -------------------------------------------------------------- text ratios


def _doc_grams(text, n=3):
    ws = text.split(" ")
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def test_contamination_set_recompute(spark):
    docs = _docs()
    bench_grams = set()
    for t in docs[docs.source == "src0"].text:
        bench_grams |= _doc_grams(t)
    got = {r.doc_id: r for r in _run(spark, "t_contamination")}
    corpus = docs[docs.source != "src0"]
    assert set(got) == set(corpus.doc_id)
    for _, d in corpus.iterrows():
        g = _doc_grams(d.text)
        hit = len(g & bench_grams)
        r = got[d.doc_id]
        assert r.n_grams == len(g) and r.n_contaminated == hit
        if len(g):
            assert abs(r.overlap_ratio - hit / len(g)) <= TOL, d.doc_id
    # bloom variant: 2-grams against the src1 slice, same arithmetic
    bench2 = set()
    for t in docs[docs.source == "src1"].text:
        bench2 |= _doc_grams(t, n=2)
    bloom = {r.doc_id: r for r in _run(spark, "t_bloom_decontaminate")}
    corpus2 = docs[docs.source != "src1"]
    assert set(bloom) == set(corpus2.doc_id)
    for _, d in corpus2.iterrows():
        g = _doc_grams(d.text, n=2)
        hit = len(g & bench2)
        b = bloom[d.doc_id]
        assert b.n_grams == len(g) and b.n_contaminated == hit
        if len(g):
            assert abs(b.overlap_ratio - hit / len(g)) <= TOL, d.doc_id


def test_repetition_stats_float_recompute(spark):
    docs = _docs()
    got = {r.doc_id: r for r in _run(spark, "t_repetition_stats")}
    for _, d in docs.iterrows():
        ws = d.text.split(" ")
        r = got[d.doc_id]
        n = len(ws)
        assert r.n_words == n
        assert abs(r.dup_word_ratio - (n - len(set(ws))) / n) <= TOL
        assert abs(r.top_word_ratio - Counter(ws).most_common(1)[0][1] / n) <= TOL
        tb = n - 1
        if tb > 0:
            db = len({(ws[i], ws[i + 1]) for i in range(tb)})
            assert abs(r.dup_bigram_ratio - (tb - db) / tb) <= TOL


def test_lexical_diversity_float_recompute(spark):
    docs = _docs()
    got = {r.doc_id: r for r in _run(spark, "t_lexical_diversity")}
    for _, d in docs.iterrows():
        ws = _words(d.text)
        c = Counter(ws)
        r = got[d.doc_id]
        assert (r.n_tokens, r.n_types) == (len(ws), len(c))
        if ws:
            assert abs(r.ttr - len(c) / len(ws)) <= TOL
            hapax = sum(1 for v in c.values() if v == 1)
            assert abs(r.hapax_frac - hapax / len(c)) <= TOL


def test_gopher_rules_float_recompute(spark):
    docs = _docs()
    got = {r.doc_id: r for r in _run(spark, "t_gopher_rules")}
    stop = ["the", "a", "of", "and", "to", "in", "is", "it", "you", "that"]
    for _, d in docs.iterrows():
        ws = d.text.split(" ")
        ls = d.text.split("\n")
        r = got[d.doc_id]
        n = len(ws)
        assert r.n_words == n
        assert abs(r.mean_word_len - sum(len(w) for w in ws) / n) <= TOL
        sym = 3 * d.text.count("#") + d.text.count("...")
        assert abs(r.symbol_word_ratio - sym / (3 * n)) <= TOL
        bullets = sum(1 for x in ls if re.match(r"^[-*•]", x))
        assert abs(r.bullet_line_frac - bullets / len(ls)) <= TOL
        ell = sum(1 for x in ls if re.search(r"\.\.\.$", x))
        assert abs(r.ellipsis_line_frac - ell / len(ls)) <= TOL
        alpha = sum(1 for w in ws if re.search(r"[A-Za-z]", w))
        assert abs(r.alpha_word_frac - alpha / n) <= TOL
        hits = sum(1 for s in stop if s in ws)
        assert r.stop_hits == hits
        keep = int(
            30 <= n <= 90
            and 3.0 <= r.mean_word_len <= 10.0
            and r.symbol_word_ratio <= 0.1
            and r.bullet_line_frac <= 0.9
            and r.ellipsis_line_frac <= 0.3
            and r.alpha_word_frac >= 0.8
            and hits >= 2
        )
        assert r.keep == keep


def test_corpus_report_float_recompute(spark):
    docs = _docs()
    got = {(r.source, r.lang): r for r in _run(spark, "a_corpus_report")}
    grouped = docs.groupby(["source", "lang"])
    assert set(got) == set(grouped.groups)
    for key, g in grouped:
        toks = [len(re.findall(TOKEN_REGEX, t)) for t in g.text]
        short = sum(1 for t in g.text if len(t.split(" ")) < 50)
        r = got[key]
        assert (r.n_docs, r.n_tokens) == (len(g), sum(toks))
        assert abs(r.mean_tokens - sum(toks) / len(g)) <= TOL
        assert abs(r.short_doc_frac - short / len(g)) <= TOL


# ------------------------------------------------------ set-similarity family


def test_ngram_jaccard_set_recompute(spark):
    docs = _docs()
    sets = {d.doc_id: set(_words(d.text)) for _, d in docs.iterrows()}
    # python truth: all pairs >= 0.8 word-set jaccard
    ids = sorted(sets)
    truth = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            union = len(sets[a] | sets[b])
            if inter / union >= 0.8:
                truth[(a, b)] = inter / union
    got = {(r.id_a, r.id_b): r.jaccard for r in _run(spark, "d_ngram_jaccard")}
    assert set(got) == set(truth)
    for k, v in truth.items():
        assert abs(got[k] - v) <= TOL, k


def test_source_vocab_jaccard_set_recompute(spark):
    docs = _docs()
    vocab: dict[str, set] = defaultdict(set)
    for _, d in docs.iterrows():
        vocab[d.source] |= set(_words(d.text))
    srcs = sorted(vocab)
    got = {
        (r.source_a, r.source_b): r for r in _run(spark, "a_source_vocab_jaccard")
    }
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                assert (a, b) not in got
                continue
            union = len(vocab[a] | vocab[b])
            r = got[(a, b)]
            assert (r.intersection_size, r.union_size) == (inter, union)
            assert abs(r.jaccard - inter / union) <= TOL


# ------------------------------------------------------------- events family


def test_funnel_conversion_recompute(spark):
    ev = _events().sort_values("ts")
    reach = {}
    cur = ev[ev.event_type == "view"].groupby("user_id").ts.min()
    reach[1] = cur
    for step, et in ((2, "click"), (3, "purchase")):
        prev = cur
        e = ev[ev.event_type == et].merge(
            prev.rename("t0"), left_on="user_id", right_index=True
        )
        cur = e[e.ts > e.t0].groupby("user_id").ts.min()
        reach[step] = cur
    first = len(reach[1])
    got = {r.step: r for r in _run(spark, "a_funnel_conversion")}
    for step in (1, 2, 3):
        r = got[step]
        assert r.n_users == len(reach[step])
        assert abs(r.conversion - len(reach[step]) / first) <= TOL


def test_last_touch_attribution_recompute(spark):
    ev = _events()
    ev = ev[ev.user_id.notna()]
    clicks = ev[ev.event_type == "click"]
    purch = ev[ev.event_type == "purchase"]
    attributed = 0
    for _, p in purch.iterrows():
        c = clicks[
            (clicks.user_id == p.user_id)
            & (clicks.ts <= p.ts)
            & ((p.ts - clicks.ts).dt.total_seconds() <= 3600.0)
        ]
        if len(c):
            attributed += 1
    (r,) = _run(spark, "a_last_touch_attribution")
    assert (r.n_purchases, r.n_attributed) == (len(purch), attributed)
    assert abs(r.attribution_rate - attributed / len(purch)) <= TOL


def test_event_burstiness_float_recompute(spark):
    ev = _events()
    got = {r.event_type: r for r in _run(spark, "a_event_burstiness")}
    for et, g in ev.groupby("event_type"):
        counts = g.ts.dt.floor("min").value_counts()
        n, tot = len(counts), int(counts.sum())
        if n < 2:
            assert et not in got
            continue
        sxx = int((counts.astype("int64") ** 2).sum())
        fano = (n * sxx - tot * tot) / ((n - 1) * tot)
        r = got[et]
        assert (r.n_buckets, r.total_events) == (n, tot)
        assert abs(r.fano - fano) <= TOL, et


def test_diurnal_profile_recompute(spark):
    ev = _events()
    got = {(r.event_type, r.hour_of_day): r for r in _run(spark, "a_diurnal_profile")}
    cells = ev.groupby(["event_type", ev.ts.dt.hour]).size()
    totals = ev.groupby("event_type").size()
    assert set(got) == set(cells.index)
    for (et, h), n in cells.items():
        r = got[(et, h)]
        assert r.n_events == n
        assert abs(r.share - n / totals[et]) <= TOL


def test_composition_turnover_float_recompute(spark):
    ev = _events()
    cells = ev.groupby([ev.ts.dt.date, "event_type"]).size().unstack(fill_value=0)
    days = list(cells.index)
    got = {r.day: r.turnover for r in _run(spark, "a_composition_turnover")}
    assert set(got) == set(days[1:])
    for prev, day in zip(days, days[1:]):
        p = cells.loc[prev] / cells.loc[prev].sum()
        q = cells.loc[day] / cells.loc[day].sum()
        x = float((q - p).abs().sum()) / 2.0
        assert abs(got[day] - x) <= TOL, day


def test_join_key_skew_recompute(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    mult = li.groupby("l_orderkey").size().sort_values()
    n_keys, n_rows, mx = len(mult), int(mult.sum()), int(mult.max())
    vals = sorted(mult.values)

    def pctl(p):
        cum = 0
        counts = Counter(vals)
        for v in sorted(counts):
            cum += counts[v]
            if 100 * cum >= p * n_keys:
                return v
        raise AssertionError

    (r,) = _run(spark, "a_join_key_skew")
    assert (r.n_keys, r.n_rows, r.max_mult) == (n_keys, n_rows, mx)
    assert (r.p50_mult, r.p90_mult, r.p99_mult) == (pctl(50), pctl(90), pctl(99))
    assert abs(r.max_key_share - mx / n_rows) <= TOL


# --------------------------------------------------------- embeddings family


def test_explode_embeddings_numpy_recompute(spark):
    import numpy as np

    emb = _emb()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    got = {r.dim: r for r in _run(spark, "r4_explode_embeddings")}
    for dim in range(mat.shape[1]):
        r = got[dim]
        assert r.n == mat.shape[0]
        assert abs(r.total - float(mat[:, dim].sum())) <= TOL, dim


def test_centroid_numpy_recompute(spark):
    import numpy as np

    emb = _emb()
    got = {(r.label, r.dim): r for r in _run(spark, "s_centroid_per_label")}
    for label, g in emb.groupby("label"):
        mat = np.array([np.asarray(v, dtype=np.float64) for v in g.embedding])
        for dim in range(mat.shape[1]):
            r = got[(label, dim)]
            assert r.n == mat.shape[0]
            assert abs(r.centroid - float(mat[:, dim].mean())) <= TOL


def test_hybrid_rrf_float_recompute(spark):
    import numpy as np

    from nt_data_pipelines_spark.plans.extra9 import _FUSE_TOPN, _RRF_K, _RRF_TERMS

    docs = _docs()
    emb = _emb()
    # BM25 (k1=1.2, b=0.75) over the query terms, per-term round-6
    dls = {d.doc_id: len(d.text.split(" ")) for _, d in docs.iterrows()}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    tfs: dict[int, dict[str, int]] = defaultdict(dict)
    for _, d in docs.iterrows():
        c = Counter(w for w in d.text.split(" ") if w in _RRF_TERMS)
        for w, tf in c.items():
            tfs[d.doc_id][w] = tf
    dft = Counter(w for per in tfs.values() for w in per)
    bm = {}
    for doc_id, per in tfs.items():
        s = 0.0
        for w, tf in per.items():
            idf = math.log((n_docs - dft[w] + 0.5) / (dft[w] + 0.5) + 1)
            dl = dls[doc_id]
            s += round(
                idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6
            )
        bm[doc_id] = s
    bm_rank = {
        d: i + 1
        for i, d in enumerate(
            sorted(bm, key=lambda d: (-bm[d], d))[:_FUSE_TOPN]
        )
    }
    # cosine ranks of vec 0 against the rest
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for _, r in emb.iterrows()
    }
    q = vecs[0]
    cos = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for vid, v in vecs.items()
        if vid != 0
    }
    cos_rank = {
        d: i + 1
        for i, d in enumerate(
            sorted(cos, key=lambda d: (-round(cos[d], 6), d))[:_FUSE_TOPN]
        )
    }
    rrf: dict[int, float] = defaultdict(float)
    for d, rk in bm_rank.items():
        rrf[d] += 1.0 / (_RRF_K + rk)
    for d, rk in cos_rank.items():
        rrf[d] += 1.0 / (_RRF_K + rk)
    top10 = sorted(rrf, key=lambda d: (-round(rrf[d], 6), d))[:10]
    got = _run(spark, "s_hybrid_rrf")
    assert [r.doc_id for r in got] == top10
    for r in got:
        assert abs(r.rrf_score - rrf[r.doc_id]) <= TOL


# ------------------------------------------------- concentration / coverage


def test_token_concentration_recompute(spark):
    docs = _docs()
    got = {r.source: r for r in _run(spark, "a_token_concentration")}
    for src, g in docs.groupby("source"):
        toks = sorted(
            (len(re.findall(TOKEN_REGEX, t)) for t in g.text), reverse=True
        )
        total = sum(toks)
        half_thresh = (total + 1) // 2
        cum = n_half = 0
        for t in toks:
            cum += t
            n_half += 1
            if cum >= half_thresh:
                break
        n_top = (len(toks) + 9) // 10
        top_toks = sum(toks[:n_top])
        r = got[src]
        assert (r.n_docs, r.total_tokens) == (len(toks), total)
        assert r.n_docs_half_tokens == n_half
        assert abs(r.half_docs_frac - n_half / len(toks)) <= TOL
        assert abs(r.top_decile_token_share - top_toks / total) <= TOL


def test_vocab_coverage_recompute(spark):
    docs = _docs()
    wc: Counter = Counter()
    for t in docs.text:
        wc.update(_words(t))
    total = sum(wc.values())
    ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {r.k: r for r in _run(spark, "a_vocab_coverage")}
    for k in (10, 100, 1000):
        covered = sum(c for _, c in ranked[:k])
        r = got[k]
        assert (r.covered_tokens, r.total_tokens) == (covered, total)
        assert abs(r.coverage - covered / total) <= TOL


def test_token_fertility_consistency(spark):
    # the BPE encoder itself is pinned against a pure-python reference
    # in tests/test_bpe.py; here the query-level RATIO columns must
    # agree with their own integer numerator/denominator columns in
    # plain float arithmetic (the VWAP failure mode: a stray factor in
    # the ratio that mirrored SQL reproduces)
    docs = _docs()
    n_chars = {
        src: sum(len(w) for t in g.text for w in _words(t))
        for src, g in docs.groupby("source")
    }
    for r in _run(spark, "t_token_fertility"):
        assert abs(r.tokens_per_word - r.n_bpe_tokens / r.n_words) <= TOL
        assert abs(r.chars_per_token - n_chars[r.source] / r.n_bpe_tokens) <= TOL


def test_quantile_transform_recompute(spark):
    ev = _events()
    got = {r.event_id: r for r in _run(spark, "p_quantile_transform")}
    for _, g in ev.groupby("event_type"):
        g = g.sort_values(["value", "event_id"]).reset_index()
        n = len(g)
        for i, row in g.iterrows():
            want = 0.0 if n == 1 else i / (n - 1)
            assert abs(got[row.event_id].q - want) <= TOL, row.event_id


# ------------------------------------------------------------- graph family


def test_pagerank_knn_float_recompute(spark):
    """Plain-float textbook PageRank over the same edge set.

    The edge STRUCTURE is pinned independently (s_knn_graph has a full
    SQL oracle plus recall/plan-shape tests), so the audit target here
    is the rank recurrence: the registered query's integer micro-rank
    arithmetic must agree with r = (1-d)/N + d*(sum in r/out + dang/N)
    computed in ordinary python floats with no grids, no flooring, no
    DIV. Tolerance: each of the 3 iterations half-ups node ranks to
    the 1e-6 grid and the error propagates through in-degrees (~2x
    out-degree here), so grid noise can reach a few micro — asserted
    at 1e-5 absolute, which a swapped denominator or stray factor
    still misses by orders of magnitude.
    """
    from nt_data_pipelines_spark.operators.similarity import knn_graph
    from nt_data_pipelines_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings")
    edges = [
        (r.src_id, r.dst_id)
        for r in knn_graph(
            emb, "vec_id", "embedding", k=3, num_planes=6, dim=64, bucket_cap=None
        )
        .select("src_id", "dst_id")
        .collect()
    ]
    assert len(edges) > 100
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    out = Counter(s for s, _ in edges)
    rank = dict.fromkeys(nodes, 1.0 / n)
    d = 0.85
    for _ in range(3):
        dang = sum(rank[x] for x in nodes if out.get(x, 0) == 0)
        acc = defaultdict(float)
        for s, t in edges:
            acc[t] += rank[s] / out[s]
        rank = {x: (1 - d) / n + d * (acc[x] + dang / n) for x in nodes}
    got = {row.node: row.rank for row in _run(spark, "g_pagerank_knn")}
    assert set(got) == set(nodes)
    for x in nodes:
        assert abs(got[x] - rank[x]) <= 1e-5, x
    # total mass stays 1 up to the micro grid
    assert abs(sum(got.values()) - 1.0) <= n * 1e-6
