"""Property tests: the r5 pipeline operators vs pure-Python references.

Random corpora through the DISTRIBUTED implementations must equal a
20-line single-process reference — the same adversarial-oracle strategy
the DuckDB battery uses, but over hypothesis-generated inputs that hit
edge shapes the fixed tables never do (single-token docs, all-duplicate
docs, empty overlap, duplicate quantile boundaries).
"""

import math
import re
from collections import Counter
from hashlib import md5

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["a", "b", "c", "dd", "ee", "fff", "gg", "quick"]
DOC = st.lists(st.sampled_from(WORDS), min_size=1, max_size=25).map(" ".join)


def _f6(num: int, den: int) -> float:
    return math.floor(num / den * 1000000) / 1000000 if den > 0 else 0.0


def _ref_repetition(text: str):
    toks = re.split(r"\s+", text.lower())
    n = len(toks)
    c = Counter(toks)
    bigrams = [" ".join(toks[i : i + 2]) for i in range(n - 1)]
    cb = Counter(bigrams)
    dup = sum(v for v in cb.values() if v > 1)
    utr, mtf, dbf = _f6(len(c), n), _f6(max(c.values()), n), _f6(dup, len(bigrams))
    return (n, utr, mtf, dbf, mtf > 0.20 or dbf > 0.15)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(DOC, min_size=1, max_size=12))
def test_repetition_signals_match_reference(spark, texts):
    from spark_sql_on_hbase_spark.operators.text_analysis import repetition_signals

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tokens, r.unique_token_ratio, r.max_token_frac,
                   r.dup_2gram_frac, r.repetitive)
        for r in repetition_signals(df).collect()
    }
    want = {i: _ref_repetition(t) for i, t in enumerate(texts)}
    assert got == want


def _ref_grams(text: str, n: int) -> set:
    toks = re.split(r"\s+", text.lower())
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(DOC, min_size=1, max_size=10), st.lists(DOC, min_size=0, max_size=4))
def test_contamination_flags_match_reference(spark, corpus_texts, bench_texts):
    from spark_sql_on_hbase_spark.operators.decontam import contamination_flags

    n = 3
    corpus = spark.createDataFrame(list(enumerate(corpus_texts)), ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench_texts)] or [(1000, "")],
        ["doc_id", "text"],
    )
    bset = set().union(*(_ref_grams(t, n) for t in bench_texts)) if bench_texts else set()
    got = {
        r.doc_id: (r.n_grams, r.n_hits, r.hit_ratio, r.contaminated)
        for r in contamination_flags(corpus, bench, n=n).collect()
    }
    want = {}
    for i, t in enumerate(corpus_texts):
        grams = _ref_grams(t, n)
        hits = len(grams & bset)
        want[i] = (len(grams), hits, _f6(hits, len(grams)), hits > 0)
    assert got == want


def _hash60(s: str) -> int:
    return int(md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(0, 10**9), unique=True, min_size=1, max_size=80),
       st.integers(0, 3))
def test_global_shuffle_matches_reference(spark, ids, seed):
    from spark_sql_on_hbase_spark.operators.sharding import global_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.shuffle_rank for r in global_shuffle(df, "doc_id", seed=seed).collect()}
    order = sorted(ids, key=lambda i: (_hash60(f"{seed}\x1f{i}"), i))
    want = {i: rank for rank, i in enumerate(order)}
    assert got == want


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(DOC, min_size=1, max_size=10), st.integers(1, 12),
       st.sampled_from(["head", "head_tail"]))
def test_truncate_tokens_matches_reference(spark, texts, budget, mode):
    from spark_sql_on_hbase_spark.operators.text_analysis import truncate_tokens

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r.doc_id: (r.trunc_text, r.n_tokens, r.truncated)
           for r in truncate_tokens(df, budget, mode=mode).collect()}
    want = {}
    for i, t in enumerate(texts):
        toks = re.split(r"\s+", t.lower())
        if len(toks) <= budget:
            kept = toks
        elif mode == "head":
            kept = toks[:budget]
        else:
            h, tl = (budget + 1) // 2, budget // 2
            kept = toks[:h] + toks[len(toks) - tl:]
        want[i] = (" ".join(kept), len(toks), len(toks) > budget)
    assert got == want


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(DOC, min_size=1, max_size=12), st.integers(2, 4))
def test_boilerplate_strip_matches_reference(spark, texts, min_df):
    from spark_sql_on_hbase_spark.operators.text_analysis import (
        boilerplate_segments,
        strip_boilerplate,
    )

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    bp = boilerplate_segments(df, min_df=min_df)
    got = {r.doc_id: (r.clean_text, r.n_removed)
           for r in strip_boilerplate(df, bp).collect()}
    seg_docs = {}
    for i, t in enumerate(texts):
        for seg in set(s for s in re.split(r"\s+", t.lower()) if s):
            seg_docs.setdefault(seg, set()).add(i)
    bset = {s for s, d in seg_docs.items() if len(d) >= min_df}
    want = {}
    for i, t in enumerate(texts):
        segs = [s for s in re.split(r"\s+", t.lower()) if s]
        kept = [s for s in segs if s not in bset]
        want[i] = (" ".join(kept), len(segs) - len(kept))
    assert got == want


def test_invalidate_tables_drops_cached_plans(spark, tmp_path):
    """In-place regeneration of inputs needs an explicit invalidation —
    load_tables pins per-dir plans for the session lifetime (the
    documented immutability contract)."""
    import shutil

    from spark_sql_on_hbase_spark.tables import invalidate_tables, load_tables

    d = tmp_path / "sfX"
    shutil.copytree("/root/testdata/sf0.001", d)
    t1 = load_tables(spark, str(d))
    assert t1["region"].count() > 0
    assert load_tables(spark, str(d))["region"] is t1["region"]  # cached
    invalidate_tables(spark, str(d))
    t2 = load_tables(spark, str(d))
    assert t2["region"] is not t1["region"]  # fresh plan after invalidation


def _ref_jaccard_pairs(texts: list[str], n: int, t: float):
    """Brute-force exact n-gram Jaccard over ALL pairs — the reference
    the prefix-filtered distributed implementation must equal."""
    import itertools

    def shingles(s: str) -> set[str]:
        toks = re.split(r"\s+", s.lower())
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: shingles(s) for i, s in enumerate(texts)}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter == 0:
            continue
        j = round(inter / (len(sa) + len(sb) - inter), 4)
        if j >= t:
            out[(a, b)] = j
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(WORDS[:5]), min_size=1, max_size=12).map(" ".join),
        min_size=2,
        max_size=14,
    ),
    st.sampled_from([0.3, 0.5, 0.8, 1.0]),
)
@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_ngram_jaccard_prefix_filter_is_exact(spark, texts, threshold):
    """The AllPairs/PPJoin prefix filter (r6 rewrite) must lose NO
    qualifying pair and invent none — fuzzed against brute-force
    all-pairs Jaccard, across thresholds (prefix length ⌊(1-t)n⌋+1 has
    a classic off-by-one failure mode this pins down).  The tiny
    5-word vocabulary forces heavy shingle sharing — the adversarial
    case for candidate generation."""
    from spark_sql_on_hbase_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, shingle_n=3, threshold=threshold).collect()
    }
    want = _ref_jaccard_pairs(texts, 3, threshold)
    assert got == want, (sorted(set(want) - set(got)), sorted(set(got) - set(want)))


# --- duplicated_spans (exact-substring dedup, k-gram reformulation) --------
def _ref_dupspans(texts, k, min_docs=2):
    toks = [re.split(r"\s+", t.lower()) for t in texts]
    owners: dict[str, set] = {}
    per_doc = []
    for d, ts in enumerate(toks):
        gs = [" ".join(ts[i : i + k]) for i in range(len(ts) - k + 1)]
        per_doc.append(gs)
        for g in set(gs):
            owners.setdefault(g, set()).add(d)
    out = set()
    for d, gs in enumerate(per_doc):
        ps = [i + 1 for i, g in enumerate(gs) if len(owners[g]) >= min_docs]
        start = prev = None
        for p in ps:
            if prev is not None and p - prev > k:
                out.add((d, start, prev + k - 1, prev + k - start))
                start = p
            elif prev is None:
                start = p
            prev = p
        if start is not None:
            out.add((d, start, prev + k - 1, prev + k - start))
    return out


def test_duplicated_spans_known_corpus(spark):
    """Hand-checkable shapes: a shared run spans both docs; a WITHIN-doc
    repeat alone never marks; disjoint shared runs yield two islands;
    sub-k docs are ignored."""
    from spark_sql_on_hbase_spark.operators.text_analysis import duplicated_spans

    shared = "w x y z q r"          # 6 tokens, shared verbatim by docs 0 and 1
    docs = [
        (0, "a1 a2 " + shared + " a3 a4"),          # span at tokens 3..8
        (1, shared + " b1 b2 b3 " + shared),        # two islands: 1..6 and 10..15
        (2, "c1 c2 c3 c1 c2 c3 c1 c2 c3 c4"),       # within-doc repeats only
        (3, "w x"),                                  # shorter than k
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, k=4, min_docs=2).collect()
    }
    assert got == {(0, 3, 8, 6), (1, 1, 6, 6), (1, 10, 15, 6)}


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(DOC, min_size=2, max_size=10))
def test_duplicated_spans_match_reference(spark, texts):
    from spark_sql_on_hbase_spark.operators.text_analysis import duplicated_spans

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, k=3, min_docs=2).collect()
    }
    assert got == _ref_dupspans(texts, k=3)


def _ref_strip(texts, k, min_docs=2):
    spans = _ref_dupspans(texts, k, min_docs)
    out = {}
    for d, t in enumerate(texts):
        toks = re.split(r"\s+", t.lower())
        rm = set()
        for sd, a, b, _ in spans:
            if sd == d:
                rm.update(range(a, b + 1))
        out[d] = (" ".join(tok for i, tok in enumerate(toks, 1) if i not in rm), len(rm))
    return out


def test_strip_spans_known_corpus(spark):
    """Doc 1's TAIL is stripped (the max(kept pos) trap); doc 2/3 pass
    through untouched with n_removed = 0."""
    from spark_sql_on_hbase_spark.operators.text_analysis import (
        duplicated_spans,
        strip_spans,
    )

    shared = "w x y z q r"
    docs = [
        (0, "a1 a2 " + shared + " a3 a4"),
        (1, shared + " b1 b2 b3 " + shared),
        (2, "c1 c2 c3 c1 c2 c3 c1 c2 c3 c4"),
        (3, "w x"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in strip_spans(df, duplicated_spans(df, k=4, min_docs=2)).collect()
    }
    assert got == {
        0: ("a1 a2 a3 a4", 6),
        1: ("b1 b2 b3", 12),
        2: ("c1 c2 c3 c1 c2 c3 c1 c2 c3 c4", 0),
        3: ("w x", 0),
    }


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(DOC, min_size=2, max_size=8))
def test_strip_spans_match_reference(spark, texts):
    from spark_sql_on_hbase_spark.operators.text_analysis import (
        duplicated_spans,
        strip_spans,
    )

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in strip_spans(df, duplicated_spans(df, k=3, min_docs=2)).collect()
    }
    assert got == _ref_strip(texts, k=3)


def test_duplicated_spans_self_repeats(spark):
    """self_repeats=True flags within-doc repeats (full Lee et al.
    criterion); default mode still requires cross-doc sharing."""
    from spark_sql_on_hbase_spark.operators.text_analysis import duplicated_spans

    docs = [(0, "p q r s p q r s x y"), (1, "u1 u2 u3 u4 u5 u6")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    assert duplicated_spans(df, k=4, min_docs=2).count() == 0
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, k=4, min_docs=2, self_repeats=True).collect()
    }
    # "p q r s" at 1..4 and 5..8: both 4-gram windows repeat, and the
    # overlap-merge fuses them into one 1..8 island
    assert got == {(0, 1, 8)}


def test_strip_spans_overlapping_user_spans(spark):
    """User-provided span lists may overlap or duplicate — positions
    dedup through the explode-distinct, never double-count n_removed."""
    from spark_sql_on_hbase_spark.operators.text_analysis import strip_spans

    docs = spark.createDataFrame([(0, "a b c d e f g h")], ["doc_id", "text"])
    spans = spark.createDataFrame(
        [(0, 2, 5), (0, 4, 6), (0, 2, 5)], ["doc_id", "span_start", "span_end"]
    )
    r = strip_spans(docs, spans).collect()[0]
    assert (r.clean_text, r.n_removed) == ("a g h", 5)


def _ref_dupspans_self(texts, k):
    toks = [re.split(r"\s+", t.lower()) for t in texts]
    owners: dict[str, set] = {}
    occ: dict[str, int] = {}
    per_doc = []
    for d, ts in enumerate(toks):
        gs = [" ".join(ts[i : i + k]) for i in range(len(ts) - k + 1)]
        per_doc.append(gs)
        for g in gs:
            occ[g] = occ.get(g, 0) + 1
            owners.setdefault(g, set()).add(d)
    out = set()
    for d, gs in enumerate(per_doc):
        ps = [i + 1 for i, g in enumerate(gs) if len(owners[g]) >= 2 or occ[g] >= 2]
        start = prev = None
        for p in ps:
            if prev is not None and p - prev > k:
                out.add((d, start, prev + k - 1, prev + k - start))
                start = p
            elif prev is None:
                start = p
            prev = p
        if start is not None:
            out.add((d, start, prev + k - 1, prev + k - start))
    return out


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(DOC, min_size=1, max_size=8))
def test_duplicated_spans_self_repeats_match_reference(spark, texts):
    from spark_sql_on_hbase_spark.operators.text_analysis import duplicated_spans

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, k=3, min_docs=2, self_repeats=True).collect()
    }
    assert got == _ref_dupspans_self(texts, k=3)


def test_dupspan_stats_known_corpus(spark):
    """A doc that is mostly one shared run crosses the drop threshold;
    partially-duplicated and clean docs do not; NULL text is (0,0,0.0)."""
    from spark_sql_on_hbase_spark.operators.text_analysis import dupspan_stats

    shared = "w x y z q r"  # 6 tokens shared by docs 0 and 1
    docs = [
        (0, shared + " t1 t2"),            # 6/8 = 0.75 dup → drop
        (1, "a1 a2 a3 " + shared + " a4 a5 a6"),  # 6/12 = 0.5 → NOT drop (strict >)
        (2, "c1 c2 c3 c4"),                # clean
        (3, None),                          # NULL text
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_frac, r.drop)
        for r in dupspan_stats(df, k=4, min_docs=2, drop_threshold=0.5).collect()
    }
    assert got == {
        0: (8, 6, 0.75, True),
        1: (12, 6, 0.5, False),
        2: (4, 0, 0.0, False),
        3: (0, 0, 0.0, False),
    }
