"""Exact substring duplicate detection (winnowing + byte verify).

Every test pins the operator against a from-scratch python brute force
(set-of-substrings intersection), so the winnowing guarantee, the lcp
edge cases, and the keep-first component semantics are all checked
independently of the Spark expressions they exercise.
"""

import random

import pytest
from pyspark.sql import functions as F

from dataflow_spark.core.operator import BudgetExceededError
from dataflow_spark.operators.filters.substring import (
    SubstringDeduplicateFilter, SubstringDuplicateCutRefiner,
    SubstringDuplicatePairs, _lcp,
)


def _brute_pairs(texts: dict, min_length: int):
    """All (a, b, longest shared substring >= min_length) by brute force."""
    out = {}
    ids = sorted(texts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ta, tb = texts[a], texts[b]
            n = min_length
            best = 0
            while n <= min(len(ta), len(tb)):
                sa = {ta[i:i + n] for i in range(len(ta) - n + 1)}
                if any(tb[i:i + n] in sa for i in range(len(tb) - n + 1)):
                    best = n
                    n += 1
                else:
                    break
            if best:
                out[(a, b)] = best
    return out


def _run_pairs(spark, texts: dict, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"])
    rows = SubstringDuplicatePairs(**kw).run(df).collect()
    return {(r.doc_a, r.doc_b): r.match_len for r in rows}


def test_planted_shared_passage_detected_exactly(spark):
    rng = random.Random(7)
    alpha = "abcdefghij "
    mk = lambda n: "".join(rng.choice(alpha) for _ in range(n))
    passage = "the quick brown fox jumps over the lazy dog!"  # 44 chars
    texts = {
        0: mk(80) + passage + mk(60),          # middle
        1: passage + mk(100),                   # at start (pos 1 lcp edge)
        2: mk(120) + passage,                   # at end (suffix lcp edge)
        3: mk(200),                              # unrelated
        4: passage,                              # exactly the passage
    }
    got = _run_pairs(spark, texts, min_length=40)
    exp = _brute_pairs(texts, 40)
    assert got == exp
    assert (0, 1) in got and got[(0, 1)] >= 44


def test_threshold_boundary_39_vs_40(spark):
    shared39 = "x" * 20 + "y" * 19          # 39 chars
    shared40 = shared39 + "z"               # 40 chars
    rng = random.Random(3)
    pad = lambda: "".join(rng.choice("qrstuv ") for _ in range(60))
    texts = {
        0: pad() + shared39 + pad(),
        1: pad() + shared39 + pad(),
        2: pad() + shared40 + pad(),
        3: pad() + shared40 + pad(),
    }
    got = _run_pairs(spark, texts, min_length=40)
    exp = _brute_pairs(texts, 40)
    assert got == exp
    assert (2, 3) in got and got[(2, 3)] >= 40
    # 39-char sharing must NOT pair 0-1 unless the random pads collide
    assert ((0, 1) in got) == ((0, 1) in exp)


def test_random_corpus_matches_brute(spark):
    """Property-style: random word-salad corpus with randomly planted
    shared passages at random offsets; pair set AND max lengths must
    equal brute force exactly."""
    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    mk = lambda n: " ".join(rng.choice(words) for _ in range(n))
    passages = [mk(12), mk(15), mk(9)]
    texts = {}
    for i in range(30):
        body = mk(rng.randint(20, 60))
        if rng.random() < 0.5:
            p = rng.choice(passages)
            cut = rng.randint(0, len(body))
            body = body[:cut] + " " + p + " " + body[cut:]
        texts[i] = body
    got = _run_pairs(spark, texts, min_length=40)
    exp = _brute_pairs(texts, 40)
    assert got == exp


def test_multibyte_characters_use_char_semantics(spark):
    # 40 CHARS of multibyte text (would be 120+ bytes in utf-8)
    passage = "é世界" * 14  # 42 chars
    rng = random.Random(5)
    pad = lambda: "".join(rng.choice("abcd") for _ in range(50))
    texts = {0: pad() + passage + pad(), 1: passage + pad(), 2: pad()}
    got = _run_pairs(spark, texts, min_length=40)
    exp = _brute_pairs(texts, 40)
    assert got == exp
    assert (0, 1) in got


def test_identical_documents_pair_with_full_length(spark):
    t = "shared identical document body " * 4  # 128 chars
    texts = {0: t, 1: t, 2: t}
    got = _run_pairs(spark, texts, min_length=40)
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    assert all(v == len(t) for v in got.values())


def test_budget_refusal_is_actionable(spark):
    t = "shared identical document body " * 4
    df = spark.createDataFrame([(i, t) for i in range(40)],
                               ["doc_id", "text"])
    op = SubstringDuplicatePairs(min_length=40, max_candidate_pairs=10)
    with pytest.raises(BudgetExceededError, match="max_candidate_pairs"):
        op.run(df).collect()
    # raising the budget completes
    ok = SubstringDuplicatePairs(min_length=40, max_candidate_pairs=1e6)
    assert ok.run(df).count() == 40 * 39 // 2


def test_dedup_filter_keeps_component_minimum(spark):
    """Transitive chain: A~B and B~C share different passages (A and C
    share nothing) — one component, keep only A. Keep-first is by
    order_key, and user columns survive."""
    p1 = "first shared passage padding out to forty!! chars"
    p2 = "second shared passage padding out to forty! chars"
    rng = random.Random(11)
    pad = lambda: "".join(rng.choice("mnop ") for _ in range(50))
    rows = [
        (10, pad() + p1 + pad(), "keep"),
        (20, pad() + p1 + pad() + p2 + pad(), "drop-via-p1"),
        (30, pad() + p2 + pad(), "drop-via-chain"),
        (40, pad(), "unrelated"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "tag"])
    out = SubstringDeduplicateFilter(order_key="doc_id").run(df)
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [10, 40]
    assert set(out.columns) == {"doc_id", "text", "tag"}


def _brute_cut(texts: dict, min_length: int = 40):
    """Keep-first span cut by the L-gram-cover definition (the SQL
    oracle's form): remove positions of doc d inside any L-gram shared
    with a smaller-id document's original text."""
    out = {}
    ids = sorted(texts)
    earlier_grams: set = set()
    for d in ids:
        t, L = texts[d], min_length
        covered = set()
        for i in range(len(t) - L + 1):
            if t[i:i + L] in earlier_grams:
                covered.update(range(i, i + L))
        out[d] = "".join(ch for j, ch in enumerate(t) if j not in covered)
        earlier_grams.update(t[i:i + L] for i in range(len(t) - L + 1))
    return out


def test_cut_refiner_matches_brute_cover(spark):
    rng = random.Random(99)
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    mk = lambda n: " ".join(rng.choice(words) for _ in range(n))
    passages = [mk(12), mk(15)]
    texts = {}
    for i in range(25):
        body = mk(rng.randint(20, 60))
        if rng.random() < 0.6:
            p = rng.choice(passages)
            cut = rng.randint(0, len(body))
            body = body[:cut] + " " + p + " " + body[cut:]
        texts[i] = body
    texts[100] = texts[0]                # identical later copy: fully cut
    texts[101] = "zz" + texts[1] + "qq"  # superstring: keeps only edges
    exp = _brute_cut(texts)
    df = spark.createDataFrame([(i, t) for i, t in texts.items()],
                               ["doc_id", "text"])
    out = SubstringDuplicateCutRefiner().run(df)
    got = {r.doc_id: r.text for r in out.collect()}
    assert got == exp
    assert got[100] == ""
    # earliest copy is never touched
    assert got[0] == texts[0] and got[1] == texts[1]
    # refiner contract: same rows, same columns
    assert sorted(out.columns) == ["doc_id", "text"]


def test_cut_refiner_merges_overlapping_runs(spark):
    """Two earlier docs share different overlapping pieces of a later
    doc; the union of the two runs is removed once (interval merge)."""
    rng = random.Random(17)
    base = "".join(rng.choice("abcdefghij") for _ in range(90))
    texts = {
        0: base[:55],        # shares [0, 55) with doc 2
        1: base[35:],        # shares [35, 90) with doc 2 (not with doc 0)
        2: base,             # fully covered by the union -> empty
    }
    exp = _brute_cut(texts)
    df = spark.createDataFrame([(i, t) for i, t in texts.items()],
                               ["doc_id", "text"])
    got = {r.doc_id: r.text for r in
           SubstringDuplicateCutRefiner().run(df).collect()}
    assert got == exp
    assert got[2] == "" and got[1] == texts[1]


def test_two_disjoint_runs_at_same_alignment_offset(spark):
    """The anchor-elision fold skips anchors inside an already-computed
    run at their alignment offset. Two documents sharing TWO disjoint
    runs at the SAME offset (equal-length distinct gaps between them)
    must still report both: match_len = the longer run, and the cut
    refiner must remove both runs but keep the gap."""
    rng = random.Random(23)
    mk = lambda n: "".join(rng.choice("abcdefgh") for _ in range(n))
    r1, r2 = mk(60), mk(45)
    gap_a, gap_b = "X" * 12, "Y" * 12   # same length -> same alignment
    texts = {0: r1 + gap_a + r2, 1: r1 + gap_b + r2}
    got = _run_pairs(spark, texts, min_length=40)
    exp = _brute_pairs(texts, 40)
    assert got == exp and got[(0, 1)] == 60
    cut = {r.doc_id: r.text for r in SubstringDuplicateCutRefiner().run(
        spark.createDataFrame([(i, t) for i, t in texts.items()],
                              ["doc_id", "text"])).collect()}
    assert cut == _brute_cut(texts)
    assert cut[1] == gap_b and cut[0] == texts[0]


def test_lcp_expression_edges(spark):
    cases = [
        ("", "", 0), ("", "abc", 0), ("abc", "", 0),
        ("abc", "abc", 3), ("abc", "abd", 2), ("abc", "xbc", 0),
        ("abc", "abcdef", 3), ("a", "a", 1),
        ("éx", "éy", 1),
    ]
    df = spark.createDataFrame(cases, ["a", "b", "exp"])
    got = df.select((_lcp(F.col("a"), F.col("b")) == F.col("exp"))
                    .alias("ok")).collect()
    assert all(r.ok for r in got)


def test_short_documents_never_fingerprint(spark):
    texts = {0: "short", 1: "short", 2: "x" * 39, 3: "x" * 39}
    got = _run_pairs(spark, texts, min_length=40)
    assert got == {}


def test_incremental_filter_drops_vs_existing_and_within_batch(spark):
    from dataflow_spark.operators.filters.substring import (
        IncrementalSubstringDedupFilter,
    )
    rng = random.Random(31)
    mk = lambda n: "".join(rng.choice("abcdefgh ") for _ in range(n))
    corpus_passage = mk(60)
    batch_passage = mk(55)
    existing = spark.createDataFrame(
        [(1, mk(50) + corpus_passage + mk(30)), (2, mk(120))],
        ["doc_id", "text"])
    rows = [
        (10, mk(30) + corpus_passage + mk(40)),   # dup of existing -> drop
        (20, mk(20) + batch_passage + mk(50)),    # first in batch -> keep
        (30, mk(35) + batch_passage + mk(25)),    # within-batch dup -> drop
        (40, mk(150)),                             # unrelated -> keep
    ]
    batch = spark.createDataFrame(rows, ["doc_id", "text"])
    op = IncrementalSubstringDedupFilter(order_key="doc_id")
    kept = sorted(r.doc_id for r in op.run(batch, existing=existing).collect())
    assert kept == [20, 40]
    # existing rows are never returned; batch columns survive
    out = op.run(batch, existing=existing)
    assert set(out.columns) == {"doc_id", "text"}
    with pytest.raises(ValueError, match="existing"):
        op.run(batch)


def test_incremental_equals_batch_run_restricted_to_new(spark):
    """Incremental(new, existing=old) == full-batch keep-first on the
    union, restricted to the new side — the property that makes daily
    increments equivalent to one big run."""
    rng = random.Random(37)
    mk = lambda n: "".join(rng.choice("mnopqr ") for _ in range(n))
    passages = [mk(12 * 4), mk(11 * 4)]
    texts = {}
    for i in range(20):
        body = mk(rng.randint(60, 150))
        if rng.random() < 0.5:
            p = rng.choice(passages)
            cut = rng.randint(0, len(body))
            texts[i] = body[:cut] + p + body[cut:]
        else:
            texts[i] = body
    df = spark.createDataFrame([(i, t) for i, t in texts.items()],
                               ["doc_id", "text"])
    old = df.filter(F.col("doc_id") < 10)
    new = df.filter(F.col("doc_id") >= 10)
    from dataflow_spark.operators.filters.substring import (
        IncrementalSubstringDedupFilter,
    )
    inc = sorted(r.doc_id for r in IncrementalSubstringDedupFilter(
        order_key="doc_id").run(new, existing=old).collect())
    full = sorted(r.doc_id for r in SubstringDeduplicateFilter(
        order_key="doc_id").run(df).collect() if r.doc_id >= 10)
    assert inc == full


def test_gram_size_validation():
    with pytest.raises(ValueError):
        SubstringDuplicatePairs(min_length=1)
    with pytest.raises(ValueError):
        SubstringDuplicatePairs(min_length=40, gram_size=41)
    op = SubstringDuplicatePairs(min_length=40)
    assert op.gram_size == 25 and op.window == 16
    op8 = SubstringDuplicatePairs(min_length=8)
    assert 1 <= op8.gram_size <= 8
