"""DSIR (Data Selection via Importance Resampling, Xie et al. 2023):
hashed-n-gram importance weights + deterministic Gumbel-top-k
selection, pinned against a from-scratch python replication."""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from dataflow_spark.operators.sampling import (
    DSIRResampleFilter, DSIRWeightEvaluator,
)

B = 10_000


def _bucket(g: str, salt: str = "dsir") -> int:
    return int(hashlib.md5((salt + g).encode()).hexdigest()[:15], 16) % B


def _grams(t: str):
    ws = t.split()
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _brute_weights(texts: dict, target_ids: set) -> dict:
    cr, ct = {}, {}
    for d, t in texts.items():
        for g in _grams(t):
            b = _bucket(g)
            cr[b] = cr.get(b, 0) + 1
            if d in target_ids:
                ct[b] = ct.get(b, 0) + 1
    tr, tt = sum(cr.values()), sum(ct.values())
    return {
        d: sum(math.log(ct.get(_bucket(g), 0) + 1) - math.log(tt + B)
               - math.log(cr.get(_bucket(g), 0) + 1) + math.log(tr + B)
               for g in _grams(t))
        for d, t in texts.items()
    }


def _gumbel_key(d, w: float) -> float:
    h = int(hashlib.md5(("dsir-gumbel" + str(d)).encode()).hexdigest()[:15], 16)
    u = (h + 0.5) / float(1 << 60)
    return w - math.log(-math.log(u))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(1)
    vocab_a = ["apple", "banana", "cherry", "grape"]
    vocab_b = ["stone", "iron", "copper", "slate"]
    texts = {}
    for i in range(40):
        v = vocab_a if i % 2 == 0 else vocab_b
        texts[i] = " ".join(rng.choice(v) for _ in range(rng.randint(5, 30)))
    texts[50] = ""  # no n-grams -> weight exactly 0
    df = spark.createDataFrame([(i, t) for i, t in texts.items()],
                               ["doc_id", "text"])
    target_ids = {i for i in texts if i % 2 == 0 and i < 40}
    return texts, df, target_ids


def test_weights_match_python_replication(spark, corpus):
    texts, df, target_ids = corpus
    tgt = df.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 40))
    got = {r.doc_id: r.dsir_logratio
           for r in DSIRWeightEvaluator().run(df, target=tgt).collect()}
    exp = _brute_weights(texts, target_ids)
    assert set(got) == set(exp)
    assert all(abs(got[d] - exp[d]) < 1e-9 for d in exp)
    assert got[50] == 0.0


def test_target_domain_outranks_off_domain(spark, corpus):
    texts, df, _ = corpus
    tgt = df.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 40))
    got = {r.doc_id: r.dsir_logratio
           for r in DSIRWeightEvaluator().run(df, target=tgt).collect()}
    # disjoint vocabularies: every in-domain doc above every off-domain doc
    assert min(got[i] for i in range(0, 40, 2)) > \
        max(got[i] for i in range(1, 40, 2))


def test_gumbel_selection_is_exact_and_deterministic(spark, corpus):
    texts, df, target_ids = corpus
    tgt = df.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 40))
    weighted = DSIRWeightEvaluator().run(df, target=tgt)
    sel = DSIRResampleFilter(k=10).run(weighted)
    got = sorted(r.doc_id for r in sel.collect())
    exp_w = _brute_weights(texts, target_ids)
    exp = sorted(sorted(exp_w, key=lambda d: (-_gumbel_key(d, exp_w[d]), d))[:10])
    assert got == exp
    # re-run: identical sample (pure function of data)
    again = sorted(r.doc_id for r in DSIRResampleFilter(k=10)
                   .run(weighted).collect())
    assert again == got


def test_requires_target():
    import pyspark.sql.utils  # noqa: F401
    with pytest.raises(ValueError, match="target"):
        DSIRWeightEvaluator().run(None, target=None)


def test_validation():
    with pytest.raises(ValueError):
        DSIRWeightEvaluator(n_buckets=1)
    with pytest.raises(ValueError):
        DSIRResampleFilter(k=0)
