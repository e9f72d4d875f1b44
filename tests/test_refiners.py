"""Refiner transforms: exact expected outputs per operator."""

import pytest

from dataflow_spark.core.registry import get_operator


def refine(spark, op_name, text, params=None):
    df = spark.createDataFrame([(text,)], ["text"])
    out = get_operator(op_name, {"input_key": "text", **(params or {})}).run(df)
    return out.first()["text"]


@pytest.mark.parametrize("op,inp,expected", [
    ("LowercaseRefiner", "Hello WORLD", "hello world"),
    ("RemoveExtraSpacesRefiner", "  a   b\t c  ", "a b c"),
    ("RemoveNumberRefiner", "a1b22c333", "abc"),
    ("RemovePunctuationRefiner", "a,b.c!d?", "abcd"),
    ("RemoveRepetitionsPunctuationRefiner", "wow!!! yes??", "wow! yes?"),
    ("HtmlUrlRemoverRefiner", "see https://x.com/page now", "see  now"),
    ("HtmlEntityRefiner", "a &amp; b &lt;c&gt;", "a & b <c>"),
    ("RemoveImageRefsRefiner", "pre ![alt](http://img) post", "pre  post"),
    ("ReferenceRemoverRefiner", "claim [12] and [3, 4] done", "claim  and  done"),
    ("RemoveContractionsRefiner", "can't won't it's", "cannot will not it's"),
    ("TextNormalizationRefiner", "‘q’  “w” – e", "'q' \"w\" - e"),
    ("RemoveEmojiRefiner", "hi \U0001f600 there", "hi  there"),
])
def test_refiner(spark, op, inp, expected):
    assert refine(spark, op, inp) == expected


def test_remove_stopwords(spark):
    assert refine(spark, "RemoveStopwordsRefiner",
                  "the cat sat on the mat") == "cat sat mat"


def test_refiner_chain_single_stage(spark, docs):
    """Chained refiners should stay one projection (no shuffle)."""
    from dataflow_spark import Pipeline

    pipe = Pipeline([
        get_operator("LowercaseRefiner", {"input_key": "text"}),
        get_operator("RemoveExtraSpacesRefiner", {"input_key": "text"}),
        get_operator("RemoveNumberRefiner", {"input_key": "text"}),
    ])
    out = pipe.forward(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow chain, no shuffle


def test_unicode_normalization_refiner_forms(spark):
    from dataflow_spark.core.registry import get_operator

    decomposed = "café ﬁne"   # e+combining acute, fi ligature
    df = spark.createDataFrame([(1, decomposed), (2, None)],
                               ["doc_id", "text"])
    nfc = {r.doc_id: r.text for r in get_operator(
        "UnicodeNormalizationRefiner", {"form": "NFC"}).run(df).collect()}
    assert nfc[1] == "café ﬁne"   # composed; ligature kept
    assert nfc[2] is None
    nfkc = {r.doc_id: r.text for r in get_operator(
        "UnicodeNormalizationRefiner", {"form": "NFKC"}).run(df).collect()}
    assert nfkc[1] == "café fine"      # ligature expanded

    import pytest

    with pytest.raises(ValueError):
        get_operator("UnicodeNormalizationRefiner", {"form": "bogus"})
