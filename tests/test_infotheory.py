"""mutual_information / js_divergence (infotheory.py) vs quantized
Python mirrors."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from crgp_spark.operators.infotheory import js_divergence, mutual_information


def _lnq(x):
    return math.floor(math.log(x) * 1e6 + 0.5)


def _mi_ref(pairs):
    cells = Counter(pairs)
    mx = Counter()
    my = Counter()
    for (x, y), c in cells.items():
        mx[x] += c
        my[y] += c
    n = sum(cells.values())
    mi_scaled = sum(
        c * (_lnq(n * c) - _lnq(mx[x] * my[y]))
        for (x, y), c in cells.items()
    )
    hx = n * _lnq(n) - sum(c * _lnq(c) for c in mx.values())
    hy = n * _lnq(n) - sum(c * _lnq(c) for c in my.values())
    mi = mi_scaled / (n * 1e6)
    nmi = (
        mi_scaled / math.sqrt(float(hx) * float(hy))
        if hx > 0 and hy > 0
        else 0.0
    )
    return (
        n,
        mi_scaled,
        hx,
        hy,
        math.floor(mi * 1e6 + 0.5) / 1e6,
        math.floor(nmi * 1e6 + 0.5) / 1e6,
    )


def test_mi_mirror(spark):
    pairs = [((u * 3) % 4, (u * 3 + u // 5) % 3) for u in range(60)]
    df = spark.createDataFrame(pairs, "x: long, y: long")
    r = mutual_information(df, "x", "y").collect()[0]
    assert tuple(r) == _mi_ref(pairs)


def test_mi_perfect_dependence(spark):
    pairs = [(u % 3, u % 3) for u in range(30)]
    df = spark.createDataFrame(pairs, "x: long, y: long")
    r = mutual_information(df, "x", "y").collect()[0]
    # MI == H(X) == ln 3 for a uniform 3-way identity coupling
    assert abs(r.mi - math.log(3)) < 1e-4
    assert abs(r.nmi - 1.0) < 1e-4


def test_mi_independent_uniform(spark):
    pairs = [(u % 2, (u // 2) % 2) for u in range(40)]
    df = spark.createDataFrame(pairs, "x: long, y: long")
    r = mutual_information(df, "x", "y").collect()[0]
    assert abs(r.mi) < 1e-5


def _toks(text):
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]


def _jsd_ref(docs_a, docs_b):
    ca = Counter(t for d in docs_a for t in _toks(d))
    cb = Counter(t for d in docs_b for t in _toks(d))
    na, nb = sum(ca.values()), sum(cb.values())
    sa = sum(
        c * (_lnq(2 * c * nb) - _lnq(c * nb + cb.get(t, 0) * na))
        for t, c in ca.items()
    )
    sb = sum(
        c * (_lnq(2 * c * na) - _lnq(ca.get(t, 0) * nb + c * na))
        for t, c in cb.items()
    )
    jsd = sa / (2e6 * na) + sb / (2e6 * nb)
    return na, nb, sa, sb, math.floor(jsd * 1e6 + 0.5) / 1e6


def _docs(spark, texts_a, texts_b):
    rows = [(i, t, "en") for i, t in enumerate(texts_a)] + [
        (100 + i, t, "fr") for i, t in enumerate(texts_b)
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")


def test_jsd_mirror(spark):
    a = ["the cat sat on the mat", "a cat and a dog", "the dog barks"]
    b = ["le chat est ici", "the dog sleeps", "chat et chien"]
    df = _docs(spark, a, b)
    r = js_divergence(df, F.col("lang") == "en").collect()[0]
    assert tuple(r) == _jsd_ref(a, b)


def test_jsd_identical_is_zero(spark):
    a = ["alpha beta gamma", "beta gamma delta"]
    df = _docs(spark, a, a)
    r = js_divergence(df, F.col("lang") == "en").collect()[0]
    assert r.jsd == 0.0


def test_jsd_disjoint_is_ln2(spark):
    a = ["aaa bbb ccc"]
    b = ["xxx yyy zzz"]
    df = _docs(spark, a, b)
    r = js_divergence(df, F.col("lang") == "en").collect()[0]
    assert abs(r.jsd - math.log(2)) < 1e-5
