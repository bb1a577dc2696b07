"""Distributed logistic-regression training: exact pure-Python replay,
partition-order invariance, learning-signal sanity. The cross-engine
(DuckDB) replay of the same trajectory is the registered
logreg_classifier_scores oracle."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from etl_database_spark.functions import classifier as C
from etl_database_spark.queries import table

SF = "/root/testdata/sf0.001"


def _round_half_up(v: float, digits: int) -> float:
    # Spark's ROUND on a double: shortest decimal rendering, then
    # HALF_UP at the scale — repr() is the same shortest rendering.
    return float(Decimal(repr(v)).quantize(Decimal(f"1e-{digits}"), ROUND_HALF_UP))


def _pyref_train(rows, lr=C.LR, iters=C.ITERS):
    n = float(len(rows))
    w = [0.0] * C.N_FEATS
    hist = []
    for _ in range(iters):
        grads = [Decimal(0)] * C.N_FEATS
        for y, x in rows:
            z = w[0] * x[0]
            for j in range(1, C.N_FEATS):
                z = z + w[j] * x[j]
            p = _round_half_up(1.0 / (1.0 + math.exp(-z)), 9)
            for j in range(C.N_FEATS):
                grads[j] += Decimal(repr(_round_half_up((p - y) * x[j], 12)))
        w = [
            _round_half_up(w[j] - lr * float(grads[j]) / n, 9)
            for j in range(C.N_FEATS)
        ]
        hist.append(list(w))
    return hist


def _collect_feats(spark):
    d = table(spark, SF, "documents")
    feats = C.quality_features(d)
    rows = [
        (r.y, [r.x0, r.x1, r.x2, r.x3, r.x4])
        for r in feats.orderBy("_id").collect()
    ]
    return feats, rows


def test_training_matches_pure_python_exactly(spark):
    feats, rows = _collect_feats(spark)
    assert C.logreg_train(feats) == _pyref_train(rows)


def test_training_is_partition_order_invariant(spark):
    feats, _ = _collect_feats(spark)
    w_a = C.logreg_train(feats)
    w_b = C.logreg_train(feats.repartition(7, "x1"))
    w_c = C.logreg_train(feats.coalesce(1))
    assert w_a == w_b == w_c


def test_classifier_learns_a_signal(spark):
    """Loss decreases every iteration and the trained model beats the
    majority-class baseline on the training fixture (en-stopword
    density is a genuinely separating feature)."""
    feats, rows = _collect_feats(spark)
    hist = C.logreg_train(feats)

    def loss(w):
        tot = 0.0
        for y, x in rows:
            z = sum(w[j] * x[j] for j in range(C.N_FEATS))
            p = min(max(1.0 / (1.0 + math.exp(-z)), 1e-12), 1 - 1e-12)
            tot -= y * math.log(p) + (1 - y) * math.log(1 - p)
        return tot / len(rows)

    losses = [loss([0.0] * C.N_FEATS)] + [loss(w) for w in hist]
    assert all(b < a for a, b in zip(losses, losses[1:]))

    scored = C.logreg_scores(feats, hist[-1])
    joined = feats.select("_id", "y").join(scored, "_id")
    acc = joined.where(
        (F.col("pred") == 1) == (F.col("y") == 1.0)
    ).count() / joined.count()
    ys = [y for y, _ in rows]
    majority = max(sum(ys), len(ys) - sum(ys)) / len(ys)
    assert acc > majority and acc >= 0.85


def test_genuine_language_label_is_learned(spark):
    """The soak construction (tools/soak_classifier.py): inject a
    deterministic language-correlated suffix, train the UNCHANGED
    production pipeline against label = (lang='en') on a 90/10
    md5-bucket split — held-out accuracy must beat the majority
    baseline. This is the meaningful-accuracy pin behind the
    registered trajectory row's documented pseudo-label posture."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
    )
    from soak_classifier import lang_injected

    from etl_database_spark.functions import classifier as C
    from etl_database_spark.functions import sampling as SMP
    from etl_database_spark.queries import table

    d = lang_injected(table(spark, "/root/testdata/sf0.001", "documents"))
    label = (F.col("lang") == "en").cast("double")
    bucket = SMP.hash_bucket("doc_id")
    train = C.quality_features(d.where(bucket < 900), label=label)
    test = C.quality_features(d.where(bucket >= 900), label=label)
    w = C.logreg_train(train, iters=50)[-1]
    scored = C.logreg_scores(test, w).join(test.select("_id", "y"), "_id")
    agg = scored.agg(
        F.avg((F.col("pred") == F.col("y").cast("long")).cast("double")).alias("acc"),
        F.avg("y").alias("pos"),
    ).first()
    assert agg.acc > max(agg.pos, 1 - agg.pos)
    # sf0.001's held-out slice is ~23 docs; the soak records 1.00 at
    # 500/5k/50k docs — the small-fixture bound just needs headroom
    # over majority (~0.65)
    assert agg.acc >= 0.8
