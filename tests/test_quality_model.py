"""Model-based quality filter: hashed-n-gram linear classifier
(train on planted separable corpus, score JVM-side, persist)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wrds_data_pipeline_spark.operators.quality_model import (
    QualityModel,
    filter_by_quality_model,
    hashed_features,
    load_quality_model,
    save_quality_model,
    score_quality,
    train_quality_model,
)

GOOD = [
    "the theorem follows from a careful analysis of the bound",
    "we evaluate the estimator on held out data and report variance",
    "the proof proceeds by induction on the structure of the term",
    "empirical results confirm the theoretical convergence rate",
    "the algorithm runs in linear time under mild assumptions",
    "a rigorous treatment of measure theory underpins the argument",
]
BAD = [
    "click here buy now limited offer free free free",
    "win big casino jackpot spins bonus claim claim",
    "cheap pills discount shipping order today satisfaction",
    "subscribe like share follow giveaway prize winner",
    "hot deals flash sale coupon code expires soon",
    "earn cash fast from home no experience needed",
]


def _labeled(spark, copies=4):
    rows = []
    i = 0
    for c in range(copies):
        for t in GOOD:
            rows.append((i, f"{t} variant {c}", 1))
            i += 1
        for t in BAD:
            rows.append((i, f"{t} variant {c}", 0))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


@pytest.fixture(scope="module")
def model(spark):
    return train_quality_model(
        _labeled(spark), "label", n_buckets=1 << 12, sample=1000
    )


def test_train_separates_planted_classes(spark, model):
    held = spark.createDataFrame(
        [(100, GOOD[0].replace("theorem", "lemma"), 1),
         (101, BAD[0].replace("casino", "lottery"), 0),
         (102, GOOD[3] + " as expected", 1),
         (103, BAD[4] + " act now", 0)],
        ["doc_id", "text", "label"],
    )
    got = {
        r["doc_id"]: r["prob"]
        for r in score_quality(held, model).collect()
    }
    assert got[100] > 0.8 and got[102] > 0.8
    assert got[101] < 0.2 and got[103] < 0.2


def test_training_is_deterministic(spark, model):
    again = train_quality_model(
        _labeled(spark), "label", n_buckets=1 << 12, sample=1000
    )
    assert again == model


def test_score_matches_python_replay(spark, model):
    """prob == sigmoid(bias + dot(w, counts)/n_terms), replayed from
    the feature relation itself (the join+agg is what's under test)."""
    docs = _labeled(spark).limit(8)
    feats = hashed_features(docs, n_buckets=model.n_buckets).collect()
    by_doc: dict[int, list] = {}
    for r in feats:
        by_doc.setdefault(r["_id"], []).append((r["bucket"], r["cnt"]))
    got = {r["doc_id"]: r for r in score_quality(docs, model).collect()}
    for did, fs in by_doc.items():
        n = sum(c for _, c in fs)
        z = model.bias + sum(
            model.weights.get(b, 0.0) * c for b, c in fs
        ) / n
        assert got[did]["n_terms"] == n
        assert abs(got[did]["logit"] - z) < 1e-9
        assert abs(got[did]["prob"] - 1.0 / (1.0 + math.exp(-z))) < 1e-12


def test_empty_and_null_text_score_bias_only(spark, model):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = score_quality(docs, model).collect()
    assert len(rows) == 3
    want = 1.0 / (1.0 + math.exp(-model.bias))
    for r in rows:
        assert r["n_terms"] == 0
        assert abs(r["prob"] - want) < 1e-12


def test_filter_keeps_good_drops_bad(spark, model):
    docs = _labeled(spark)
    kept = filter_by_quality_model(docs, model, min_prob=0.5)
    labels = [r["label"] for r in kept.collect()]
    assert labels and all(v == 1 for v in labels)
    # every good doc survives
    assert len(labels) == docs.filter("label = 1").count()


def test_save_load_round_trip(spark, model, tmp_path):
    path = str(tmp_path / "qmodel")
    save_quality_model(model, path)
    loaded = load_quality_model(spark, path)
    assert loaded == model
    docs = _labeled(spark).limit(6)
    a = {r["doc_id"]: r["prob"] for r in score_quality(docs, model).collect()}
    b = {r["doc_id"]: r["prob"] for r in score_quality(docs, loaded).collect()}
    assert a == b


def test_scoring_plan_is_jvm_broadcast(spark, model):
    """Weight join broadcasts; no Python eval anywhere in the plan."""
    plan = score_quality(_labeled(spark), model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_bigram_features_differ_from_unigram(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], ["doc_id", "text"]
    )
    uni = hashed_features(docs, ngram_max=1, n_buckets=1 << 12)
    both = hashed_features(docs, ngram_max=2, n_buckets=1 << 12)
    assert uni.agg(F.sum("cnt")).collect()[0][0] == 3
    # 3 unigrams + 2 bigrams
    assert both.agg(F.sum("cnt")).collect()[0][0] == 5


def test_evaluate_quality_model(spark, model):
    from wrds_data_pipeline_spark.operators.quality_model import (
        evaluate_quality_model,
    )

    held = _labeled(spark)  # same planted distribution
    out = evaluate_quality_model(held, "label", model)
    assert out["n"] == held.count()
    assert out["n_pos"] == held.filter("label = 1").count()
    assert out["accuracy"] >= 0.95
    assert out["auc"] >= 0.95
    assert out["auc_tie_mass"] <= 0.05
    # binned AUC matches a python replay on the collected probs
    from wrds_data_pipeline_spark.operators.quality_model import (
        score_quality,
    )

    rows = (
        score_quality(held, model)
        .join(held.select("doc_id", "label"), "doc_id")
        .collect()
    )
    n_bins = 1000
    import collections

    hist = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        b = min(n_bins - 1, int(r["prob"] * n_bins))
        hist[b][0 if r["label"] == 1 else 1] += 1
    num, below = 0.0, 0
    npos = sum(v[0] for v in hist.values())
    nneg = sum(v[1] for v in hist.values())
    for b in sorted(hist):
        p, g = hist[b]
        num += p * below + 0.5 * p * g
        below += g
    assert abs(out["auc"] - num / (npos * nneg)) < 1e-12


def test_evaluate_requires_both_classes(spark, model):
    import pytest

    from wrds_data_pipeline_spark.operators.quality_model import (
        evaluate_quality_model,
    )

    one_class = _labeled(spark).filter("label = 1")
    with pytest.raises(ValueError, match="both classes"):
        evaluate_quality_model(one_class, "label", model)
