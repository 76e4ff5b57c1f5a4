"""Model-based quality filtering — the classifier stage of a
training-data pipeline (the GPT-3/CCNet idiom: train a small linear
classifier on handcrafted text features, score the whole corpus, keep
what it likes). Here the training labels distill the repo's own
rule-based ``quality_score`` heuristic (threshold 0.45 ≈ the corpus
median) into a smooth linear model — the standard bootstrap when no
human labels exist.

Training is distributed full-batch logistic regression: each iteration
is ONE partial-aggregated pass over the feature table (gradient sums
combine map-side), a 5-number driver round-trip, and a weight update —
the same iterative-ML pattern as ``kmeans_train`` (one tiny collect per
iteration, never per row). Scoring is a pure scan-fused expression with
literal weights: zero shuffles, runs at 100 TB scan speed.

Determinism for the fixed-expected-value oracle: feature values are
exact counts pushed through a fixed chain of IEEE ops (every op
correctly rounded ⇒ engine-identical); gradient sums are quantized to
1e-9 per iteration (absorbing summation-order ULP noise, the
kmeans_train discipline), so the trained weights are a pure function of
the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

FEATURE_NAMES = (
    "bias", "len_norm", "mean_word_len", "distinct_ratio", "stopword_x16"
)

# gold-rule threshold the classifier distills (≈ sf0.01 corpus median of
# pipeline.text.quality_score's composite)
QUALITY_LABEL_THRESHOLD = 0.45

# Trained checkpoint at sf0.01 (captured by quality_classifier_train,
# pinned by tests): the literal weights the scoring query and its SQL
# oracle share.
TRAINED_WEIGHTS = {
    "bias": 0.1136567,
    "len_norm": -0.1448904,
    "mean_word_len": -0.8239816,
    "distinct_ratio": -0.0078811,
    "stopword_x16": 6.2759901,
}


def _feature_exprs() -> list[tuple[str, F.Column]]:
    """The four centered features over a staged ``_toks`` column.
    Centering constants are fixed literals (so train/score/oracle agree);
    they put each feature roughly in [-1, 1], which full-batch GD needs
    to move off the all-positive solution.

    - ``len_norm``        n_tokens/100 − 0.5
    - ``mean_word_len``   Σ len(token)/n_tokens − 4.5
    - ``distinct_ratio``  n_distinct/n_tokens − 0.625
    - ``stopword_x16``    16·(n_stop/n_tokens) − 1   (the gold rule's
      own decision variable: quality ≥ 0.45 ⇔ stop_ratio ≳ 1/16 on the
      punctuation-free fixture)
    """
    from .text import STOPWORDS

    stop_arr = sorted({w for ws in STOPWORDS.values() for w in ws})
    return [
        ("len_norm", F.size("_toks") / F.lit(100.0) - F.lit(0.5)),
        (
            "mean_word_len",
            F.aggregate(
                F.transform("_toks", lambda t: F.length(t).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            )
            / F.size("_toks")
            - F.lit(4.5),
        ),
        (
            "distinct_ratio",
            F.size(F.array_distinct("_toks")) / F.size("_toks") - F.lit(0.625),
        ),
        (
            "stopword_x16",
            F.size(F.filter("_toks", lambda t: t.isin(stop_arr)))
            / F.size("_toks")
            * F.lit(16.0)
            - F.lit(1.0),
        ),
    ]


def corpus_features(docs: DataFrame) -> DataFrame:
    """doc_id + the four centered features — shared by training and
    scoring so the two can never drift."""
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    return docs.select("doc_id", toks.alias("_toks")).select(
        "doc_id", *[c.alias(name) for name, c in _feature_exprs()]
    )


def quality_features(docs: DataFrame) -> DataFrame:
    """Features + the distillation label (rule-based quality ≥ threshold)."""
    from .text import quality_score

    labels = quality_score(docs).select(
        "doc_id",
        (F.col("quality") >= F.lit(QUALITY_LABEL_THRESHOLD))
        .cast("double")
        .alias("label"),
    )
    return corpus_features(docs).join(labels, "doc_id")


def _quant(x: float, q: float = 1e-9) -> float:
    return math.floor(x / q + 0.5) * q


def _margin(w) -> F.Column:
    """Fixed-order logit chain — the SAME association in training,
    scoring, and the SQL oracle: (((w0 + w1·f1) + w2·f2) + w3·f3) + w4·f4."""
    z = F.lit(float(w[0]))
    for wi, name in zip(w[1:], FEATURE_NAMES[1:]):
        z = z + F.lit(float(wi)) * F.col(name)
    return z


def quality_classifier_train(
    docs: DataFrame,
    iters: int = 60,
    lr: float = 2.0,
) -> DataFrame:
    """Train the logistic quality classifier; returns the weight table
    ``(feature, weight_fp)`` (1e-7 fixed point) plus a ``_train_acc_fp``
    row — deterministic on a fixed corpus, so the sf0.01 result ships as
    a literal oracle (captured by scratch/gen_fixed_oracles.py).

    Per iteration: sigmoid margins and per-feature gradient components
    are Catalyst expressions; the only driver traffic is the 5 summed
    gradient coordinates. The feature table is persisted once — 5
    doubles/doc, the classic iterative-ML working set.
    """
    feats = quality_features(docs).persist()
    try:
        n = feats.count()
        w = [0.0] * len(FEATURE_NAMES)
        fcols = list(FEATURE_NAMES[1:])
        for _ in range(iters):
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w)))
            g = (
                feats.select((p - F.col("label")).alias("_e"), *fcols)
                .select(
                    "_e",
                    *[
                        (F.col("_e") * F.col(c)).alias(f"_g{i}")
                        for i, c in enumerate(fcols, start=1)
                    ],
                )
                .agg(
                    F.sum("_e"),
                    *[F.sum(f"_g{i}") for i in range(1, len(fcols) + 1)],
                )
                .first()
            )
            grads = [_quant(float(gi) / n) for gi in g]
            w = [_quant(wi - lr * gi) for wi, gi in zip(w, grads)]
        # training accuracy under the final weights (decision at z > 0)
        acc = (
            feats.select(
                ((_margin(w) > 0).cast("double") == F.col("label"))
                .cast("bigint")
                .alias("_ok")
            )
            .agg(F.sum("_ok"))
            .first()[0]
        )
    finally:
        feats.unpersist()
    spark = docs.sparkSession
    rows = [
        (name, int(math.floor(wi * 1e7 + 0.5)))
        for name, wi in zip(FEATURE_NAMES, w)
    ] + [("_train_acc_fp", int(math.floor(acc / n * 1e7 + 0.5)))]
    return spark.createDataFrame(rows, "feature string, weight_fp bigint")


def quality_classifier_score(
    docs: DataFrame, weights: dict[str, float] | None = None
) -> DataFrame:
    """Apply a trained classifier checkpoint (literal weights) to the
    corpus: ``(doc_id, margin_fp, keep)`` where margin is the linear
    logit and ``keep`` its sign — the filtering decision.

    The margin is a fixed-order chain of IEEE multiply-adds over exact
    features, so a SQL oracle with the same literals matches bit-for-bit
    (no sigmoid needed: sigmoid is monotone, the decision lives in the
    logit). Zero shuffles — pure scan-fused projection, the production
    scoring plan at any scale.
    """
    if weights is None:
        weights = TRAINED_WEIGHTS
    z = _margin([weights[name] for name in FEATURE_NAMES])
    return corpus_features(docs).select(
        "doc_id",
        F.floor(z * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("margin_fp"),
        (z > 0).alias("keep"),
    )
