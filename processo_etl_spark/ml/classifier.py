"""Learned text classifiers: hashed bag-of-words + logistic regression.

The fastText recipe (Joulin et al. 2016, "Bag of Tricks for Efficient
Text Classification") expressed in Spark MLlib: feature-hash the tokens
(``textstats.hashed_bow_features`` — one explode + one combinable
groupBy, no vocabulary build), train ``pyspark.ml`` LogisticRegression
on the dense vectors.  This is the production quality/language-filter
pattern (CCNet's LM filter, FineWeb-Edu's classifier): distill
rule-based or sampled labels into a linear model, then score the whole
corpus with ONE map-side pass.

Scale shape: training cost is bounded by the labeled subset (at 100 TB
you label a sample, not the corpus); scoring is a narrow map over
(dim)-sized vectors — no shuffle beyond the featurizer's per-doc
groupBy.  L-BFGS aggregates gradients via treeAggregate, so training is
deterministic for a fixed input and partitioning; coefficients may
differ in final ULPs across partition counts, which is why the
registered query gates on an accuracy FLOOR, not exact coefficients.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from processo_etl_spark.ml.textstats import hashed_bow_features


def train_text_classifier(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label: Column,
    dim: int = 64,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit a binary LogisticRegressionModel on hashed-BoW features.

    ``label`` is a boolean Column over ``df`` (e.g. a rule-engine flag
    or a sampled human label).  Deterministic given the input data.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feats = hashed_bow_features(df, text_col, id_col, dim)
    labeled = feats.join(
        df.select(
            F.col(id_col).alias("doc_id"), label.cast("double").alias("label")
        ),
        "doc_id",
    )
    train = labeled.select(
        array_to_vector(F.col("features").cast("array<double>")).alias(
            "features"
        ),
        "label",
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
    )
    return lr.fit(train)


def score_text_classifier(
    df: DataFrame,
    model,
    text_col: str,
    id_col: str,
    dim: int = 64,
) -> DataFrame:
    """(doc_id, p_positive, pred): score every document with the fitted
    model — the whole-corpus filter pass.  ``dim`` must match training.
    """
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = hashed_bow_features(df, text_col, id_col, dim).select(
        "doc_id",
        array_to_vector(F.col("features").cast("array<double>")).alias(
            "features"
        ),
    )
    scored = model.transform(feats)
    return scored.select(
        "doc_id",
        vector_to_array("probability").getItem(1).alias("p_positive"),
        F.col("prediction").cast("int").alias("pred"),
    )
