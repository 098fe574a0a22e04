"""Distributed transaction categorizer (SURVEY §2.9, M1-M12).

Spark ML twin of the reference's sklearn pipeline
(dagster/classifier_train.py:85-300, classifier_predict.py:25-180):
TF-IDF(1-2gram, vocab 1000, minDF 2, maxDF 0.95, english stopwords)
over ``combined_text`` + StandardScaler over the 14 numerical features
→ RandomForest(200 trees, depth 15, minInstancesPerNode 5, sqrt
features, seed 42) with balanced class weights.

Parity contract (SURVEY §7 phase 5): *behavioral* equivalence —
skip-gate, stratified split, UNCERTAIN thresholding, registry
lifecycle, column contracts, comparable metrics — not bitwise model
equality (different RF implementations).

Everything is distributed: no pandas hop, the features stay in
executors (the reference's `SELECT * → pandas → sklearn` is its main
scale ceiling; SURVEY §3.4).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    NGram,
    RegexTokenizer,
    SQLTransformer,
    StandardScaler,
    StopWordsRemover,
    StringIndexer,
    VectorAssembler,
)
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from ..schemas import MIN_TRAINING_SAMPLES, NUMERICAL_FEATURES, TEXT_FEATURE


def build_feature_pipeline(vocab_size: int = 1000) -> list:
    """Feature stages mirroring TfidfVectorizer(1,2-gram) + StandardScaler.

    tokenize → english stopwords → unigram∪bigram terms →
    CountVectorizer(minDF=2, maxDF=0.95) → IDF; numerical vector →
    StandardScaler(withMean) — assembled into one sparse `features`.
    """
    tokenizer = RegexTokenizer(
        inputCol=TEXT_FEATURE, outputCol="_tokens", pattern=r"\W+", toLowercase=True
    )
    stop = StopWordsRemover(inputCol="_tokens", outputCol="_words")
    bigrams = NGram(n=2, inputCol="_words", outputCol="_bigrams")
    # union unigrams + bigrams into one term array (sklearn ngram_range=(1,2))
    concat_terms = SQLTransformer(
        statement="SELECT *, concat(_words, _bigrams) AS _terms FROM __THIS__"
    )
    cv = CountVectorizer(
        inputCol="_terms",
        outputCol="_tf",
        vocabSize=vocab_size,
        minDF=2.0,
        maxDF=0.95,
    )
    idf = IDF(inputCol="_tf", outputCol="_tfidf")
    num_assembler = VectorAssembler(
        inputCols=NUMERICAL_FEATURES, outputCol="_num_raw", handleInvalid="keep"
    )
    scaler = StandardScaler(
        inputCol="_num_raw", outputCol="_num_scaled", withMean=True, withStd=True
    )
    features = VectorAssembler(
        inputCols=["_tfidf", "_num_scaled"], outputCol="features"
    )
    return [tokenizer, stop, bigrams, concat_terms, cv, idf, num_assembler, scaler, features]


def stratified_split(
    df: DataFrame, label_col: str, test_fraction: float = 0.2, seed: int = 42
) -> tuple[DataFrame, DataFrame, bool]:
    """Deterministic stratified 80/20 split (classifier_train.py:176-196).

    Exact per-class split via a hash-ordered row_number window — fully
    deterministic across runs and partitionings (unlike sampleBy's
    Bernoulli draw). Falls back to unstratified when any class has < 2
    samples, like the reference.
    """
    counts = df.groupBy(label_col).count().collect()
    min_class = min((r["count"] for r in counts), default=0)
    use_stratify = min_class >= 2

    order = F.xxhash64(F.col("transaction_id"), lit(seed))
    if use_stratify:
        w = Window.partitionBy(label_col).orderBy(order)
        w_cnt = Window.partitionBy(label_col)
        tagged = df.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_cnt", F.count("*").over(w_cnt)
        )
    else:
        w = Window.orderBy(order)
        tagged = df.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_cnt", lit(df.count())
        )
    test = tagged.filter(col("_rn") <= F.ceil(col("_cnt") * test_fraction)).drop("_rn", "_cnt")
    train = tagged.filter(col("_rn") > F.ceil(col("_cnt") * test_fraction)).drop("_rn", "_cnt")
    return train, test, use_stratify


def _balanced_weights(df: DataFrame, label_col: str) -> DataFrame:
    """sklearn class_weight='balanced': w_c = n / (k * n_c)."""
    counts = df.groupBy(label_col).agg(F.count("*").alias("_n_c"))
    n = df.count()
    k = counts.count()
    weights = counts.select(
        label_col, (lit(float(n)) / (lit(float(k)) * col("_n_c"))).alias("_weight")
    )
    return df.join(F.broadcast(weights), label_col, "left")


@dataclass
class TrainResult:
    status: str
    model_version: str
    model: PipelineModel | None = None
    metrics: dict = field(default_factory=dict)
    n_train: int = 0
    n_test: int = 0


def _classification_metrics(predictions: DataFrame, label_col: str) -> dict:
    """accuracy + macro/weighted precision/recall/F1 + confusion matrix,
    computed distributively from the confusion counts (M6)."""
    conf = (
        predictions.groupBy(
            col(label_col).alias("actual"), col("predicted_label").alias("predicted")
        )
        .count()
        .collect()
    )
    by_pair = {(r.actual, r.predicted): r["count"] for r in conf}
    classes = sorted({a for a, _ in by_pair} | {p for _, p in by_pair})
    total = sum(by_pair.values())
    correct = sum(v for (a, p), v in by_pair.items() if a == p)
    support = {c: sum(v for (a, _), v in by_pair.items() if a == c) for c in classes}
    pred_n = {c: sum(v for (_, p), v in by_pair.items() if p == c) for c in classes}

    per_class = {}
    for c in classes:
        tp = by_pair.get((c, c), 0)
        prec = tp / pred_n[c] if pred_n[c] else 0.0
        rec = tp / support[c] if support[c] else 0.0
        f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
        per_class[c] = {"precision": prec, "recall": rec, "f1": f1, "support": support[c]}

    k = len(classes)
    macro = lambda m: sum(per_class[c][m] for c in classes) / k if k else 0.0  # noqa: E731
    weighted = lambda m: (  # noqa: E731
        sum(per_class[c][m] * support[c] for c in classes) / total if total else 0.0
    )
    return {
        "accuracy": correct / total if total else 0.0,
        "macro_f1": macro("f1"),
        "weighted_f1": weighted("f1"),
        "macro_precision": macro("precision"),
        "macro_recall": macro("recall"),
        "weighted_precision": weighted("precision"),
        "weighted_recall": weighted("recall"),
        "confusion": {f"{a}→{p}": v for (a, p), v in sorted(by_pair.items())},
        "per_class": per_class,
    }


def _calibration_curves(
    predictions: DataFrame, label_col: str, top_categories: list[str], n_bins: int = 10
) -> dict:
    """M7 (classifier_train.py:271-290): per-top-category reliability
    curve — bucket P(category) into 10 uniform bins, mean predicted vs
    observed rate per bin. One distributed agg per category."""
    out = {}
    probs = predictions.select(
        label_col, vector_to_array("probability").alias("_p"), "_label_values"
    )
    for cat in top_categories:
        pos = F.array_position(col("_label_values"), cat).cast("int")
        scored = probs.select(
            (col(label_col) == cat).cast("int").alias("_y"),
            # guard: a class absent from the training labels has pos=0 and
            # element_at(_, 0) throws — emit NULL instead
            F.when(pos > 0, F.element_at(col("_p"), pos)).alias("_proba"),
        ).filter(col("_proba").isNotNull())
        binned = (
            scored.withColumn(
                "_bin", F.least(F.floor(col("_proba") * n_bins), lit(n_bins - 1))
            )
            .groupBy("_bin")
            .agg(F.avg("_y").alias("prob_true"), F.avg("_proba").alias("prob_pred"))
            .orderBy("_bin")
            .collect()
        )
        if binned:
            out[cat] = {
                "prob_true": [r.prob_true for r in binned],
                "prob_pred": [r.prob_pred for r in binned],
            }
    return out


def train_classifier(
    spark: SparkSession,
    df_train: DataFrame,
    label_col: str = "master_category",
    seed: int = 42,
    min_training_samples: int = MIN_TRAINING_SAMPLES,
    now: dt.datetime | None = None,
) -> TrainResult:
    """Train the categorizer (M1-M8). Returns a skipped result below the
    sample gate, mirroring classifier_train.py:90-166."""
    now = now or dt.datetime.utcnow()
    model_version = now.strftime("%Y%m%d_%H%M%S")

    df = df_train.filter(col("amount").isNotNull())  # P8
    df = df.na.fill({TEXT_FEATURE: ""}).na.fill(
        {c: 0 for c in NUMERICAL_FEATURES}
    )
    df = df.withColumn("amount", col("amount").cast("double"))
    n = df.count()
    if n < min_training_samples:
        return TrainResult(
            status="skipped",
            model_version=model_version,
            metrics={
                "status": "skipped",
                "reason": "insufficient_data",
                "message": (
                    f"Only {n} transaction(s) available. Need at least "
                    f"{min_training_samples} validated transactions for training."
                ),
                "n_available": n,
                "n_required": min_training_samples,
            },
        )

    train_df, test_df, _ = stratified_split(df, label_col, 0.2, seed)
    train_df = _balanced_weights(train_df, label_col)

    indexer = StringIndexer(
        inputCol=label_col, outputCol="_label", handleInvalid="keep"
    )
    rf = RandomForestClassifier(
        featuresCol="features",
        labelCol="_label",
        weightCol="_weight",
        numTrees=200,
        maxDepth=15,
        minInstancesPerNode=5,
        featureSubsetStrategy="sqrt",
        seed=seed,
    )
    pipeline = Pipeline(stages=[*build_feature_pipeline(), indexer, rf])
    model = pipeline.fit(train_df)

    labels = model.stages[-2].labelsArray[0]
    predictions = model.transform(test_df.withColumn("_weight", lit(1.0)))
    predictions = predictions.withColumn(
        "_label_values", F.array([lit(x) for x in labels])
    ).withColumn(
        "predicted_label",
        F.element_at(col("_label_values"), col("prediction").cast("int") + 1),
    )
    predictions = predictions.cache()

    metrics = _classification_metrics(predictions, label_col)
    top5 = [
        r[label_col]
        for r in df.groupBy(label_col)
        .count()
        .orderBy(col("count").desc(), col(label_col))
        .limit(5)
        .collect()
    ]
    metrics["calibration"] = _calibration_curves(predictions, label_col, top5)
    n_train, n_test = train_df.count(), test_df.count()
    metrics.update(
        {
            "model_version": model_version,
            "n_train_samples": n_train,
            "n_test_samples": n_test,
            "n_classes": len(labels),
            "status": "trained",
        }
    )
    predictions.unpersist()
    return TrainResult(
        status="trained",
        model_version=model_version,
        model=model,
        metrics=metrics,
        n_train=n_train,
        n_test=n_test,
    )


def predict_categories(
    model: PipelineModel,
    df_uncategorized: DataFrame,
    model_version: str,
    confidence_threshold: float,
    now: dt.datetime | None = None,
) -> DataFrame:
    """Score uncategorized rows (M11-M12, classifier_predict.py:100-146).

    NaN fills, transform, max class probability as confidence,
    '< threshold → UNCERTAIN', stamped version + timestamp. Returns the
    input columns + the four prediction columns.
    """
    now = now or dt.datetime.utcnow()
    df = df_uncategorized.filter(col("amount").isNotNull())
    df = df.na.fill({TEXT_FEATURE: ""}).na.fill({c: 0 for c in NUMERICAL_FEATURES})
    df = df.withColumn("amount", col("amount").cast("double")).withColumn(
        "_weight", lit(1.0)
    )

    labels = model.stages[-2].labelsArray[0]
    scored = model.transform(df)
    scored = scored.withColumn("_probs", vector_to_array("probability"))
    scored = scored.withColumn("_maxp", F.array_max("_probs"))
    scored = scored.withColumn(
        "_pred_label",
        F.element_at(
            F.array([lit(x) for x in labels]), col("prediction").cast("int") + 1
        ),
    )
    out_cols = [
        c
        for c in df_uncategorized.columns
        if c
        not in (
            "predicted_master_category",
            "prediction_confidence",
            "model_version",
            "prediction_timestamp",
        )
    ]
    return scored.select(
        *out_cols,
        F.when(col("_maxp") < confidence_threshold, lit("UNCERTAIN"))
        .otherwise(col("_pred_label"))
        .alias("predicted_master_category"),
        col("_maxp").cast("decimal(9,6)").alias("prediction_confidence"),
        lit(model_version).alias("model_version"),
        lit(now).alias("prediction_timestamp"),
    )
