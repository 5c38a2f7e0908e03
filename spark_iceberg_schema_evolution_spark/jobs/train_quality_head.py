"""Quality-classifier training job — the in-engine replacement for the
export-to-notebook loop behind fastText/FineWeb-Edu-style model
filters: fit a linear head on a labeled corpus, isotonic-calibrate its
scores, persist the model as plain JSON, and (optionally) score a
target corpus with the frozen head — every step distributed, nothing
but the (dim+1)-sized model on the driver.

    python -m spark_iceberg_schema_evolution_spark.jobs.train_quality_head \
        --labels labeled.parquet --label-col label --output out_dir \
        [--vec-col embedding | --hash-dim 256]  [--n-iter 50 --lr 0.5 --l2 0.0] \
        [--calibration-bins 100] [--score corpus.parquet --threshold 0.5]

Stages (one auditable artifact each, the curate_corpus discipline):
1. featurize — if ``--hash-dim`` is set, raw text vectorizes via the
   feature-hashing trick (``text.hashed_features``; no embedding model
   needed); otherwise ``--vec-col`` is used as-is.
2. train — ``similarity.logreg_fit`` full-batch gradient descent
   (each step one hash aggregate; weights ride the plan as literals).
3. calibrate — ``stats.isotonic_fit`` (one corpus aggregate +
   driver-side PAV over bounded bins).
4. persist — ``model.json`` carries weights/bias/loss + the isotonic
   vector + the featurization config, portable outside Spark.
5. score (optional) — the frozen head + calibration applied to a
   target corpus as a zero-shuffle map; kept rows written as parquet.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="train_quality_head")
    p.add_argument("--labels", required=True, help="labeled parquet")
    p.add_argument("--label-col", default="label")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument(
        "--vec-col", default="embedding",
        help="feature vector column (ignored when --hash-dim is set)",
    )
    p.add_argument(
        "--hash-dim", type=int, default=0,
        help="featurize raw --text-col via the hashing trick instead "
        "of using --vec-col (0 = off)",
    )
    p.add_argument("--text-col", default="text")
    p.add_argument("--n-iter", type=int, default=50)
    p.add_argument("--lr", type=float, default=0.5)
    p.add_argument("--l2", type=float, default=0.0)
    p.add_argument("--calibration-bins", type=int, default=100)
    p.add_argument("--output", required=True)
    p.add_argument(
        "--score", default=None,
        help="corpus parquet to score with the frozen head",
    )
    p.add_argument(
        "--threshold", type=float, default=None,
        help="keep only rows with calibrated score >= threshold "
        "(default: write all rows with scores)",
    )
    return p


def train(spark, args) -> dict:
    from pyspark.sql import functions as F

    from spark_iceberg_schema_evolution_spark.operators.similarity import (
        linear_classifier_score,
        logreg_fit,
    )
    from spark_iceberg_schema_evolution_spark.operators.stats import (
        isotonic_apply,
        isotonic_fit,
    )

    labeled = spark.read.parquet(args.labels)
    vec_col = args.vec_col

    def featurize(df):
        if not args.hash_dim:
            return df, vec_col
        from spark_iceberg_schema_evolution_spark.operators.text import (
            hashed_features,
        )

        feats = hashed_features(
            df, dim=args.hash_dim, id_col=args.id_col,
            text_col=args.text_col,
        )
        keep = [c for c in df.columns if c != "features"]
        return df.select(*keep).join(feats, args.id_col), "features"

    labeled, feat_col = featurize(labeled)

    model = logreg_fit(
        labeled,
        args.label_col,
        vec_col=feat_col,
        n_iter=args.n_iter,
        lr=args.lr,
        l2=args.l2,
    )
    scored = linear_classifier_score(
        labeled, model["weights"], model["bias"], vec_col=feat_col
    )
    cal = isotonic_fit(
        scored, "clf_score", args.label_col, n_bins=args.calibration_bins
    )

    os.makedirs(args.output, exist_ok=True)
    payload = {
        "featurization": {
            "hash_dim": args.hash_dim,
            "text_col": args.text_col if args.hash_dim else None,
            "vec_col": None if args.hash_dim else vec_col,
        },
        "logreg": model,
        "isotonic": {k: cal[k] for k in ("n_bins", "values")},
        "calibration_fit": {
            "n_fit": cal["n_fit"], "n_skipped": cal["n_skipped"],
        },
    }
    with open(os.path.join(args.output, "model.json"), "w") as f:
        json.dump(payload, f)

    report = {
        "n_train": model["n_train"],
        "n_skipped": model["n_skipped"],
        "loss": model["loss"],
        "dim": model["dim"],
    }

    if args.score:
        corpus = spark.read.parquet(args.score)
        corpus, feat_col2 = featurize(corpus)
        out = isotonic_apply(
            linear_classifier_score(
                corpus, model["weights"], model["bias"], vec_col=feat_col2
            ),
            cal,
            "clf_score",
        )
        if args.threshold is not None:
            out = out.where(F.col("calibrated") >= args.threshold)
        out = out.drop(feat_col2) if args.hash_dim else out
        dest = os.path.join(args.output, "scored")
        out.write.mode("overwrite").parquet(dest)
        report["n_scored"] = spark.read.parquet(dest).count()
    return report


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from spark_iceberg_schema_evolution_spark.session import get_spark

    spark = get_spark()
    report = train(spark, args)
    for k, v in report.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
