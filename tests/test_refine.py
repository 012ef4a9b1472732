"""Refinement-MLP stage tests."""

from __future__ import annotations

import numpy as np

from doclayout_yolo_spark.fixtures import PAGES_DDL, generate_pages_pandas
from doclayout_yolo_spark.labelmaps import NC
from doclayout_yolo_spark.pipeline import extract_pages
from doclayout_yolo_spark.refine import mlp_logits, refine_regions
from doclayout_yolo_spark.textfeat import N_FEATURES


def test_mlp_shapes_and_determinism():
    feats = np.random.RandomState(0).rand(17, N_FEATURES).astype(np.float32)
    a = mlp_logits(feats)
    b = mlp_logits(feats)
    assert a.shape == (17, NC) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)


def test_refine_regions_spark(spark):
    pdf = generate_pages_pandas(12)
    df = spark.createDataFrame(pdf, schema=PAGES_DDL)
    extracted = extract_pages(df, n_buckets=8)
    refined = refine_regions(extracted).collect()
    n_regions = sum(r["n_regions"] for r in extracted.collect())
    assert len(refined) == n_regions
    assert all(0 <= r["refined_cls"] < NC for r in refined)
    # region_text slicing must have fed real text (scores vary)
    scores = {round(r["refined_score"], 4) for r in refined}
    assert len(scores) > 3
