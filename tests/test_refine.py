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


def test_feature_matrix_bit_identical_to_per_row():
    import numpy as np
    import pandas as pd

    from doclayout_yolo_spark.textfeat import feature_matrix, feature_vector

    texts = ["", "Hello World 42!", "the and of to",
             "Figure 1. A caption?!?",
             "COOKIE subscribe\ttabs\nnewlines  multi   space",
             "=+\\sum\\frac", "x" * 500,
             "Table: total row note source: eq. equation item first"]
    rng = np.random.RandomState(0)
    x1 = rng.rand(len(texts)) * 900
    y1 = rng.rand(len(texts)) * 1000
    x2 = x1 + rng.rand(len(texts)) * 100
    y2 = y1 + rng.rand(len(texts)) * 50
    ph = rng.rand(len(texts)) * 2000 + 500
    mat = feature_matrix(pd.Series(texts), x1, y1, x2, y2, 960.0, ph)
    for i, t in enumerate(texts):
        v = feature_vector(t, (x1[i], y1[i], x2[i], y2[i]), (960.0, ph[i]))
        assert (mat[i] == v).all(), (i, t)
