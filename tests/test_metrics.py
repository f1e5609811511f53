"""Metric suite vs hand-computed values."""

import numpy as np

from lidiff_tpu.utils.histogram_metrics import (compute_hist_metrics,
                                                compute_jsd,
                                                histogram_point_cloud)
from lidiff_tpu.utils.metrics import (ChamferDistance, CompletionIoU,
                                      PrecisionRecall, RMSE, nn_distance)


def test_nn_distance_simple():
    a = np.array([[0, 0, 0], [1, 0, 0]], float)
    b = np.array([[0, 0, 0.5]], float)
    d = nn_distance(a, b)
    np.testing.assert_allclose(d, [0.5, np.sqrt(1.25)], rtol=1e-6)


def test_chamfer_symmetric():
    gt = np.array([[0, 0, 0], [2, 0, 0]], float)
    pred = np.array([[1, 0, 0]], float)
    cd = ChamferDistance()
    cd.update(gt, pred)
    m, s = cd.compute()
    # pred->gt: 1; gt->pred: (1+1)/2 = 1; (1+1)/2 = 1
    np.testing.assert_allclose(m, 1.0)


def test_rmse():
    gt = np.array([[0, 0, 0]], float)
    pred = np.array([[0, 0, 2], [0, 0, 4]], float)
    r = RMSE()
    r.update(gt, pred)
    np.testing.assert_allclose(r.compute()[0], 3.0)


def test_completion_iou_perfect_and_disjoint():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-8, 8, size=(5000, 3))
    # smaller range, same code path: the default +-50 m at 0.1 m drives a
    # 1e9-bin histogram (~3.5 min of numpy) without testing anything more
    iou = CompletionIoU(max_range=10.0)
    iou.update(pts, pts)
    res = iou.compute()
    for v in res.values():
        np.testing.assert_allclose(v, 1.0, atol=1e-6)
    iou2 = CompletionIoU(voxel_sizes=[0.5], max_range=10.0)
    iou2.update(pts, pts + 100.0)      # pred fully out of range
    assert iou2.compute()[0.5] < 1e-6


def test_precision_recall_auc_perfect():
    pts = np.random.default_rng(1).uniform(-5, 5, size=(500, 3))
    pr = PrecisionRecall(0.05, 0.1, 100)
    pr.update(pts, pts)
    p, r, f = pr.compute_auc()
    # reference-parity: per-scan values are percentages, AUC normalized by
    # a perfect predictor of ones -> perfect score is 100
    np.testing.assert_allclose([p, r, f], [100, 100, 100], atol=1e-5)


def test_precision_recall_directionality():
    gt = np.array([[0, 0, 0], [10, 0, 0]], float)
    pred = np.array([[0, 0, 0]], float)
    pr = PrecisionRecall(0.5, 1.0, 3)
    pr.update(gt, pred)
    prs, res, f1s = pr.compute_at_all_thresholds()
    assert prs[0] == 100.0       # every pred point near gt
    assert res[0] == 50.0        # half the gt recovered


def test_jsd_identical_zero():
    pts = np.random.default_rng(2).uniform(-30, 30, size=(2000, 3))
    assert compute_hist_metrics(pts, pts, bev=False) < 1e-9
    assert compute_hist_metrics(pts, pts, bev=True) < 1e-9


def test_jsd_shifted_positive():
    rng = np.random.default_rng(3)
    a = rng.uniform(-30, 0, size=(2000, 3))
    b = rng.uniform(0, 30, size=(2000, 3))
    assert compute_hist_metrics(a, b, bev=True) > 0.5


def test_histogram_bev_clip():
    pts = np.zeros((10, 3))     # all in one voxel
    h = histogram_point_cloud(pts, 0.5, 50.0, bev=True)
    assert h.max() == 1.0       # clipped for BEV
    h3 = histogram_point_cloud(pts, 0.5, 50.0, bev=False)
    assert h3.max() == 10.0
