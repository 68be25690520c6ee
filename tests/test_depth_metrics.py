"""Depth-map metric evaluation (reference evaluations/precision.py)."""

import numpy as np

from cds_mvsnet_tpu.eval.depth_metrics import eval_depth_map


def test_eval_depth_map_known_values():
    gt = np.full((10, 10), 100.0, np.float32)
    est = gt.copy()
    est[0, :5] += 0.5   # 5 px at 0.5mm
    est[1, :5] += 3.0   # 5 px at 3mm
    est[2, :2] += 10.0  # 2 px at 10mm
    m = eval_depth_map(est, gt)
    errs = np.zeros(100); errs[:5] = 0.5; errs[5:10] = 3.0; errs[10:12] = 10.0
    np.testing.assert_allclose(m.mae, errs.mean(), rtol=1e-6)
    np.testing.assert_allclose(m.rmse, np.sqrt((errs**2).mean()), rtol=1e-6)
    np.testing.assert_allclose(m.inlier_1mm, (errs < 1).mean())
    np.testing.assert_allclose(m.inlier_2mm, (errs < 2).mean())
    np.testing.assert_allclose(m.inlier_4mm, (errs < 4).mean())
    assert m.n_pixels == 100


def test_eval_depth_map_mask_and_resize():
    gt = np.full((20, 20), 50.0, np.float32)
    gt[:10] = 0.0  # invalid GT region excluded
    est = np.full((10, 10), 51.0, np.float32)  # half resolution
    mask = np.ones((20, 20), np.float32)
    mask[:, :10] = 0.0  # mask half the columns
    m = eval_depth_map(est, gt, mask)
    assert m.n_pixels == 5 * 5  # valid gt rows x unmasked cols at est res
    np.testing.assert_allclose(m.mae, 1.0)
    assert m.inlier_1mm == 0.0 and m.inlier_2mm == 1.0
