"""Depth-map metric evaluation (reference evaluations/precision.py)."""

import numpy as np
from PIL import Image

from cds_mvsnet_tpu.eval.depth_metrics import DepthEvaluation, eval_depth_map
from cds_mvsnet_tpu.io.pfm import write_pfm


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


def test_depth_evaluation_comparison_harness(tmp_path):
    """precision.py:16-119 parity: layout discovery, GT/mask nearest-resize
    to the eval resolution, per-view metric averaging."""
    rng = np.random.default_rng(3)
    gt_root = tmp_path / "Depths_raw"
    out_root = tmp_path / "outputs"
    H, W = 32, 40  # GT stored at 2x the eval resolution
    h, w = 16, 20
    scenes, n_views = ["scan1", "scan2"], 3
    expect_mae = []
    for scene in scenes:
        (gt_root / scene).mkdir(parents=True)
        est_dir = out_root / scene / "depth_est"
        est_dir.mkdir(parents=True)
        for idx in range(n_views):
            gt_hr = rng.uniform(400, 900, (H, W)).astype(np.float32)
            write_pfm(gt_root / scene / f"depth_map_{idx:0>4}.pfm", gt_hr)
            mask_hr = (rng.uniform(0, 1, (H, W)) > 0.3).astype(np.uint8) * 255
            Image.fromarray(mask_hr).save(gt_root / scene / f"depth_visual_{idx:0>4}.png")
            gt_lr = gt_hr[::2, ::2]
            err = rng.uniform(0, 3, (h, w)).astype(np.float32)
            write_pfm(est_dir / f"{idx:0>8}.pfm", gt_lr + err)
            valid = mask_hr[::2, ::2] > 10
            expect_mae.append(float(err[valid].mean()))

    ev = DepthEvaluation(str(gt_root), str(out_root), scenes, method="casmvsnet")
    assert len(ev.est_depths) == len(scenes) * n_views
    m = ev.eval(max_h=h, max_w=w)
    np.testing.assert_allclose(m["MAE"], np.mean(expect_mae), rtol=1e-5)
    assert 0.0 < m["thresh1mm_error"] < m["thresh2mm_error"] <= 1.0
    assert m["thresh4mm_error"] > 0.9  # errors are uniform in [0, 3)

    table = ev.eval_resolutions([(h, w)])
    assert table[(h, w)]["MAE"] == m["MAE"]


def test_depth_evaluation_mvsnet_layout(tmp_path):
    """mvsnet/rmvsnet layout: indices discovered from *_prob files."""
    gt_root = tmp_path / "gt"
    (gt_root / "scanA").mkdir(parents=True)
    est_dir = tmp_path / "in" / "scanA" / "depths_mvsnet"
    est_dir.mkdir(parents=True)
    gt = np.full((8, 8), 500.0, np.float32)
    for idx in (0, 2):
        write_pfm(gt_root / "scanA" / f"depth_map_{idx:0>4}.pfm", gt)
        Image.fromarray(np.full((8, 8), 255, np.uint8)).save(
            gt_root / "scanA" / f"depth_visual_{idx:0>4}.png"
        )
        write_pfm(est_dir / f"{idx:0>8}_init.pfm", gt + 1.5)
        write_pfm(est_dir / f"{idx:0>8}_prob.pfm", np.ones((8, 8), np.float32))
    ev = DepthEvaluation(str(gt_root), str(tmp_path / "in"), ["scanA"], method="mvsnet")
    assert [p.endswith("_init.pfm") for p in ev.est_depths] == [True, True]
    m = ev.eval(max_h=8, max_w=8)
    np.testing.assert_allclose(m["MAE"], 1.5, rtol=1e-6)
    assert m["thresh1mm_error"] == 0.0 and m["thresh2mm_error"] == 1.0


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
