"""Dataset/loader tests against synthetic scene directories."""

import numpy as np
import pytest
from PIL import Image

from cds_mvsnet_tpu.data.eval_set import EvalDataset
from cds_mvsnet_tpu.data.image import resize_bilinear_np, resize_nearest_np
from cds_mvsnet_tpu.data.loader import DataLoader
from cds_mvsnet_tpu.io.pfm import write_pfm


def _write_cam(path, f=600.0, tz=0.0):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        "extrinsic\n"
        + "1 0 0 0 \n0 1 0 0 \n0 0 1 " + str(tz) + " \n0 0 0 1 \n"
        + "\nintrinsic\n"
        + f"{f} 0 320 \n0 {f} 240 \n0 0 1 \n"
        + "\n425.0 2.5 192 905.0\n"
    )


@pytest.fixture
def eval_scene(tmp_path):
    rng = np.random.default_rng(0)
    scan = tmp_path / "scan1"
    (scan / "images").mkdir(parents=True)
    n = 4
    for v in range(n):
        img = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
        Image.fromarray(img).save(scan / "images" / f"{v:0>8}.jpg")
        _write_cam(scan / "cams" / f"{v:0>8}_cam.txt", tz=0.1 * v)
    pair_lines = [str(n)]
    for v in range(n):
        srcs = [s for s in range(n) if s != v]
        pair_lines.append(str(v))
        pair_lines.append(f"{len(srcs)} " + " ".join(f"{s} {2.0 - 0.1*s}" for s in srcs))
    (scan / "pair.txt").write_text("\n".join(pair_lines) + "\n")
    return tmp_path


def test_eval_dataset_shapes_and_intrinsics(eval_scene):
    ds = EvalDataset(str(eval_scene), ["scan1"], nviews=3, ndepths=64,
                     max_h=256, max_w=320, dataset="dtu", refine=True)
    assert len(ds) == 4
    s = ds[0]
    assert s["imgs"].shape == (3, 256, 320, 3)
    assert s["depth_values"].shape == (64,)
    assert set(s["proj_matrices"]) == {"stage1", "stage2", "stage3", "stage4"}
    # cam-file intrinsics are /4; stage4 = base * 4 restores the scaled full-res
    # fx: 600/4 * (320/640) * 4 = 300
    np.testing.assert_allclose(s["proj_matrices"]["stage4"][0, 1, 0, 0], 300.0, rtol=1e-5)
    np.testing.assert_allclose(
        s["proj_matrices"]["stage1"][0, 1, 0, 0],
        s["proj_matrices"]["stage2"][0, 1, 0, 0] / 2,
    )
    assert s["filename"] == "scan1/{}/00000000{}"


def test_eval_dataset_skips_zero_source_metas(eval_scene):
    # Append a ref view with an empty source list (real COLMAP/T&T pair.txt
    # files contain these); the reference filters them (general_eval.py:49-54).
    pair = eval_scene / "scan1" / "pair.txt"
    lines = pair.read_text().strip().split("\n")
    lines[0] = "5"
    lines += ["4", "0"]
    pair.write_text("\n".join(lines) + "\n")
    ds = EvalDataset(str(eval_scene), ["scan1"], nviews=3, ndepths=64,
                     max_h=256, max_w=320, dataset="dtu", refine=True)
    assert len(ds) == 4  # the 0-source meta is dropped, not crashed on
    assert all(len(m[2]) == 2 for m in ds.metas)


def test_eval_dataset_no_refine_stages(eval_scene):
    ds = EvalDataset(str(eval_scene), ["scan1"], nviews=3, ndepths=64,
                     max_h=256, max_w=320, dataset="dtu", refine=False)
    s = ds[0]
    assert set(s["proj_matrices"]) == {"stage1", "stage2", "stage3"}


def test_loader_batching_and_prefetch(eval_scene):
    ds = EvalDataset(str(eval_scene), ["scan1"], nviews=3, ndepths=64,
                     max_h=256, max_w=320, dataset="dtu", refine=True)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["imgs"].shape == (2, 3, 256, 320, 3)
    assert batches[0]["filename"] == ["scan1/{}/00000000{}", "scan1/{}/00000001{}"]


def test_loader_propagates_worker_errors(eval_scene):
    class Broken:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(Broken(), batch_size=1))


def test_numpy_resize_matches_cv2_semantics():
    """Index-math checks (cv2 unavailable here; formulas per its docs)."""
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    # nearest 4->2: picks rows/cols 0, 2
    out = resize_nearest_np(img, (2, 2))
    np.testing.assert_array_equal(out, [[0, 2], [8, 10]])
    # bilinear 2x upscale keeps corners-ish (half-pixel): constant image stays
    const = np.full((5, 7), 3.25, np.float32)
    np.testing.assert_allclose(resize_bilinear_np(const, (10, 14)), 3.25)
