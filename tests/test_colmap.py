"""COLMAP converter on a synthesized text model (reference colmap2mvsnet.py
semantics: depth ranges from sparse-point z-quantiles, exp-scored pair.txt).
"""

import numpy as np
import pytest

from cds_mvsnet_tpu.data.colmap import convert_scene, qvec2rotmat, read_colmap_model
from cds_mvsnet_tpu.io.cams import read_cam_file


@pytest.fixture
def workspace(tmp_path):
    sparse = tmp_path / "sparse"
    sparse.mkdir()
    # two PINHOLE cameras, three images on a small lateral baseline
    (sparse / "cameras.txt").write_text(
        "# comment\n"
        "1 PINHOLE 640 480 500 500 320 240\n"
        "2 PINHOLE 640 480 520 520 320 240\n"
    )
    rng = np.random.default_rng(0)
    pts = rng.uniform([-1, -1, 8], [1, 1, 12], (40, 3))  # z in [8, 12]
    img_lines = []
    for iid in range(1, 4):
        tx = 0.3 * (iid - 2)
        # identity rotation, lateral translation
        img_lines.append(f"{iid} 1 0 0 0 {tx} 0 0 {1 if iid < 3 else 2} im{iid}.jpg")
        obs = " ".join(
            f"{100.0 + j} {90.0 + j} {j + 1}" for j in range(len(pts))
        )
        # one unmatched observation (-1 id) like real COLMAP output
        img_lines.append(obs + " 5.0 5.0 -1")
    (sparse / "images.txt").write_text("\n".join(img_lines) + "\n")
    (sparse / "points3D.txt").write_text(
        "\n".join(
            f"{j + 1} {p[0]} {p[1]} {p[2]} 200 200 200 0.5 " for j, p in enumerate(pts)
        )
        + "\n"
    )
    return tmp_path


def test_read_txt_model(workspace):
    cams, images, pts = read_colmap_model(str(workspace / "sparse"), ".txt")
    assert set(cams) == {1, 2} and len(images) == 3 and len(pts) == 40
    np.testing.assert_allclose(qvec2rotmat(np.array([1.0, 0, 0, 0])), np.eye(3))
    assert (images[1].point3d_ids == -1).sum() == 1


def test_convert_scene_outputs(workspace, tmp_path):
    out = tmp_path / "mvs"
    n = convert_scene(
        str(workspace), str(out), max_d=96, interval_scale=1.06,
        model_ext=".txt", convert_images=False,
    )
    assert n == 3

    cam = read_cam_file(out / "cams" / "00000000_cam.txt")
    # identity rotation, t = (-0.3, 0, 0)
    np.testing.assert_allclose(cam.extrinsic[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(cam.extrinsic[0, 3], -0.3, atol=1e-12)
    np.testing.assert_allclose(cam.intrinsic[0, 0], 500.0)
    # depth range from the z in [8, 12] point cloud
    dmin, dint, dnum, dmax = cam.depth_min, cam.depth_interval, cam.num_depth, cam.depth_max
    assert 7.5 < dmin < 10.0 < dmax < 12.5 and dnum == 96
    np.testing.assert_allclose(dint, (dmax - dmin) / (96 - 1) / 1.06, rtol=1e-4)

    pair = (out / "pair.txt").read_text().splitlines()
    assert pair[0].strip() == "3"
    # reference quirk preserved (colmap2mvsnet.py:412-413): the top-10
    # argsort runs over the FULL score row, so a tiny scene lists the ref
    # view itself as its last source with score 0
    for v in range(3):
        ref = int(pair[1 + 2 * v])
        srcs = pair[2 + 2 * v].split()
        assert ref == v and int(srcs[0]) == 3
        ids = [int(srcs[k]) for k in range(1, len(srcs), 2)]
        scores = [float(srcs[k]) for k in range(2, len(srcs), 2)]
        assert ids[-1] == v and scores[-1] == 0.0  # self, zero score, last
        assert all(s > 0 for s in scores[:-1])
        assert set(ids) == {0, 1, 2}
