import numpy as np

from cds_mvsnet_tpu.io.cams import pack_cam, read_cam_file, read_pair_file, write_cam_file
from cds_mvsnet_tpu.io.pfm import read_pfm, write_pfm
from cds_mvsnet_tpu.io.ply import read_ply, write_ply


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    depth = rng.uniform(400, 900, (12, 17)).astype(np.float32)
    write_pfm(tmp_path / "d.pfm", depth)
    back, scale = read_pfm(tmp_path / "d.pfm")
    np.testing.assert_array_equal(back, depth)
    assert scale == 1.0

    rgb = rng.standard_normal((8, 9, 3)).astype(np.float32)
    write_pfm(tmp_path / "c.pfm", rgb)
    back, _ = read_pfm(tmp_path / "c.pfm")
    np.testing.assert_array_equal(back, rgb)


def test_pfm_matches_reference_reader(tmp_path, reference_modules):
    import sys

    sys.path.insert(0, "/root/reference")
    from datasets.data_io import read_pfm as ref_read, save_pfm as ref_save

    rng = np.random.default_rng(1)
    depth = rng.uniform(1, 10, (6, 8)).astype(np.float32)
    ref_save(str(tmp_path / "ref.pfm"), depth)
    ours, _ = read_pfm(tmp_path / "ref.pfm")
    np.testing.assert_array_equal(ours, depth)

    write_pfm(tmp_path / "ours.pfm", depth)
    theirs, _ = ref_read(str(tmp_path / "ours.pfm"))
    np.testing.assert_array_equal(np.asarray(theirs), depth)
    sys.path.remove("/root/reference")


def test_cam_file_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    extr = np.eye(4, dtype=np.float32)
    extr[:3, 3] = [1, 2, 3]
    intr = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1]], dtype=np.float32)
    cam = pack_cam(extr, intr)
    cam[1, 3] = [425.0, 2.5, 192.0, 905.0]
    write_cam_file(tmp_path / "cam.txt", cam)
    back = read_cam_file(tmp_path / "cam.txt")
    np.testing.assert_allclose(back.extrinsic, extr, atol=1e-5)
    np.testing.assert_allclose(back.intrinsic, intr, atol=1e-3)
    assert back.depth_min == 425.0 and back.depth_interval == 2.5
    assert back.num_depth == 192.0 and back.depth_max == 905.0


def test_pair_file(tmp_path):
    (tmp_path / "pair.txt").write_text(
        "2\n0\n3 1 2.0 2 1.5 3 1.0\n1\n2 0 2.0 2 1.5\n"
    )
    pairs = read_pair_file(tmp_path / "pair.txt")
    assert pairs == [(0, [1, 2, 3]), (1, [0, 2])]


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (100, 3), dtype=np.uint8)
    write_ply(tmp_path / "pc.ply", pts, cols)
    back_pts, back_cols = read_ply(tmp_path / "pc.ply")
    np.testing.assert_array_equal(back_pts, pts)
    np.testing.assert_array_equal(back_cols, cols)
