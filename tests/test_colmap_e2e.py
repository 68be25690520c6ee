"""Custom-data loop, end to end (VERDICT r2 next-round #7): synthetic COLMAP
workspace -> data/colmap.convert_scene -> EvalDataset -> inference -> fusion
-> scored point cloud.

Mirrors the reference's real custom-data entry path (colmap2mvsnet.py:295 ->
test.py with --dataset general) on the closed-form sphere scene, so every
artifact the converter writes (cams/ from sparse-point z-quantiles, pair.txt
from exp view scores, images_post/) is consumed by the actual inference +
fusion stack and validated against exact geometry.
"""

import os

import numpy as np
import pytest

from cds_mvsnet_tpu.config import ModelConfig
from cds_mvsnet_tpu.data.colmap import convert_scene
from cds_mvsnet_tpu.data.eval_set import EvalDataset
from cds_mvsnet_tpu.eval.depth_inference import save_depths
from cds_mvsnet_tpu.eval.dtu_benchmark import score_points
from cds_mvsnet_tpu.fusion.pipeline import FusionConfig, fuse_scan
from cds_mvsnet_tpu.io.cams import read_cam_file
from cds_mvsnet_tpu.io.ply import read_ply
from cds_mvsnet_tpu.utils.synthetic import sphere_scene

CKPT = "/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="released checkpoint not available"
)

V, H, W = 5, 256, 320
NDEPTHS = 128


def _rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """COLMAP (w, x, y, z) quaternion from a rotation matrix."""
    K = (
        np.array(
            [
                [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
                [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
                [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
                [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1], R[0, 0] + R[1, 1] + R[2, 2]],
            ]
        )
        / 3.0
    )
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return q if q[0] >= 0 else -q


@pytest.fixture(scope="module")
def colmap_workspace(tmp_path_factory):
    """Sphere scene rendered into a COLMAP dense-workspace layout: images/ +
    sparse/{cameras,images,points3D}.txt with real projected observations."""
    from PIL import Image

    root = tmp_path_factory.mktemp("colmap")
    scene = sphere_scene(V=V, H=H, W=W)
    (root / "images").mkdir()
    (root / "sparse").mkdir()

    f = 1.15 * W
    (root / "sparse" / "cameras.txt").write_text(
        f"# synthetic\n1 PINHOLE {W} {H} {f} {f} {W / 2} {H / 2}\n"
    )

    # sparse cloud: subsample the exact surface points
    rng = np.random.default_rng(0)
    pts = scene["gt_points"][rng.choice(len(scene["gt_points"]), 400, replace=False)]

    img_lines = []
    for v in range(V):
        Image.fromarray((scene["imgs"][v] * 255).astype(np.uint8)).save(
            root / "images" / f"view{v}.jpg", quality=97
        )
        E = scene["cams"][v, 0].astype(np.float64)
        q = _rotmat_to_qvec(E[:3, :3])
        t = E[:3, 3]
        img_lines.append(
            f"{v + 1} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 1 view{v}.jpg"
        )
        # observations: project the sparse points; in-bounds ones are tracked
        pc = (E[:3, :3] @ pts.T).T + t
        uv = pc[:, :2] / pc[:, 2:3] * f + np.array([W / 2, H / 2])
        obs = []
        for j, (u, w_) in enumerate(uv):
            if pc[j, 2] > 0 and 0 <= u < W and 0 <= w_ < H:
                obs.append(f"{u:.2f} {w_:.2f} {j + 1}")
        img_lines.append(" ".join(obs))
    (root / "sparse" / "images.txt").write_text("\n".join(img_lines) + "\n")

    (root / "sparse" / "points3D.txt").write_text(
        "\n".join(
            f"{j + 1} {p[0]} {p[1]} {p[2]} 200 200 200 0.5"
            for j, p in enumerate(pts)
        )
        + "\n"
    )
    return {"root": root, "scene": scene}


@pytest.fixture(scope="module")
def converted(colmap_workspace, tmp_path_factory):
    out = tmp_path_factory.mktemp("mvs") / "scan1"
    n = convert_scene(
        str(colmap_workspace["root"]), str(out), max_d=NDEPTHS, model_ext=".txt"
    )
    assert n == V
    return out


def test_converted_artifacts_consumable(colmap_workspace, converted):
    """cams/, pair.txt and images_post/ load through the real EvalDataset."""
    scene = colmap_workspace["scene"]
    assert sorted(os.listdir(converted / "images_post")) == [
        f"{i:08d}.jpg" for i in range(V)
    ]
    # depth ranges bracket the true scene depths (sparse z-quantile rule)
    cf = read_cam_file(converted / "cams" / "00000000_cam.txt")
    gt = scene["gt_depth"][0]
    assert cf.depth_min < np.quantile(gt, 0.1)
    assert cf.depth_min + cf.num_depth * cf.depth_interval > np.quantile(gt, 0.9)

    ds = EvalDataset(
        datapath=str(converted.parent), scans=["scan1"], nviews=V,
        ndepths=NDEPTHS, interval_scale=1.06, max_h=H, max_w=W,
        dataset="general", refine=False,
    )
    assert len(ds) == V
    sample = ds[0]
    assert sample["imgs"].shape == (V, H, W, 3)


@pytest.fixture(scope="module")
def fused(colmap_workspace, converted, tmp_path_factory):
    from cds_mvsnet_tpu.models.convert import convert_checkpoint

    outdir = tmp_path_factory.mktemp("depths")
    params = convert_checkpoint(CKPT)
    params.pop("refine_network", None)
    save_depths(
        params, ModelConfig(refine=False), datapath=str(converted.parent),
        scans=["scan1"], outdir=str(outdir), nviews=V, ndepths=NDEPTHS,
        interval_scale=1.06, max_h=H, max_w=W, dataset="general",
        verbose=False, num_workers=2, compute_dtype="fp32",
        feature_impl="plain", precision="highest",
    )
    ply = outdir / "fused.ply"
    n = fuse_scan(
        str(converted), str(outdir / "scan1"), str(ply),
        FusionConfig(n_src_views=V - 1, conf_thresholds=(0.0, 0.0, 0.3)),
    )
    assert n > 30_000
    return read_ply(ply)[0]


def test_colmap_pipeline_cloud_quality(colmap_workspace, fused):
    """The cloud produced from COLMAP-converted inputs scores against the
    exact surface (bounds looser than test_e2e_quality: the depth range and
    the view selection now come from the sparse model, not the oracle)."""
    scene = colmap_workspace["scene"]
    s = score_points(fused, scene["gt_points"], dst=0.5)
    assert s["acc_mean"] < 5.0, s
    assert s["acc_median"] < 3.5, s
    assert s["comp_inlier_frac"] > 0.75, s
