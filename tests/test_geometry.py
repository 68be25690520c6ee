import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cds_mvsnet_tpu.ops.geometry import (
    compose_projection,
    epipole_from_fundamental,
    fundamental_matrix,
    homography_warp,
    skew_matrix,
)


def make_cams(rng, batch=3):
    """Random but realistic stereo camera pairs (general motion)."""
    cams = []
    for _ in range(batch):
        f = rng.uniform(400, 1200)
        K = np.array([[f, 0, rng.uniform(100, 400)], [0, f, rng.uniform(100, 300)], [0, 0, 1]])
        angle = rng.uniform(-0.3, 0.3, 3)

        def rot(a):
            cx, cy, cz = np.cos(a)
            sx, sy, sz = np.sin(a)
            Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            return Rz @ Ry @ Rx

        R = rot(angle)
        t = rng.uniform(-2, 2, 3) + np.array([0.1, 0.2, 5.0])
        cam = np.zeros((2, 4, 4), dtype=np.float32)
        cam[0, :3, :3] = R
        cam[0, :3, 3] = t
        cam[0, 3, 3] = 1
        cam[1, :3, :3] = K
        cams.append(cam)
    return np.stack(cams).astype(np.float32)


def test_skew_matrix_cross_product():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((4, 3)).astype(np.float32)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    S = np.asarray(skew_matrix(jnp.asarray(v)))
    np.testing.assert_allclose((S @ w[..., None])[..., 0], np.cross(v, w), atol=1e-5)


def test_fundamental_matrix_epipolar_constraint():
    """x2^T F x1 = 0 for projections of the same 3D point."""
    rng = np.random.default_rng(1)
    cams1 = make_cams(rng)
    cams2 = make_cams(rng)
    F = np.asarray(fundamental_matrix(jnp.asarray(cams1), jnp.asarray(cams2)))
    pts = rng.uniform(-1, 1, (len(cams1), 10, 3)) + np.array([0, 0, 12.0])
    for b in range(len(cams1)):
        for p in pts[b]:
            x1h = cams1[b, 1, :3, :3] @ (cams1[b, 0, :3, :3] @ p + cams1[b, 0, :3, 3])
            x2h = cams2[b, 1, :3, :3] @ (cams2[b, 0, :3, :3] @ p + cams2[b, 0, :3, 3])
            x1 = x1h / x1h[2]
            x2 = x2h / x2h[2]
            scale = np.abs(F[b]).max() * np.linalg.norm(x1) * np.linalg.norm(x2)
            assert abs(x2 @ F[b] @ x1) / scale < 1e-5


def test_epipole_nullspace():
    """F @ [e; 1] ≈ 0 — the epipole is the right null direction of F."""
    rng = np.random.default_rng(2)
    cams1 = make_cams(rng)
    cams2 = make_cams(rng)
    F = np.asarray(fundamental_matrix(jnp.asarray(cams1), jnp.asarray(cams2)))
    e = np.asarray(epipole_from_fundamental(jnp.asarray(F)))
    for b in range(len(F)):
        eh = np.array([e[b, 0], e[b, 1], 1.0])
        resid = np.abs(F[b] @ eh) / (np.abs(F[b]).max() * max(1.0, np.abs(eh).max()))
        assert resid.max() < 1e-3


def test_epipole_singular_case_is_finite():
    """Pure-sideways translation puts the epipole at infinity; the reference
    crashes (SURVEY §2.5) — we must stay finite."""
    K = np.eye(3, dtype=np.float32) * 500
    K[2, 2] = 1
    cam1 = np.zeros((1, 2, 4, 4), dtype=np.float32)
    cam1[0, 0] = np.eye(4)
    cam1[0, 1, :3, :3] = K
    cam2 = cam1.copy()
    cam2[0, 0, 0, 3] = 1.0  # translate along x only
    F = fundamental_matrix(jnp.asarray(cam1), jnp.asarray(cam2))
    e = np.asarray(epipole_from_fundamental(F))
    assert np.isfinite(e).all()


def test_fundamental_and_epipole_match_reference(reference_modules):
    dc = reference_modules["models.dynamic_conv"]
    rng = np.random.default_rng(3)
    cams1 = make_cams(rng)
    cams2 = make_cams(rng)
    want_F = dc.compute_Fmatrix(torch.from_numpy(cams1), torch.from_numpy(cams2))
    want_e = dc.compute_epipole(want_F).numpy()
    got_F = np.asarray(fundamental_matrix(jnp.asarray(cams1), jnp.asarray(cams2)))
    np.testing.assert_allclose(got_F, want_F.numpy(), rtol=2e-3, atol=1e-4 * np.abs(want_F.numpy()).max())
    got_e = np.asarray(epipole_from_fundamental(jnp.asarray(want_F.numpy())))
    np.testing.assert_allclose(got_e, want_e, rtol=2e-3, atol=1e-2)


def test_compose_projection_matches_reference():
    rng = np.random.default_rng(4)
    cams = make_cams(rng)
    got = np.asarray(compose_projection(jnp.asarray(cams)))
    want = cams[:, 0].copy()
    want[:, :3, :4] = cams[:, 1, :3, :3] @ cams[:, 0, :3, :4]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("per_pixel", [False, True])
def test_homography_warp_matches_reference(reference_modules, per_pixel):
    warping = reference_modules["models.utils.warping"]
    rng = np.random.default_rng(5)
    B, C, H, W, D = 2, 4, 16, 24, 6
    src = rng.standard_normal((B, C, H, W)).astype(np.float32)
    cams_ref = make_cams(rng, B)
    cams_src = make_cams(rng, B)
    ref_proj = np.asarray(compose_projection(jnp.asarray(cams_ref)))
    src_proj = np.asarray(compose_projection(jnp.asarray(cams_src)))
    if per_pixel:
        depth = (8.0 + rng.uniform(0, 4, (B, D, H, W))).astype(np.float32)
    else:
        depth = np.linspace(6, 14, D, dtype=np.float32)[None].repeat(B, 0)

    want = warping.homo_warping_3D(
        torch.from_numpy(src),
        torch.from_numpy(src_proj),
        torch.from_numpy(ref_proj),
        torch.from_numpy(depth),
    ).numpy()  # (B, C, D, H, W)

    got = homography_warp(
        jnp.asarray(src.transpose(0, 2, 3, 1)),
        jnp.asarray(cams_ref),
        jnp.asarray(cams_src),
        jnp.asarray(depth),
    )  # (B, D, H, W, C)
    got_t = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got_t, want, rtol=1e-3, atol=2e-3)
