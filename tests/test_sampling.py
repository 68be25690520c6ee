import jax.numpy as jnp
import numpy as np
import torch

from cds_mvsnet_tpu.ops.sampling import (
    confidence_regression,
    depth_regression,
    initial_depth_hypotheses,
    refined_depth_hypotheses,
    softmax_entropy,
)


def test_initial_hypotheses_match_reference(reference_modules):
    module = reference_modules["models.module"]
    rng = np.random.default_rng(0)
    dv = np.sort(rng.uniform(400, 900, (2, 192)).astype(np.float32), axis=1)
    want = module.get_depth_range_samples(
        torch.from_numpy(dv), 48, 1.0, torch.device("cpu"), torch.float32, [2, 8, 10]
    ).numpy()
    got = np.asarray(initial_depth_hypotheses(jnp.asarray(dv), 48))
    np.testing.assert_allclose(got, want[:, :, 0, 0], rtol=1e-5)
    # reference broadcasts spatially — constant along H, W
    assert np.ptp(want, axis=(2, 3)).max() == 0


def test_refined_hypotheses_match_reference(reference_modules):
    module = reference_modules["models.module"]
    rng = np.random.default_rng(1)
    B, H, W, D = 2, 12, 16, 8
    cur = rng.uniform(430, 900, (B, H, W)).astype(np.float32)
    interval = np.array([2.5, 3.0], dtype=np.float32).reshape(B, 1, 1)
    dmin = np.array([425.0, 425.0], dtype=np.float32).reshape(B, 1, 1, 1)
    dmax = np.array([930.0, 910.0], dtype=np.float32).reshape(B, 1, 1, 1)
    want = module.get_depth_range_samples(
        torch.from_numpy(cur),
        D,
        torch.from_numpy(interval),
        torch.device("cpu"),
        torch.float32,
        [B, H, W],
        max_depth=torch.from_numpy(dmax),
        min_depth=torch.from_numpy(dmin),
    ).numpy()
    got = np.asarray(
        refined_depth_hypotheses(
            jnp.asarray(cur), D, jnp.asarray(interval), jnp.asarray(dmin), jnp.asarray(dmax)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)

    # and the spatial downsample path vs torch trilinear
    import torch.nn.functional as F

    want_ds = F.interpolate(
        torch.from_numpy(want).unsqueeze(1), [D, H // 2, W // 2], mode="trilinear", align_corners=False
    ).squeeze(1).numpy()
    got_ds = np.asarray(
        refined_depth_hypotheses(
            jnp.asarray(cur), D, jnp.asarray(interval), jnp.asarray(dmin), jnp.asarray(dmax),
            out_hw=(H // 2, W // 2),
        )
    )
    np.testing.assert_allclose(got_ds, want_ds, rtol=1e-4, atol=1e-2)


def test_depth_and_confidence_regression_match_reference(reference_modules):
    module = reference_modules["models.module"]
    rng = np.random.default_rng(2)
    B, D, H, W = 2, 16, 6, 7
    logits = rng.standard_normal((B, D, H, W)).astype(np.float32) * 3
    prob = torch.softmax(torch.from_numpy(logits), dim=1)
    dv = np.sort(rng.uniform(400, 900, (B, D)).astype(np.float32), axis=1)

    want_depth = module.depth_regression(prob, torch.from_numpy(dv)).numpy()
    got_depth = np.asarray(depth_regression(jnp.asarray(prob.numpy()), jnp.asarray(dv)))
    np.testing.assert_allclose(got_depth, want_depth, rtol=1e-4, atol=1e-2)

    want_conf = module.conf_regression(prob, n=4).numpy()
    got_conf = np.asarray(confidence_regression(jnp.asarray(prob.numpy()), n=4))
    np.testing.assert_allclose(got_conf, want_conf, rtol=1e-4, atol=1e-5)


def test_softmax_entropy_matches_reference_formula():
    rng = np.random.default_rng(3)
    sim = rng.standard_normal((2, 8, 5, 6)).astype(np.float32)
    p = torch.softmax(torch.from_numpy(sim), dim=1)
    want = (-p * torch.log(p)).sum(dim=1, keepdim=True).numpy()
    got = np.asarray(softmax_entropy(jnp.asarray(sim)))
    np.testing.assert_allclose(got, want.transpose(0, 1, 2, 3), rtol=1e-4, atol=1e-5)
