"""Differentiable fused-warp training route (ops/pallas/warp_vjp.py).

The custom_vjp backward is the exact VJP of the XLA packed-gather
formulation, so gradients through the kernel route must EQUAL the XLA
route's gradients for losses linear in (in_prod, sim); forward values agree
to kernel rounding. Reference scope: warping.py:69-104 under autograd with
the grid at :79 under no_grad.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from cds_mvsnet_tpu.ops.geometry import plane_sweep_coords
from cds_mvsnet_tpu.ops.pallas.warp_vjp import _xla_impl, fused_warp_train

C, H, W, D = 8, 16, 40, 4


def _rig(seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    feats = np.stack(
        [np.sin(xx / (3.0 + c) + k) * np.cos(yy / (4.0 + c)) for k in range(2) for c in range(C)]
    ).reshape(2, C, H, W).astype(np.float32)
    src = jnp.asarray(feats[0]).astype(jnp.bfloat16)
    ref = jnp.asarray(feats[1]).astype(jnp.bfloat16)

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 50.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    ref_cam = np.zeros((2, 4, 4), np.float32)
    src_cam = np.zeros((2, 4, 4), np.float32)
    ref_cam[0] = np.eye(4)
    E = np.eye(4, dtype=np.float32)
    E[0, 3] = 0.4
    src_cam[0] = E
    ref_cam[1] = K
    src_cam[1] = K
    dep = jnp.asarray(
        np.broadcast_to(
            np.linspace(8.0, 12.0, D, dtype=np.float32)[:, None, None], (D, H, W)
        ).copy()
    )
    return src, ref, dep, jnp.asarray(ref_cam), jnp.asarray(src_cam)


def test_forward_matches_xla_impl():
    src, ref, dep, ref_cam, src_cam = _rig()
    ip_k, sim_k = fused_warp_train(src, ref, dep, ref_cam, src_cam, 8, 4, True)
    px, py = plane_sweep_coords(ref_cam[None], src_cam[None], dep[None], H, W)
    ip_x, sim_x = _xla_impl(src, ref, px[0].reshape(-1), py[0].reshape(-1))
    np.testing.assert_allclose(np.asarray(ip_k), np.asarray(ip_x), atol=2e-2)
    np.testing.assert_allclose(np.asarray(sim_k), np.asarray(sim_x), atol=5e-2)


def test_gradients_equal_xla_route():
    """Loss linear in (in_prod, sim) → identical cotangents → the kernel
    route's gradients equal the XLA route's exactly."""
    src, ref, dep, ref_cam, src_cam = _rig()
    rng = np.random.default_rng(3)
    w_ip = jnp.asarray(rng.standard_normal((C, D, H, W)).astype(np.float32))
    w_sim = jnp.asarray(rng.standard_normal((D, H, W)).astype(np.float32))
    px, py = plane_sweep_coords(ref_cam[None], src_cam[None], dep[None], H, W)

    def loss_k(s, r):
        ip, sim = fused_warp_train(s, r, dep, ref_cam, src_cam, 8, 4, True)
        return jnp.sum(ip * w_ip) + jnp.sum(sim * w_sim)

    def loss_x(s, r):
        ip, sim = _xla_impl(s, r, px[0].reshape(-1), py[0].reshape(-1))
        return jnp.sum(ip * w_ip) + jnp.sum(sim * w_sim)

    gk_s, gk_r = jax.grad(loss_k, argnums=(0, 1))(src, ref)
    gx_s, gx_r = jax.grad(loss_x, argnums=(0, 1))(src, ref)
    np.testing.assert_allclose(
        np.asarray(gk_s, np.float32), np.asarray(gx_s, np.float32), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gk_r, np.float32), np.asarray(gx_r, np.float32), rtol=0, atol=1e-5
    )


def test_stage_net_train_route_close(monkeypatch):
    """stage_net train forward + grads through the kernel route stay close
    to the XLA route (values differ only by kernel rounding)."""
    from tests.test_stage_batch import _make_inputs

    from cds_mvsnet_tpu.models.cost_reg import init_cost_reg_net
    from cds_mvsnet_tpu.models.stage_net import init_vis_heads, stage_net

    features, cams, depth_values = _make_inputs(B=2, V=3, C=8, h=32, w=32, D=8)
    features = [
        {k: (f[0].astype(jnp.bfloat16), f[1], f[2]) for k, f in pair.items()}
        for pair in features
    ]
    vis = init_vis_heads(jax.random.PRNGKey(0))
    cr = init_cost_reg_net(jax.random.PRNGKey(1), in_channels=8)

    def run(route):
        monkeypatch.setenv("CDS_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("CDS_TRAIN_WARP", route)

        def loss(feats):
            out = stage_net(vis, cr, feats, cams, depth_values, 2, train=True)
            return (
                jnp.sum(out["depth"]) * 1e-3 + jnp.sum(out["feat_distance"]) * 1e-3,
                out,
            )

        (l, out), g = jax.value_and_grad(loss, has_aux=True)(features)
        return l, out, g

    l_x, out_x, g_x = run("off")
    l_k, out_k, g_k = run("all")
    np.testing.assert_allclose(float(l_k), float(l_x), rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out_k["depth"]), np.asarray(out_x["depth"]), rtol=0, atol=2e-2
    )
    flat_x, _ = jax.flatten_util.ravel_pytree(
        jax.tree.map(lambda a: a.astype(jnp.float32), g_x)
    )
    flat_k, _ = jax.flatten_util.ravel_pytree(
        jax.tree.map(lambda a: a.astype(jnp.float32), g_k)
    )
    rel = float(
        jnp.linalg.norm(flat_k - flat_x) / (jnp.linalg.norm(flat_x) + 1e-12)
    )
    assert rel < 5e-2, rel
