"""v9 exit-fusion kernel parity vs the XLA tail (interpret mode on CPU).

The kernel (ops/pallas/regress.py) fuses the prob-head conv, depth softmax,
soft-argmin regression, and windowed confidence (reference
models/module.py:304,373-391) off the s2d UNet exit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cds_mvsnet_tpu.ops.pallas.regress import exit_softargmin
from cds_mvsnet_tpu.ops.s2d import depth_to_space, s2d_conv3d
from cds_mvsnet_tpu.ops.sampling import confidence_regression, depth_regression


def _xla_tail(y, w, b=4):
    D, hq, wq, _ = y.shape
    logit = s2d_conv3d(y[None], w, b_in=b, padding=1)
    cost = depth_to_space(logit.reshape(D, hq, wq, -1), b).reshape(
        1, D, hq * b, wq * b
    )
    prob = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
    idx = depth_regression(prob, jnp.arange(D, dtype=jnp.float32)[None])
    conf = confidence_regression(prob)
    return idx[0], conf[0]


@pytest.mark.parametrize(
    "D,hq,wq,kd,trq",
    [
        (8, 12, 20, None, 4),   # stage3-like, hq % trq == 0
        (32, 10, 18, 4, 4),     # stage2-like depth count, padded row grid
        (12, 7, 8, 2, 2),       # wq % 8 == 0 exactly, hq % trq != 0
    ],
)
def test_exit_softargmin_matches_xla_tail(D, hq, wq, kd, trq):
    rng = np.random.default_rng(D + hq)
    C, b = 8, 4
    y = jnp.asarray(
        rng.standard_normal((D, hq, wq, b * b * C)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, 1)).astype(np.float32) * 0.1)

    idx_ref, conf_ref = _xla_tail(y, w)
    idx_k, conf_k = exit_softargmin(y, w, kd=kd, trq=trq, interpret=True)
    assert idx_k.shape == idx_ref.shape == (hq * b, wq * b)
    # fp32 kernel logits vs the XLA path's bf16-rounded cost: small smooth
    # differences in idx_f; conf additionally flips bins on the rare pixels
    # where the integer window index lands differently
    np.testing.assert_allclose(np.asarray(idx_k), np.asarray(idx_ref), atol=2e-2)
    bin_k = np.clip(np.asarray(idx_k).astype(np.int32), 0, D - 1)
    bin_r = np.clip(np.asarray(idx_ref).astype(np.int32), 0, D - 1)
    same = bin_k == bin_r
    assert same.mean() > 0.99, same.mean()
    np.testing.assert_allclose(
        np.asarray(conf_k)[same], np.asarray(conf_ref)[same], atol=5e-3
    )


@pytest.mark.parametrize("D,hq,wq,kd,trq", [(16, 8, 8, 4, 4), (12, 7, 8, 2, 2)])
def test_exit_softargmin_streamed_hypotheses_clamped(D, hq, wq, kd, trq):
    """With dvol streamed, the kernel's depth equals the XLA route's
    depth_regression over the TRUE per-pixel hypotheses — including windows
    saturated at the range edges, where hypotheses are NOT affine in the
    plane index (the ADVICE r4 high finding: d0 == d1 == depth_min there, so
    an affine reconstruction collapses to depth_min)."""
    rng = np.random.default_rng(D * 31 + wq)
    C, b = 8, 4
    h, w = hq * b, wq * b
    y = jnp.asarray(
        rng.standard_normal((D, hq, wq, b * b * C)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, C, 1)).astype(np.float32) * 0.1)

    # per-pixel windows centered near/below depth_min so that a large
    # fraction of windows saturates (reference module.py:413-416 semantics)
    dmin, dmax, step = 425.0, 935.0, 2.5
    cur = dmin + rng.uniform(-40.0, 60.0, (h, w)).astype(np.float32)
    nl = (D - 1) // 2
    j = np.arange(D, dtype=np.float32).reshape(D, 1, 1)
    raw = (cur - nl * step)[None] + j * step
    dvol = np.minimum(np.maximum(raw, dmin), dmax)
    assert (dvol[0] == dvol[1]).any(), "fixture must hit the saturated regime"

    logit = s2d_conv3d(y[None], wt, b_in=b, padding=1)
    cost = depth_to_space(logit.reshape(D, hq, wq, -1), b).reshape(1, D, h, w)
    prob = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
    depth_ref = depth_regression(prob, jnp.asarray(dvol)[None])[0]

    depth_k, _ = exit_softargmin(
        y, wt, dvol=jnp.asarray(dvol), kd=kd, trq=trq, interpret=True
    )
    assert depth_k.shape == (h, w)
    # fp32 kernel logits vs bf16-rounded XLA cost: tolerance scales with the
    # window width (step), not the absolute depth
    np.testing.assert_allclose(
        np.asarray(depth_k), np.asarray(depth_ref), atol=5e-2
    )
    # the affine reconstruction is provably wrong on saturated windows;
    # verify the fixture would have caught it
    idx_f, _ = exit_softargmin(y, wt, kd=kd, trq=trq, interpret=True)
    affine = dvol[0] + (dvol[1] - dvol[0]) * np.asarray(idx_f)
    sat = dvol[0] == dvol[1]
    assert np.abs(affine - np.asarray(depth_ref))[sat].max() > 1.0


def test_exit_softargmin_peaked_distribution():
    """A sharply peaked volume regresses to the peak plane with confidence
    ~1 (the regime real scenes are in)."""
    rng = np.random.default_rng(3)
    D, hq, wq, C, b = 16, 8, 8, 8, 4
    peak = rng.integers(1, D - 1, (hq * b, wq * b))
    # construct y so the conv output is dominated by a per-pixel peak:
    # the 0-offset center tap of channel 0 carries the signal
    w = jnp.zeros((3, 3, 3, C, 1), jnp.float32).at[1, 1, 1, 0, 0].set(1.0)
    cost = -np.ones((D, hq * b, wq * b), np.float32) * 4
    for d in range(D):
        cost[d][peak == d] = 8.0
    # invert s2d: y channel (by*4+bx)*C + 0 at (yq, xq) = cost at (4yq+by, ...)
    y = np.zeros((D, hq, wq, b * b * C), np.float32)
    for by in range(b):
        for bx in range(b):
            y[:, :, :, (by * b + bx) * C] = cost[:, by::b, bx::b]
    idx_k, conf_k = exit_softargmin(jnp.asarray(y).astype(jnp.bfloat16), w, interpret=True)
    np.testing.assert_allclose(np.asarray(idx_k), peak.astype(np.float32), atol=0.05)
    assert float(np.asarray(conf_k).min()) > 0.95
