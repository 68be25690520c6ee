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
