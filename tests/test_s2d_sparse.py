"""Block-sparse s2d conv kernel (ops/pallas/s2d_sparse.py) parity.

Each branch's lane window of the fused kernel output must equal the plain
s2d_conv of that branch (interpret mode on CPU; the on-device route is
A/B-validated by tools/bench_feature_sparse.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cds_mvsnet_tpu.ops.pallas.s2d_sparse import (
    pack_tiles,
    plan_sparse_layer,
    sparse_s2d_conv,
)
from cds_mvsnet_tpu.ops.s2d import s2d_conv


def _run(branches, b_in, stride, Hp, Wp, R, seed=0):
    rng = np.random.default_rng(seed)
    C = b_in * b_in * branches[0][1]
    x = jnp.asarray(rng.standard_normal((2, Hp, Wp, C)).astype(np.float32))
    x = x.astype(jnp.bfloat16)
    ws = [
        jnp.asarray((0.1 * rng.standard_normal((k, k, I, O))).astype(np.float32))
        for k, I, O, _ in branches
    ]
    plan = plan_sparse_layer(tuple(branches), b_in, stride=stride)
    tiles = pack_tiles(plan, ws)
    got = sparse_s2d_conv(x, tiles, plan, R=R, interpret=True)

    b_out = b_in // stride
    for bi, ((k, I, O, pad), w) in enumerate(zip(branches, ws)):
        want = s2d_conv(x, w.astype(jnp.bfloat16), b_in=b_in, stride=stride, padding=pad)
        mo = plan.m_offsets[bi]
        sl = np.asarray(got[..., mo : mo + b_out * b_out * O], np.float32)
        np.testing.assert_allclose(
            sl, np.asarray(want, np.float32), rtol=2e-2, atol=2e-2,
            err_msg=f"branch {bi} k={k}",
        )
    return plan


def test_multibranch_b4():
    # the conv10/conv11 geometry in miniature: (3,5,7) branches at b=4
    branches = [(3, 8, 6, 1), (5, 8, 5, 2), (7, 8, 4, 3)]
    _run(branches, b_in=4, stride=1, Hp=8, Wp=16, R=64)


def test_real_conv01_plan_is_sparse():
    # the production conv01 geometry (fused conv+att: O=8+3) at b=8:
    # the banded rescatter structure must skip >half the 128x128 tiles
    branches = tuple((k, 8, 11, (k - 1) // 2) for k in (3, 5, 7))
    plan = plan_sparse_layer(branches, b_in=8)
    dense = 0
    for k, I, O, _ in branches:
        from cds_mvsnet_tpu.ops.s2d import _tap_maps

        kp, _, _ = _tap_maps(k, (k - 1) // 2, 1, 8, 8)
        dense += kp * kp * (-(-64 * I // 128)) * (-(-64 * O // 128))
    assert len(plan.pairs) < 0.5 * dense, (len(plan.pairs), dense)


def test_mixed_kernel_sizes_share_union_grid():
    # k=1 (pad 0) + k=3: the 1x1 branch uses only the center tap
    _run([(1, 8, 7, 0), (3, 8, 6, 1)], b_in=4, stride=1, Hp=8, Wp=16, R=64)


def test_stride2():
    # the downsample geometry: stride entirely inside the tap maps
    _run([(3, 8, 10, 1)], b_in=4, stride=2, Hp=8, Wp=16, R=64)


def test_ragged_row_grid():
    # HW=128 not divisible by R=48: padded steps, output cropped
    _run([(3, 8, 6, 1)], b_in=4, stride=1, Hp=8, Wp=16, R=48)


def test_b8_conv01_geometry():
    # b=8, k up to 7 -> 3x3 union tap grid, C=128 at I=2
    _run([(3, 2, 2, 1), (7, 2, 2, 3)], b_in=8, stride=1, Hp=8, Wp=8, R=32)


def test_real_conv01_multi_ktile():
    # the production conv01 shape: C=512 (4 K-tiles), M=704 (6 M-tiles)
    # per branch — exercises the kt/mt tile indexing the miniatures can't
    _run([(3, 8, 11, 1), (5, 8, 11, 2), (7, 8, 11, 3)],
         b_in=8, stride=1, Hp=8, Wp=16, R=64)
