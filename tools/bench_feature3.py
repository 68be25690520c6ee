"""Per-layer s2d block-size A/B for the feature net (same-process deltas).

bench_feature.py attribution (r4, beyond the ~30 ms dispatch floor):
conv01 +22.1, stage3 tail (inner2+out3) +19.3, half +14.5, conv00 +7.9 ms.
The FLOP model says the s2d tap inflation (t²·b²·I vs k²·I) dominates those
layers at b=8 while their contractions stay >=128 lanes at b=4:

- conv01 (3,5,7) I=8: b=8 raw 135 GF/image -> b=4 48 GF (contraction 128);
- inner2+out3 (1x1 I=24 + (1,3) I=8): b=8 81 GF -> b=4 20 GF;
- inner1+out2 at b=2: 18 -> 4.5 GF (contraction 192/64).

The r2 "b=4 only -12%" sweep bundled conv00 (I=3: 48-lane contraction at
b=4 — pads 2.7x, loses). This tool measures each move separately, with the
reblock relayouts INCLUDED in the moving leg. All reformulations are exact
(reblock = pure transpose; upsample = phase gather); --check compares leg
outputs numerically.

RESULT (r4, on-device): every lower-block move LOSES despite 3-4x fewer
true FLOPs (conv01_b4 +6.2, tail_b4 +10.7, s2tail_b2 +0.9 ms) — XLA's fat
b=8 conv runs near the dense-MXU rate, so the cost is the PADDED tap
volume. That motivates the *_sp legs: the block-sparse Pallas kernel
(ops/pallas/s2d_sparse.py) keeps b=8 and skips the zero weight tiles
(27-46% nonzero at 128x128 granularity).

Run: python tools/bench_feature3.py [--reps 5] [--check]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/cds_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

H, W, N = 864, 1152, 8


def reblock_down(x, b_from, q, C):
    """s2d(b_from) -> s2d(b_from//q): split each block into q x q sub-blocks
    (pure transpose, exact)."""
    Nn, Hp, Wp, _ = x.shape
    b_to = b_from // q
    x = x.reshape(Nn, Hp, Wp, q, b_to, q, b_to, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 5, 4, 6, 7))
    return x.reshape(Nn, Hp * q, Wp * q, b_to * b_to * C)


def reblock_up(x, b_from, q, C):
    """s2d(b_from) -> s2d(q·b_from): merge q x q neighbor blocks (exact)."""
    Nn, Hp, Wp, _ = x.shape
    x = x.reshape(Nn, Hp // q, q, Wp // q, q, b_from, b_from, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 5, 4, 6, 7))
    return x.reshape(Nn, Hp // q, Wp // q, (q * b_from) ** 2 * C)


def up2x_same_block(x, b, C):
    """Nearest-2x upsample keeping block size: half-grid s2d(b) ->
    full-grid s2d(b). Full block Y' reads rows [(b/2)(Y'%2), +b/2) of half
    block Y'//2, each replicated 2x (and same along x)."""
    Nn, Hh, Wh, _ = x.shape
    hb = b // 2
    x = x.reshape(Nn, Hh, Wh, 2, hb, 2, hb, C)  # rows=(t, rlo), cols=(s, clo)
    x = x[:, :, :, :, :, None, :, :, None, :]  # add (rep_r, rep_c)
    x = jnp.broadcast_to(x, (Nn, Hh, Wh, 2, hb, 2, 2, hb, 2, C))
    # -> (n, yh, t, xh, s, rlo, rep_r, clo, rep_c, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 6, 4, 5, 7, 8, 9))
    return x.reshape(Nn, 2 * Hh, 2 * Wh, b * b * C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    # named _dyn_s2d/_plain_conv_s2d calls route through the sparse kernel;
    # the dense legs pass no name and stay on the XLA conv
    os.environ["CDS_FEAT_SPARSE"] = "all"

    from cds_mvsnet_tpu.models.convert import convert_checkpoint
    from cds_mvsnet_tpu.models.dynamic_conv import epipolar_direction_quadratic
    from cds_mvsnet_tpu.models.feature_net import BASE_CHANNELS, _DYN_KERNELS
    from cds_mvsnet_tpu.models.feature_net_s2d import (
        _cat_s2d,
        _d2s_cfirst,
        _d2s_map,
        _dyn_s2d,
        _plain_conv_s2d,
    )
    from cds_mvsnet_tpu.models.layers import leaky_relu
    from cds_mvsnet_tpu.ops.s2d import (
        s2d_conv,
        s2d_instance_norm,
        s2d_upsample2x_nearest,
        space_to_depth,
    )

    params = convert_checkpoint("/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth")
    p = jax.device_put(params["feature"])
    x = jax.device_put(jax.random.uniform(jax.random.PRNGKey(0), (N, H, W, 3), jnp.bfloat16))
    epi = jax.device_put(jnp.full((N, 2), 5000.0, jnp.float32))
    base = BASE_CHANNELS

    def dyn(name, xf, quad, b, C, sparse=False):
        y, nc = _dyn_s2d(p[name]["conv"], xf, quad, 0.01, _DYN_KERNELS[name], b,
                         name=name if sparse else None)
        return leaky_relu(s2d_instance_norm(y, b, C)), nc

    # ---- fixed upstream inputs for the tail legs (computed once) ----
    def upstream(x, epi):
        quad0 = space_to_depth(epipolar_direction_quadratic(epi, H, W, x.dtype), 8)
        quad1 = space_to_depth(
            epipolar_direction_quadratic(epi / 2, H // 2, W // 2, x.dtype), 4)
        xs = space_to_depth(x, 8)
        c00, _ = dyn("conv00", xs, quad0, 8, base)
        c01, _ = dyn("conv01", c00, quad0, 8, base)
        d0 = leaky_relu(s2d_instance_norm(
            s2d_conv(c01, p["downsample1"]["conv"]["weight"], b_in=8, stride=2, padding=1),
            4, 2 * base))
        c10, _ = dyn("conv10", d0, quad1, 4, 2 * base)
        c11, _ = dyn("conv11", c10, quad1, 4, 2 * base)
        # out2 path (stage2), at its current formulation
        quad2 = space_to_depth(
            epipolar_direction_quadratic(epi / 4, H // 4, W // 4, x.dtype), 2)
        d1 = leaky_relu(s2d_instance_norm(
            s2d_conv(c11, p["downsample2"]["conv"]["weight"], b_in=4, stride=2, padding=1),
            2, 4 * base))
        c20, _ = dyn("conv20", d1, quad2, 2, 4 * base)
        c21, _ = dyn("conv21", c20, quad2, 2, 4 * base)
        up = s2d_upsample2x_nearest(c21, 2, 4 * base)
        intra = _cat_s2d(up, c11, 16)
        intra = leaky_relu(s2d_instance_norm(
            s2d_conv(intra, p["inner1"]["conv"]["weight"], b_in=4, padding=0), 4, 2 * base))
        out2, _ = _dyn_s2d(p["out2"], intra, quad1, 0.01, _DYN_KERNELS["out2"], 4)
        out2 = jnp.tanh(s2d_instance_norm(out2, 4, 2 * base))
        return c00, c01, d0, c11, c21, out2

    c00, c01, d0, c11, c21, out2 = jax.jit(upstream)(x, epi)
    for t in (c00, c01, d0, c11, c21, out2):
        t.block_until_ready()
    np.asarray(jax.device_get(c00.ravel()[0]))

    # ---- legs ----
    def conv01_b8(c00, epi):  # current
        quad0 = space_to_depth(epipolar_direction_quadratic(epi, H, W, c00.dtype), 8)
        c01, nc = dyn("conv01", c00, quad0, 8, base)
        return jnp.sum(jnp.abs(c01.astype(jnp.float32))) + jnp.sum(jnp.abs(nc))

    def conv01_b4(c00, epi):  # move: reblock in, conv at b4, reblock back
        quad0 = space_to_depth(epipolar_direction_quadratic(epi, H, W, c00.dtype), 4)
        c4 = reblock_down(c00, 8, 2, base)
        c01, nc = dyn("conv01", c4, quad0, 4, base)
        c01 = reblock_up(c01, 4, 2, base)
        nc = reblock_up(nc, 4, 2, 1)
        return jnp.sum(jnp.abs(c01.astype(jnp.float32))) + jnp.sum(jnp.abs(nc))

    def tail_b8(c01, out2, epi):  # current stage3 tail
        quad0 = space_to_depth(epipolar_direction_quadratic(epi, H, W, c01.dtype), 8)
        up = s2d_upsample2x_nearest(out2, 4, 2 * base)
        intra = _cat_s2d(up, c01, 64)
        intra = leaky_relu(s2d_instance_norm(
            s2d_conv(intra, p["inner2"]["conv"]["weight"], b_in=8, padding=0), 8, base))
        out3, nc02 = _dyn_s2d(p["out3"], intra, quad0, 0.01, _DYN_KERNELS["out3"], 8)
        out3 = jnp.tanh(s2d_instance_norm(out3, 8, base))
        feat = _d2s_cfirst(out3, 8, base)
        ncm = _d2s_map(nc02**2, 8)
        nca = _d2s_map(jnp.abs(nc02), 8)
        return (jnp.sum(jnp.abs(feat.astype(jnp.float32))), jnp.sum(ncm), jnp.sum(nca))

    def tail_b4(c01, out2, epi):  # move: whole tail at b=4
        quad0 = space_to_depth(epipolar_direction_quadratic(epi, H, W, c01.dtype), 4)
        up = up2x_same_block(out2, 4, 2 * base)
        c4 = reblock_down(c01, 8, 2, base)
        intra = _cat_s2d(up, c4, 16)
        intra = leaky_relu(s2d_instance_norm(
            s2d_conv(intra, p["inner2"]["conv"]["weight"], b_in=4, padding=0), 4, base))
        out3, nc02 = _dyn_s2d(p["out3"], intra, quad0, 0.01, _DYN_KERNELS["out3"], 4)
        out3 = jnp.tanh(s2d_instance_norm(out3, 4, base))
        feat = _d2s_cfirst(out3, 4, base)
        ncm = _d2s_map(nc02**2, 4)
        nca = _d2s_map(jnp.abs(nc02), 4)
        return (jnp.sum(jnp.abs(feat.astype(jnp.float32))), jnp.sum(ncm), jnp.sum(nca))

    def s2tail_b4(c21, c11, epi):  # current stage2 tail (inner1 + out2)
        quad1 = space_to_depth(
            epipolar_direction_quadratic(epi / 2, H // 2, W // 2, c11.dtype), 4)
        up = s2d_upsample2x_nearest(c21, 2, 4 * base)
        intra = _cat_s2d(up, c11, 16)
        intra = leaky_relu(s2d_instance_norm(
            s2d_conv(intra, p["inner1"]["conv"]["weight"], b_in=4, padding=0), 4, 2 * base))
        out2, nc12 = _dyn_s2d(p["out2"], intra, quad1, 0.01, _DYN_KERNELS["out2"], 4)
        out2 = jnp.tanh(s2d_instance_norm(out2, 4, 2 * base))
        return (jnp.sum(jnp.abs(out2.astype(jnp.float32))), jnp.sum(jnp.abs(nc12)))

    def s2tail_b2(c21, c11, epi):  # move: stage2 tail at b=2
        quad1 = space_to_depth(
            epipolar_direction_quadratic(epi / 2, H // 2, W // 2, c11.dtype), 2)
        up = up2x_same_block(c21, 2, 4 * base)
        c2 = reblock_down(c11, 4, 2, 2 * base)
        intra = _cat_s2d(up, c2, 4)
        intra = leaky_relu(s2d_instance_norm(
            s2d_conv(intra, p["inner1"]["conv"]["weight"], b_in=2, padding=0), 2, 2 * base))
        out2, nc12 = _dyn_s2d(p["out2"], intra, quad1, 0.01, _DYN_KERNELS["out2"], 2)
        out2 = jnp.tanh(s2d_instance_norm(out2, 2, 2 * base))
        # downstream (warp at stage2, upsample into stage3 tail) consumes
        # out2 at b=4 today — include the reblock up
        out2 = reblock_up(out2, 2, 2, 2 * base)
        nc12 = reblock_up(nc12, 2, 2, 1)
        return (jnp.sum(jnp.abs(out2.astype(jnp.float32))), jnp.sum(jnp.abs(nc12)))

    # ---- block-sparse kernel legs (same math, zero weight tiles skipped) ----
    def conv01_sp(c00, epi):
        quad0 = space_to_depth(epipolar_direction_quadratic(epi, H, W, c00.dtype), 8)
        c01, nc = dyn("conv01", c00, quad0, 8, base, sparse=True)
        return jnp.sum(jnp.abs(c01.astype(jnp.float32))) + jnp.sum(jnp.abs(nc))

    def conv00_b8(x, epi, sparse=False):
        quad0 = space_to_depth(epipolar_direction_quadratic(epi, H, W, x.dtype), 8)
        xs = space_to_depth(x, 8)
        c00, nc = dyn("conv00", xs, quad0, 8, base, sparse=sparse)
        return jnp.sum(jnp.abs(c00.astype(jnp.float32))) + jnp.sum(jnp.abs(nc))

    def half_b4(d0, epi, sparse=False):
        quad1 = space_to_depth(
            epipolar_direction_quadratic(epi / 2, H // 2, W // 2, d0.dtype), 4)
        c10, nc10 = dyn("conv10", d0, quad1, 4, 2 * base, sparse=sparse)
        c11, nc11 = dyn("conv11", c10, quad1, 4, 2 * base, sparse=sparse)
        return (jnp.sum(jnp.abs(c11.astype(jnp.float32))),
                jnp.sum(jnp.abs(nc10)) + jnp.sum(jnp.abs(nc11)))

    def tail_sp(c01, out2, epi):
        quad0 = space_to_depth(epipolar_direction_quadratic(epi, H, W, c01.dtype), 8)
        up = s2d_upsample2x_nearest(out2, 4, 2 * base)
        intra = _cat_s2d(up, c01, 64)
        intra = leaky_relu(s2d_instance_norm(
            _plain_conv_s2d(intra, p["inner2"]["conv"]["weight"], "inner2",
                            b_in=8, padding=0), 8, base))
        out3, nc02 = _dyn_s2d(p["out3"], intra, quad0, 0.01, _DYN_KERNELS["out3"], 8,
                              name="out3")
        out3 = jnp.tanh(s2d_instance_norm(out3, 8, base))
        feat = _d2s_cfirst(out3, 8, base)
        ncm = _d2s_map(nc02**2, 8)
        nca = _d2s_map(jnp.abs(nc02), 8)
        return (jnp.sum(jnp.abs(feat.astype(jnp.float32))), jnp.sum(ncm), jnp.sum(nca))

    def down_b8(c01, sparse=False):
        name = "downsample1" if sparse else None
        w = p["downsample1"]["conv"]["weight"]
        if sparse:
            y = _plain_conv_s2d(c01, w, name, b_in=8, stride=2, padding=1)
        else:
            y = s2d_conv(c01, w, b_in=8, stride=2, padding=1)
        return jnp.sum(jnp.abs(leaky_relu(
            s2d_instance_norm(y, 4, 2 * base)).astype(jnp.float32)))

    legs = {
        "conv01_b8": (conv01_b8, (c00, epi)),
        "conv01_b4": (conv01_b4, (c00, epi)),
        "conv01_sp": (conv01_sp, (c00, epi)),
        "conv00_b8": (functools.partial(conv00_b8, sparse=False), (x, epi)),
        "conv00_sp": (functools.partial(conv00_b8, sparse=True), (x, epi)),
        "half_b4": (functools.partial(half_b4, sparse=False), (d0, epi)),
        "half_sp": (functools.partial(half_b4, sparse=True), (d0, epi)),
        "tail_b8": (tail_b8, (c01, out2, epi)),
        "tail_b4": (tail_b4, (c01, out2, epi)),
        "tail_sp": (tail_sp, (c01, out2, epi)),
        "s2tail_b4": (s2tail_b4, (c21, c11, epi)),
        "s2tail_b2": (s2tail_b2, (c21, c11, epi)),
        "down_b8": (functools.partial(down_b8, sparse=False), (c01,)),
        "down_sp": (functools.partial(down_b8, sparse=True), (c01,)),
    }

    if args.check:
        pairs = [("conv01_b8", "conv01_b4"), ("conv01_b8", "conv01_sp"),
                 ("conv00_b8", "conv00_sp"), ("half_b4", "half_sp"),
                 ("tail_b8", "tail_sp"), ("down_b8", "down_sp"),
                 ("tail_b8", "tail_b4"),
                 ("s2tail_b4", "s2tail_b2")]
        for a, b in pairs:
            fa, aa = legs[a]
            fb, ab = legs[b]
            va = np.asarray(jax.device_get(jax.jit(fa)(*aa))).ravel()
            vb = np.asarray(jax.device_get(jax.jit(fb)(*ab))).ravel()
            rel = np.abs(va - vb) / (np.abs(va) + 1e-6)
            print(f"check {a} vs {b}: rel {rel}", flush=True)

    res = {}
    for name, (fn, fargs) in legs.items():
        jf = jax.jit(fn)
        out = jf(*fargs)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jf(*fargs)
            np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) * 1e3
        res[name] = round(dt, 1)
        print(f"{name:12s} {dt:9.1f} ms", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
