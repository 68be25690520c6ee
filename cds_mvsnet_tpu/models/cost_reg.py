"""3D cost-volume regularization UNet (CostRegNet).

Behavioral reference: models/module.py:270-315 in TruongKhang/cds-mvsnet:
three stride-2 downsamples, three transposed-conv upsamples with skip adds,
and a final 1-channel conv. Volumes are ``(B, D, H, W, C)`` (NDHWC).
Stage-1 spatial dims must be divisible by 8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import (
    Params,
    StatsCollector,
    batch_norm,
    conv3d,
    deconv3d,
    init_batch_norm,
    init_conv3d,
    init_deconv,
)

__all__ = ["cost_reg_net", "init_cost_reg_net"]


def _cbr3d(p, x, stride, train, collector, path, axis_name):
    """Conv3d + BatchNorm3d + ReLU (reference module.py:80-121; no conv bias)."""
    y = conv3d(x, p["conv"], stride=stride)
    y = batch_norm(y, p["bn"], train, collector, path + ".bn", axis_name=axis_name)
    return jax.nn.relu(y)


def _dbr3d(p, x, train, collector, path, axis_name):
    """Deconv3d (2x) + BatchNorm3d + ReLU (reference module.py:124-166)."""
    y = deconv3d(x, p["conv"])
    y = batch_norm(y, p["bn"], train, collector, path + ".bn", axis_name=axis_name)
    return jax.nn.relu(y)


def cost_reg_net(
    p: Params,
    x: jnp.ndarray,
    train: bool = False,
    collector: StatsCollector | None = None,
    path: str = "",
    axis_name: str | None = None,
    last_layer: bool = True,
) -> jnp.ndarray:
    """``x (B, D, H, W, C)`` -> ``(B, D, H, W, 1)`` regularized cost."""

    def c(name, inp, stride=1):
        return _cbr3d(p[name], inp, stride, train, collector, f"{path}.{name}", axis_name)

    def d(name, inp):
        return _dbr3d(p[name], inp, train, collector, f"{path}.{name}", axis_name)

    conv0 = c("conv0", x)
    conv2 = c("conv2", c("conv1", conv0, 2))
    conv4 = c("conv4", c("conv3", conv2, 2))
    y = c("conv6", c("conv5", conv4, 2))
    y = conv4 + d("conv7", y)
    y = conv2 + d("conv9", y)
    y = conv0 + d("conv11", y)
    if last_layer:
        y = conv3d(y, p["prob"])
    return y


def cost_reg_net_s2d(
    p: Params,
    x: jnp.ndarray,
    b: int = 4,
    last_layer: bool = True,
    cfirst: bool = False,
    stop_after: str | None = None,
) -> jnp.ndarray:
    """Eval CostRegNet on an (h,w)-space-to-depth volume representation.

    The UNet's finest levels have 8-32 channels, so the plain NDHWC form pays
    the 128-lane padding tax on its largest buffers. Running on s2d(b)
    volumes keeps channels at b²·C >= 128 with exact numerics (ops/s2d.py).

    Args:
      x: plain volume ``(B, D, h, w, C)``; converted internally — or, with
        ``cfirst``, a W-minor ``(C, D, h, w)`` volume (the warp path's native
        layout) transposed straight to the s2d form in ONE lane-efficient
        relayout, never materializing the C-minor NDHWC intermediate.
    Returns:
      ``(B, D, h, w, 1)``.
    """
    from ..ops.s2d import depth_to_space, s2d_conv3d, s2d_deconv3d_2x, space_to_depth

    if cfirst:
        C, D, h, w = x.shape
        B = 1

    else:
        B, D, h, w, C = x.shape

    def to_s2d(v, blk):
        if cfirst:
            # (C, D, h, w) -> (1, D, h/b, w/b, (by, bx, C)): same channel
            # order as space_to_depth, minor dims lane-wide on both sides
            xr = v.reshape(C, D, h // blk, blk, w // blk, blk)
            return jnp.transpose(xr, (1, 2, 4, 3, 5, 0)).reshape(
                1, D, h // blk, w // blk, blk * blk * C
            )
        Bv, Dv, hv, wv, Cv = v.shape
        return space_to_depth(v.reshape(Bv * Dv, hv, wv, Cv), blk).reshape(
            Bv, Dv, hv // blk, wv // blk, -1
        )

    def bn_relu(v, bp, bb):
        shape = v.shape
        vr = v.reshape(*shape[:-1], bb, shape[-1] // bb)
        vr = batch_norm(vr, bp, train=False)
        return jax.nn.relu(vr).reshape(shape)

    def from_s2d(v, blk):
        Bv, Dv, hv, wv, Cv = v.shape
        return depth_to_space(v.reshape(Bv * Dv, hv, wv, Cv), blk).reshape(
            Bv, Dv, hv * blk, wv * blk, -1
        )

    def c(name, v, blk, stride=1):
        """Conv3d+BN+ReLU at block size blk; stride-2 halves the block (same
        grid) until blk==1, after which plain convs shrink the grid."""
        if blk > 1:
            y = s2d_conv3d(v, p[name]["conv"]["weight"], b_in=blk, stride=stride, padding=1)
            blk_out = blk // stride
            return bn_relu(y, p[name]["bn"], blk_out * blk_out), blk_out
        y = conv3d(v, p[name]["conv"], stride=stride, padding=1)
        y = jax.nn.relu(batch_norm(y, p[name]["bn"], train=False))
        return y, 1

    def d(name, v, blk, blk_out):
        if blk_out > 1:
            y = s2d_deconv3d_2x(v, p[name]["conv"]["weight"], b_in=blk)
            return bn_relu(y, p[name]["bn"], blk_out * blk_out)
        y = deconv3d(v, p[name]["conv"])
        return jax.nn.relu(batch_norm(y, p[name]["bn"], train=False))

    del from_s2d  # (block-1 tensors ARE plain; no conversion needed)
    # stop_after: PROFILING ONLY (tools/bench_costreg.py --levels). Returns
    # the named intermediate so prefix deltas attribute per-level cost; the
    # shape contract below does not hold for truncated returns.
    import os as _os

    _front = _os.environ.get("CDS_COSTREG_FRONT", "")
    if not _front and jax.default_backend() in ("tpu", "axon"):
        _front = "pallas"  # DEFAULT since r3: in-model −29.0 ms/map (ablate
        # set r3conv, 368.8 -> 339.8; opt out with CDS_COSTREG_FRONT=s2d)
    _tr = next((t for t in (32, 24, 16, 8) if h % t == 0), None)
    y1s = conv2s = None
    if cfirst and _front.startswith("pallas") and _tr is not None:
        # Run conv0 at its TRUE 27-tap FLOPs on the MXU
        # (ops/pallas/conv3d.py) straight off the W-minor volume, skipping
        # both the entry to_s2d relayout of x and conv0's ~7.1x s2d tap
        # inflation; conv0's (O, D, h, w) output re-enters the s2d UNet.
        from ..ops.pallas.conv3d import (
            conv3d_down,
            conv3d_front,
            conv3d_front_fused,
            fold_bn_into_conv3d,
        )

        _interp = _front.endswith("_interp")  # CPU-test knob
        w_f, b_f = fold_bn_into_conv3d(p["conv0"]["conv"], p["conv0"]["bn"])
        y1 = None
        _fused = _front.startswith("pallasf")
        if _fused and D % 2 == 0 and h % 2 == 0 and w % 2 == 0 and b % 2 == 0:
            # conv0 AND the stride-2 conv1 in ONE kernel pass: conv1 reads
            # conv0 from VMEM (the standalone conv1 kernel lost on stream
            # re-reads — STATUS r3). (kd, tr) by VMEM: the double-buffered
            # window is 2*3*C*(kd+3)*(tr+8)*128 bf16 bytes.
            w1_f, b1_f = fold_bn_into_conv3d(p["conv1"]["conv"], p["conv1"]["bn"])
            _cands = [
                (k, t) for k, t in ((4, 32), (4, 16), (2, 16))
                if D % k == 0
                and 2 * 3 * C * (k + 3) * (t + 8) * 128 * 2 <= 12 << 20
            ]
            # prefer an exact row tiling (no padded-grid junk rows)
            _cfg = next(
                ((k, t) for k, t in _cands if h % t == 0),
                _cands[0] if _cands else None,
            )
            if _cfg is not None:
                y0, y1 = conv3d_front_fused(
                    x, w_f, b_f, w1_f, b1_f, kd=_cfg[0], tr=_cfg[1],
                    interpret=_interp,
                )
        if y1 is None:
            tr = _tr  # falls back to s2d when no tile height divides h
            y0 = conv3d_front(
                x, w_f, b_f, kd=4 if D % 4 == 0 else 1, tr=tr, interpret=_interp
            )
        O0 = y0.shape[0]
        y0r = y0.reshape(O0, D, h // b, b, w // b, b)
        conv0 = jnp.transpose(y0r, (1, 2, 4, 3, 5, 0)).reshape(
            1, D, h // b, w // b, b * b * O0
        )
        b0 = b
        if stop_after in ("s2d", "conv0"):
            # Hoisted above the pallas2/pallas3 fronts so truncated profiling
            # returns never trace the downstream kernels (ADVICE r3).
            return conv0
        _lvl = (
            3 if _front.startswith(("pallas3", "pallasf3"))
            else 2 if _front.startswith("pallas2") or y1 is not None
            else 1
        )
        if (y1 is None and _lvl >= 2
                and D % 2 == 0 and h % 2 == 0 and w % 2 == 0 and b % 2 == 0):
            # conv1 (the stride-2 downsampler) at true tap count too,
            # straight off conv0's W-minor output — skips the s2d form's
            # tap inflation AND feeds from y0 before the s2d relayout.
            # Its half-res output re-enters the s2d UNet at block b/2.
            # (Measured NEGATIVE vs the fused front: the de-interleave
            # streams re-read conv0's output ~4.5x — STATUS r3.)
            w1, b1f = fold_bn_into_conv3d(p["conv1"]["conv"], p["conv1"]["bn"])
            y1 = conv3d_down(
                y0, w1, b1f,
                kd=next(k for k in (4, 2, 1) if (D // 2) % k == 0),
                interpret=_interp,
            )  # (O1, D/2, h/2, w/2)
        if y1 is not None:
            Do = D // 2
            bh = b // 2

            def _wm_to_s2d(v, Dv, hv, wv, blk):
                Ov = v.shape[0]
                vr = v.reshape(Ov, Dv, hv // blk, blk, wv // blk, blk)
                return jnp.transpose(vr, (1, 2, 4, 3, 5, 0)).reshape(
                    1, Dv, hv // blk, wv // blk, blk * blk * Ov
                )

            if _lvl >= 3:
                # conv2 (stride-1, half res) on the W-minor conv1 output as
                # well; only ITS output re-enters the s2d UNet (conv1's
                # relayout disappears entirely).
                w2, b2f = fold_bn_into_conv3d(p["conv2"]["conv"], p["conv2"]["bn"])
                y2 = conv3d_front(
                    y1, w2, b2f,
                    kd=4 if Do % 4 == 0 else 1,
                    tr=next((t for t in (32, 24, 16, 8) if (h // 2) % t == 0), 8),
                    interpret=_interp,
                )
                conv2s = _wm_to_s2d(y2, Do, h // 2, w // 2, bh)
            else:
                y1s = _wm_to_s2d(y1, Do, h // 2, w // 2, bh)
    else:
        xs = to_s2d(x, b)
        if stop_after == "s2d":
            return xs
        conv0, b0 = c("conv0", xs, b)
    if stop_after == "conv0":
        return conv0
    if conv2s is not None:
        conv2, b1 = conv2s, b // 2
    else:
        if y1s is not None:
            y, b1 = y1s, b // 2
        else:
            y, b1 = c("conv1", conv0, b0, 2)
        conv2, _ = c("conv2", y, b1)
    if stop_after == "conv2":
        return conv2
    y, b2 = c("conv3", conv2, b1, 2)
    conv4, _ = c("conv4", y, b2)
    if stop_after == "conv4":
        return conv4
    y, b3 = c("conv5", conv4, b2, 2)
    y, _ = c("conv6", y, b3)
    if stop_after == "conv6":
        return y
    y = conv4 + d("conv7", y, b3, b2)
    if stop_after == "conv7":
        return y
    y = conv2 + d("conv9", y, b2, b1)
    if stop_after == "conv9":
        return y
    y = conv0 + d("conv11", y, b1, b0)
    if stop_after == "conv11":
        return y
    if last_layer:
        if b0 > 1:
            y = s2d_conv3d(y, p["prob"]["weight"], b_in=b0, padding=1)
        else:
            y = conv3d(y, p["prob"], padding=1)
    Bp, Dp, hp, wp, _ = y.shape
    out = depth_to_space(y.reshape(Bp * Dp, hp, wp, -1), b0)
    return out.reshape(B, D, h, w, -1)


def init_cost_reg_net(key, in_channels: int, base_channels: int = 8) -> Params:
    b = base_channels
    keys = jax.random.split(key, 11)

    def cbr(k, cin, cout):
        return {"conv": init_conv3d(k, 3, cin, cout, False), "bn": init_batch_norm(cout)}

    def dbr(k, cin, cout):
        return {
            "conv": init_deconv(k, (3, 3, 3, cin, cout), cin, cout, False),
            "bn": init_batch_norm(cout),
        }

    return {
        "conv0": cbr(keys[0], in_channels, b),
        "conv1": cbr(keys[1], b, 2 * b),
        "conv2": cbr(keys[2], 2 * b, 2 * b),
        "conv3": cbr(keys[3], 2 * b, 4 * b),
        "conv4": cbr(keys[4], 4 * b, 4 * b),
        "conv5": cbr(keys[5], 4 * b, 8 * b),
        "conv6": cbr(keys[6], 8 * b, 8 * b),
        "conv7": dbr(keys[7], 8 * b, 4 * b),
        "conv9": dbr(keys[8], 4 * b, 2 * b),
        "conv11": dbr(keys[9], 2 * b, b),
        "prob": {"weight": init_conv3d(keys[10], 3, b, 1, False)["weight"]},
    }
