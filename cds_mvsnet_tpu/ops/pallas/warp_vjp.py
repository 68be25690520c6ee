"""Differentiable fused plane-sweep warp for TRAINING (custom_vjp).

The eval fast path runs the fused Pallas warp kernels (ops/pallas/warp.py)
forward-only; the reference trains through its warp — warping.py:69-104 runs
under autograd with the sweep grid built under no_grad (warping.py:79), so
only d(out)/d(src_feat) and d(out)/d(ref_feat) exist. This wrapper makes the
fused kernel usable in the training forward:

- forward: ``warp_pallas_v8`` in sim mode — ``in_prod = ref ⊙ warped`` and
  ``sim = Σ_C in_prod`` emitted fused, no (D,h,w,C) warped volume in HBM;
- backward: the exact VJP of the XLA packed-gather formulation (the same
  2x2-packed sampler the fallback route uses), with the sweep coordinates
  rebuilt from the cameras (``plane_sweep_coords`` is gradient-stopped,
  matching the reference's no_grad grid). The bilinear gather's transpose is
  a 4-corner scatter-add, which XLA already implements for the fallback
  route's autodiff — reusing ``jax.vjp`` of the reference formulation keeps
  gradients EXACTLY equal to the XLA route's (the kernel only replaces the
  forward values, which agree to bf16 rounding).

Cost model: the backward re-runs one gather (to rebuild ``warped`` — the
kernel never materializes it) + the scatter; the XLA route's autodiff pays
gather (fwd) + scatter (bwd) + stores the (D,h,w,C) warped residual. The
kernel route trades that HBM residual for a recomputed gather — same trade
``jax.checkpoint`` would make — and wins the forward outright where the
kernel wins eval (C<=8: 3x, tools/bench_warp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_warp_train"]


def _pad_w(x, Wp):
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, Wp - x.shape[-1]),))


def _kernel_fwd(src, ref, dep, ref_cam, src_cam, ky, kd, interpret):
    from ..geometry import relative_warp_transform
    from .warp import warp_pallas_v8

    C, h, w = ref.shape
    D = dep.shape[0]
    Wp = ((w + 127) // 128) * 128
    rot, trans = relative_warp_transform(ref_cam[None], src_cam[None])
    rt = jnp.concatenate([rot[0].reshape(9), trans[0].reshape(3)]).astype(jnp.float32)
    while D % kd:
        kd //= 2
    in_prod, sim = warp_pallas_v8(
        src, _pad_w(ref, Wp), _pad_w(dep.astype(jnp.float32), Wp), rt,
        w_valid=w, ky=ky, kd=max(kd, 1), emit_entropy=False, interpret=interpret,
    )
    return in_prod[..., :w].astype(jnp.float32), sim[..., :w].astype(jnp.float32)


def _xla_impl(src, ref, px, py):
    """The packed-sampler formulation the backward linearizes (identical to
    stage_net's XLA fallback warp + sim contraction, channels-first)."""
    from ..grid_sample import pack_2x2, sample_packed_2x2

    C, h, w = ref.shape
    D = px.shape[0] // (h * w)
    nhwc = jnp.moveaxis(src, 0, -1)[None]  # (1, H, W, C)
    flat = sample_packed_2x2(pack_2x2(nhwc), nhwc.shape, px[None], py[None])
    warped = jnp.moveaxis(flat.reshape(D, h, w, C), -1, 0)  # (C, D, h, w)
    in_prod = ref[:, None].astype(jnp.float32) * warped.astype(jnp.float32)
    return in_prod, in_prod.sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_warp_train(src, ref, dep, ref_cam, src_cam, ky, kd, interpret=False):
    """Fused warp with gradients: ``(in_prod (C,D,h,w) f32, sim (D,h,w) f32)``.

    Args:
      src, ref: ``(C, H, W)`` / ``(C, h, w)`` bf16 channels-first features.
      dep: ``(D, h, w)`` per-pixel depth hypotheses (gradient-free).
      ref_cam, src_cam: ``(2, 4, 4)`` packed cameras.
      ky, kd: kernel band geometry (static).
    """
    return _kernel_fwd(src, ref, dep, ref_cam, src_cam, ky, kd, interpret)


def _fwd(src, ref, dep, ref_cam, src_cam, ky, kd, interpret):
    out = _kernel_fwd(src, ref, dep, ref_cam, src_cam, ky, kd, interpret)
    return out, (src, ref, dep, ref_cam, src_cam)


def _bwd(ky, kd, interpret, res, g):
    from ..geometry import plane_sweep_coords

    src, ref, dep, ref_cam, src_cam = res
    C, h, w = ref.shape
    px, py = plane_sweep_coords(
        ref_cam[None], src_cam[None], dep[None], h, w
    )  # (1, D, h·w), gradient-stopped
    _, vjp = jax.vjp(
        lambda s, r: _xla_impl(s, r, px[0].reshape(-1), py[0].reshape(-1)), src, ref
    )
    d_src, d_ref = vjp(g)
    return d_src, d_ref, jnp.zeros_like(dep), jnp.zeros_like(ref_cam), jnp.zeros_like(src_cam)


fused_warp_train.defvjp(_fwd, _bwd)
