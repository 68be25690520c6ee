"""Warp-kernel route table: CDS_WARP_ROUTE grammar + fused-kernel dispatch.

The production eval path routes every stage's plane-sweep warp through one of
the Pallas kernel generations in ``ops/pallas/warp.py``. Which generation, and
with what tile geometry, was decided by measured in-model A/Bs over rounds 1-3
(tools/ablate.py); the route grammar exists so those A/Bs stay reproducible.
This module owns the grammar — stage_net only asks "parse this route string,
then run it" (VERDICT r3 weak #5: the inline per-branch parsing had become the
least maintainable code in the tree).

Grammar (first match wins; ``None`` = the default v8 route):

- ``v8[s][r][<kd>][y<ky>][t<tr>][q<slots>]`` — MXU-contraction warp +
  vectorized y-mix + in-kernel online-softmax entropy (default since r3).
  ``s`` emits the sim volume instead of the entropy map, ``r`` uses v7m's
  per-row y-mix, ``t`` sets output rows per tile (must divide the stage
  height, else falls back to 8), ``q`` sets the LRU band-cache slot count
  (r5; >1 kills the dt-innermost DMA thrash, bit-exact).
- ``v7m[<kd>][y<ky>]`` — MXU-contraction warp, sim emitted (default r2→r3).
- ``v6sdc[g|o][<kd>][y<ky>]`` — in-kernel projective coords; ``g``/``o`` are
  the measured-negative window-gating A/B knobs (STATUS r2).
- ``v6sd[<kd>]`` — depth-blocked tiles from precomputed coords.
- ``v6sc`` / ``v6s`` / ``v6sky<N>`` — fused in_prod/sim emission, with/without
  the DMA window cache / with a ky override.
- anything else (``v6ky16``, ``v3``, ``xla``) is a non-fused route handled by
  stage_net's fallback ladder.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["WarpRouteSpec", "parse_fused_route", "run_fused_warp", "is_fused_route"]


@dataclasses.dataclass(frozen=True)
class WarpRouteSpec:
    variant: str  # "v8" | "v7m" | "v6sdc" | "v6sd" | "v6s"
    ky: int
    kd: int
    tr: int = 8
    emit_entropy: bool = False  # v8 only
    row_ymix: bool = False  # v8 only
    cache_slots: int = 1  # v8 only: LRU band-cache slots (1 = r4 tag cache)
    gate: str = "none"  # v6sdc only: "none" | "row" | "odloop"
    dma_cache: bool = False  # v6s only


def is_fused_route(route: str | None) -> bool:
    """Routes whose kernel emits in_prod/sim (or entropy) fused — the rest
    fall to stage_net's unfused warp + XLA sim ladder."""
    return route is None or route.startswith(("v6s", "v7m", "v8"))


def _clamp_kd(kd: int, D: int) -> int:
    while D % kd:
        kd //= 2
    return max(kd, 1)


def parse_fused_route(route: str | None, n_ch: int, D: int, h: int) -> WarpRouteSpec:
    """Parse a fused route string (see module docstring) into a spec.

    ``n_ch`` picks the default band height (ky=8 for C<=8 stages, 16 above —
    converged in the r1-r3 ky sweeps); ``D``/``h`` bound kd and tr.
    """
    ky = 8 if n_ch <= 8 else 16
    if route is None or route.startswith("v8"):
        suffix = "" if route is None else route[len("v8"):]
        emit_entropy = True
        row_ymix = False
        if suffix.startswith("s"):
            emit_entropy = False
            suffix = suffix[1:]
        if suffix.startswith("r"):
            row_ymix = True
            suffix = suffix[1:]
        suffix, _, q_s = suffix.partition("q")
        kd_s, _, rest = suffix.partition("y")
        ky_s, _, tr_s = rest.partition("t")
        if not rest:
            kd_s, _, tr_s = suffix.partition("t")
            ky_s = ""
        kd = int(kd_s or 4)
        if ky_s:
            ky = int(ky_s)
        tr = int(tr_s) if tr_s else 8
        if tr % 8 or h % tr:
            tr = 8
        return WarpRouteSpec(
            "v8", ky, _clamp_kd(kd, D), tr, emit_entropy=emit_entropy,
            row_ymix=row_ymix, cache_slots=int(q_s) if q_s else 1,
        )
    if route.startswith("v7m"):
        suffix = route[len("v7m"):]
        kd_s, _, ky_s = suffix.partition("y")
        if ky_s:
            ky = int(ky_s)
        return WarpRouteSpec("v7m", ky, _clamp_kd(int(kd_s or 4), D))
    if route.startswith("v6sdc"):
        suffix = route[len("v6sdc"):]
        gate = "none"
        if suffix.startswith("g"):
            gate, suffix = "row", suffix[1:]
        elif suffix.startswith("o"):
            gate, suffix = "odloop", suffix[1:]
        kd_s, _, ky_s = suffix.partition("y")
        if ky_s:
            ky = int(ky_s)
        return WarpRouteSpec("v6sdc", ky, _clamp_kd(int(kd_s or 4), D), gate=gate)
    if route.startswith("v6sd"):
        return WarpRouteSpec("v6sd", ky, _clamp_kd(int(route[len("v6sd"):] or 4), D))
    if route.startswith("v6sky"):
        return WarpRouteSpec("v6s", int(route[len("v6sky"):]), 1)
    # "v6s" / "v6sc" / "v6sb" (batched handled upstream; alone = plain v6s)
    return WarpRouteSpec("v6s", ky, 1, dma_cache=route == "v6sc")


def run_fused_warp(
    spec: WarpRouteSpec,
    src: jnp.ndarray,  # (C, h, w) W-minor source features (bf16)
    ref: jnp.ndarray,  # (C, h, w) W-minor reference features
    px: jnp.ndarray,  # (1, D·h·w) precomputed sweep coords (v6sd/v6s routes)
    py: jnp.ndarray,
    depth_values: jnp.ndarray,  # (1, D) or (1, D, h, w)
    ref_cam: jnp.ndarray,  # (1, 2, 4, 4)
    src_cam: jnp.ndarray,
    src_rows: bool = False,
    interpret: bool = False,
):
    """Dispatch one view's fused warp. Returns ``(in_prod (C, D, h, w),
    sim (1, D, h, w) | None, entropy (1, h, w) | None)`` cropped to w.

    Width padding to the 128-lane grid (junk coords -> zero output) and the
    homography-scalar prep for the in-kernel-coords routes happen here.
    ``src_rows``: ``src`` arrives in the v7m/v8 kernels' (h, C, w) band
    layout straight off the feature net (CDS_SRC_ROWS route); the archived
    routes that still want (C, h, w) transpose it back here.
    """
    from ..ops.geometry import relative_warp_transform
    from ..ops.pallas import warp as wk

    if src_rows and spec.variant not in ("v8", "v7m"):
        src = jnp.transpose(src, (1, 0, 2))  # archive routes: back to (C, h, w)
        src_rows = False
    if src_rows:
        h, C, w = src.shape
    else:
        C, h, w = src.shape
    D = depth_values.shape[1]
    Wp = ((w + 127) // 128) * 128
    ref_k = jnp.pad(ref, ((0, 0), (0, 0), (0, Wp - w))) if Wp != w else ref

    ent_k = sim_k = None
    if spec.variant in ("v8", "v7m", "v6sdc"):
        # in-kernel projective coords: 12 SMEM homography scalars + the
        # depth block replace the XLA coords pass and px/py HBM streams
        rot, trans = relative_warp_transform(ref_cam, src_cam)
        rt = jnp.concatenate([rot[0].reshape(9), trans[0].reshape(3)]).astype(
            jnp.float32
        )
        if depth_values.ndim == 2:
            dep = jnp.broadcast_to(depth_values[0][:, None, None], (D, h, w))
        else:
            dep = depth_values[0]
        if Wp != w:
            dep = jnp.pad(dep, ((0, 0), (0, 0), (0, Wp - w)))
        if spec.variant == "v8":
            in_prod, aux = wk.warp_pallas_v8(
                src, ref_k, dep, rt, w_valid=w, ky=spec.ky, kd=spec.kd,
                tr=spec.tr, emit_entropy=spec.emit_entropy,
                row_ymix=spec.row_ymix, cache_slots=spec.cache_slots,
                src_rows=src_rows, interpret=interpret,
            )
            if spec.emit_entropy:
                ent_k = aux
            else:
                sim_k = aux
        elif spec.variant == "v7m":
            in_prod, sim_k = wk.warp_pallas_v7m(
                src, ref_k, dep, rt, w_valid=w, ky=spec.ky, kd=spec.kd,
                src_rows=src_rows, interpret=interpret,
            )
        else:
            in_prod, sim_k = wk.warp_pallas_v6sdc(
                src, ref_k, dep, rt, w_valid=w, ky=spec.ky, kd=spec.kd,
                gate=spec.gate, interpret=interpret,
            )
    else:
        px_k = px[0].reshape(D, h, w)
        py_k = py[0].reshape(D, h, w)
        if Wp != w:
            pad = ((0, 0), (0, 0), (0, Wp - w))
            px_k = jnp.pad(px_k, pad, constant_values=-1e6)
            py_k = jnp.pad(py_k, pad, constant_values=-1e6)
        if spec.variant == "v6sd":
            in_prod, sim_k = wk.warp_pallas_v6sd(
                src, ref_k, px_k, py_k, ky=spec.ky, kd=spec.kd, interpret=interpret
            )
        else:
            in_prod, sim_k = wk.warp_pallas_v6s(
                src, ref_k, px_k, py_k, ky=spec.ky, dma_cache=spec.dma_cache,
                interpret=interpret,
            )
    if Wp != w:
        in_prod = in_prod[..., :w]
        if sim_k is not None:
            sim_k = sim_k[..., :w]
        if ent_k is not None:
            ent_k = ent_k[..., :w]
    return (
        in_prod,
        None if sim_k is None else sim_k[None],
        None if ent_k is None else ent_k[None],
    )
