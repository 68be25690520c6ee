"""Pallas warp kernel vs the XLA packed sampler (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cds_mvsnet_tpu.ops.grid_sample import grid_sample_pixel_packed
from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v3
from cds_mvsnet_tpu.ops.pallas.warp_archive import (
    warp_pallas,
    warp_pallas_v2,
    warp_pallas_v4,
    warp_pallas_v5,
)

VARIANTS = {"v1": warp_pallas, "v2": warp_pallas_v2, "v3": warp_pallas_v3,
            "v4": warp_pallas_v4, "v5": warp_pallas_v5}


def reference(src, px, py):
    D, H, W = px.shape
    out = grid_sample_pixel_packed(
        src[None], px.reshape(1, -1), py.reshape(1, -1)
    )  # (1, DHW, C)
    return np.transpose(np.asarray(out).reshape(D, H, W, -1), (3, 0, 1, 2))


@pytest.mark.parametrize("variant", list(VARIANTS))
@pytest.mark.parametrize("seed", [0, 1])
def test_warp_pallas_matches_packed_sampler(seed, variant):
    rng = np.random.default_rng(seed)
    H, W, C, D = 16, 128, 8, 3
    src = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    # smooth-ish in-range coords + some out-of-range / extreme values
    px = rng.uniform(-5, W + 5, (D, H, W)).astype(np.float32)
    py = rng.uniform(-5, H + 5, (D, H, W)).astype(np.float32)
    px[0] = np.clip(px[0], 0, W - 1.01)
    py[0] = np.clip(py[0], 0, H - 1.01)

    got = np.asarray(
        VARIANTS[variant](src, jnp.asarray(px), jnp.asarray(py), interpret=True)
    )
    want = reference(src, px, py)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_warp_pallas_wide_image(variant):
    rng = np.random.default_rng(2)
    H, W, C, D = 8, 256, 4, 2
    src = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    # force cross-window gathers: coordinates jump across the 128-lane seam
    px = rng.uniform(0, W - 1.01, (D, H, W)).astype(np.float32)
    py = rng.uniform(0, H - 1.01, (D, H, W)).astype(np.float32)
    got = np.asarray(
        VARIANTS[variant](src, jnp.asarray(px), jnp.asarray(py), interpret=True)
    )
    want = reference(src, px, py)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant", ["v2", "v3", "v4", "v5"])
def test_warp_pallas_channels_first_and_coherent(variant):
    """Channels-first input + realistic coherent plane-sweep coords (small
    per-row spans — the fast path the anchored-band variants optimize)."""
    rng = np.random.default_rng(3)
    H, W, C, D = 24, 128, 8, 4
    src = jnp.asarray(rng.standard_normal((C, H, W)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32),
                         indexing="ij")
    px = np.stack([xs * (1 + 0.01 * d) + 3.7 * d for d in range(D)])
    py = np.stack([ys * (1 + 0.005 * d) + 0.9 * d for d in range(D)])
    got = np.asarray(
        VARIANTS[variant](src, jnp.asarray(px), jnp.asarray(py), interpret=True,
                          channels_first=True)
    )
    want = reference(np.moveaxis(np.asarray(src), 0, -1), px, py)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warp_pallas_v6_matches_on_bf16_source():
    """v6 bit-packs bf16 x-pairs: exact vs the packed sampler run on the
    bf16-quantized source (fp32 staged-lerp differences ~1 ulp)."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v6

    rng = np.random.default_rng(4)
    H, W, C, D = 16, 128, 8, 3
    src32 = rng.standard_normal((H, W, C)).astype(np.float32)
    srcq = np.asarray(jnp.asarray(src32).astype(jnp.bfloat16).astype(jnp.float32))
    px = rng.uniform(-5, W + 5, (D, H, W)).astype(np.float32)
    py = rng.uniform(-5, H + 5, (D, H, W)).astype(np.float32)

    got = np.asarray(
        warp_pallas_v6(jnp.asarray(srcq), jnp.asarray(px), jnp.asarray(py), interpret=True)
    )
    want = reference(srcq, px, py)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warp_pallas_v6_channels_first_coherent_bf16():
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v6

    rng = np.random.default_rng(5)
    H, W, C, D = 24, 128, 8, 4
    src = jnp.asarray(rng.standard_normal((C, H, W)), jnp.bfloat16)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32),
                         indexing="ij")
    px = np.stack([xs * (1 + 0.01 * d) + 3.7 * d for d in range(D)])
    py = np.stack([ys * (1 + 0.005 * d) + 0.9 * d for d in range(D)])
    got = np.asarray(
        warp_pallas_v6(src, jnp.asarray(px), jnp.asarray(py), interpret=True,
                       channels_first=True).astype(jnp.float32)
    )
    srcq = np.asarray(jnp.moveaxis(src, 0, -1).astype(jnp.float32))
    want = reference(srcq, px, py)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("trky", [(4, 8), (8, 16)])
def test_warp_pallas_v7_matches_on_bf16_source(trky):
    """v7 wide-band: exact vs the packed sampler on the bf16-quantized
    source, incl. random out-of-range coords exercising the x-slice sweep."""
    from cds_mvsnet_tpu.ops.pallas.warp_archive import warp_pallas_v7

    tr, ky = trky
    rng = np.random.default_rng(6)
    H, W, C, D = 16, 256, 8, 3
    src32 = rng.standard_normal((H, W, C)).astype(np.float32)
    srcq = np.asarray(jnp.asarray(src32).astype(jnp.bfloat16).astype(jnp.float32))
    px = rng.uniform(-5, W + 5, (D, H, W)).astype(np.float32)
    py = rng.uniform(-5, H + 5, (D, H, W)).astype(np.float32)

    got = np.asarray(
        warp_pallas_v7(jnp.asarray(srcq), jnp.asarray(px), jnp.asarray(py),
                       ky=ky, tr=tr, interpret=True)
    )
    want = reference(srcq, px, py)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warp_pallas_v7_channels_first_coherent():
    from cds_mvsnet_tpu.ops.pallas.warp_archive import warp_pallas_v7

    rng = np.random.default_rng(8)
    H, W, C, D = 24, 128, 8, 4
    src = jnp.asarray(rng.standard_normal((C, H, W)), jnp.bfloat16)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32),
                         indexing="ij")
    px = np.stack([xs * (1 + 0.01 * d) + 3.7 * d for d in range(D)])
    py = np.stack([ys * (1 + 0.005 * d) + 0.9 * d for d in range(D)])
    got = np.asarray(
        warp_pallas_v7(src, jnp.asarray(px), jnp.asarray(py), interpret=True,
                       channels_first=True).astype(jnp.float32)
    )
    srcq = np.asarray(jnp.moveaxis(src, 0, -1).astype(jnp.float32))
    want = reference(srcq, px, py)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_warp_pallas_v6s_fused_outputs():
    """v6s = v6's warp with fused in_prod/sim emission: in_prod equals
    ref ⊙ v6-warped and sim equals the fp32 channel contraction."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v6, warp_pallas_v6s

    rng = np.random.default_rng(9)
    H, W, C, D = 16, 128, 8, 3
    q = lambda a: np.asarray(jnp.asarray(a, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32))
    src = q(rng.standard_normal((C, H, W)))
    ref = q(rng.standard_normal((C, H, W)))
    px = rng.uniform(-5, W + 5, (D, H, W)).astype(np.float32)
    py = rng.uniform(-5, H + 5, (D, H, W)).astype(np.float32)

    in_prod, sim = warp_pallas_v6s(
        jnp.asarray(src), jnp.asarray(ref), jnp.asarray(px), jnp.asarray(py),
        interpret=True,
    )
    warped = warp_pallas_v6(
        jnp.asarray(src), jnp.asarray(px), jnp.asarray(py), interpret=True,
        channels_first=True,
    )
    want_prod = np.asarray(ref)[:, None] * np.asarray(warped)
    want_sim = np.sum(np.asarray(warped) * np.asarray(ref)[:, None], axis=0)
    np.testing.assert_allclose(np.asarray(in_prod), want_prod, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim), want_sim, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kd", [2, 4])
def test_warp_pallas_v6sd_matches_v6s(kd):
    """Depth-blocked tiles (kd planes per grid step) are bit-identical to
    plain v6s, even on incoherent geometry where the kd-union band spans
    extra windows."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v6s, warp_pallas_v6sd

    rng = np.random.default_rng(17)
    H, W, C, D = 16, 128, 8, 4
    q = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    src = q(rng.standard_normal((C, H, W)))
    ref = q(rng.standard_normal((C, H, W)))
    px = jnp.asarray(rng.uniform(-5, W + 5, (D, H, W)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-5, H + 5, (D, H, W)).astype(np.float32))

    in_prod_d, sim_d = warp_pallas_v6sd(src, ref, px, py, kd=kd, interpret=True)
    in_prod, sim = warp_pallas_v6s(src, ref, px, py, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(in_prod_d, np.float32), np.asarray(in_prod, np.float32)
    )
    np.testing.assert_array_equal(np.asarray(sim_d), np.asarray(sim))


@pytest.mark.parametrize("w_valid", [128, 120])
def test_warp_pallas_v6sdc_matches_v6sd(w_valid):
    """In-kernel projective coords match v6sd fed with host-side px/py from
    the same formula (L = rot·[X,Y,1]; p = (L·d + t)/(L2·d + t2 + 1e-6));
    lanes past w_valid follow the -1e6 sentinel convention. The kernel's
    fp32 FMA contraction rounds differently from numpy's mul+add by a few
    coordinate ulps, so a small fraction of lerp weights differ in the last
    bf16 bit — tolerance-based, with a tight mismatch-fraction bound."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v6sd, warp_pallas_v6sdc

    rng = np.random.default_rng(23)
    H, W, C, D = 16, 128, 8, 4
    q = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    src = q(rng.standard_normal((C, H, W)))
    ref = q(rng.standard_normal((C, H, W)))
    # near-identity homography with small perspective terms: z stays ~depth
    # and px/py land in/near the image, like a real plane sweep
    rot = (np.eye(3) + 0.02 * rng.standard_normal((3, 3))).astype(np.float32)
    rot[2, :2] *= 0.02
    trans = (50.0 * rng.standard_normal(3)).astype(np.float32)
    dep = rng.uniform(400.0, 600.0, (D, H, W)).astype(np.float32)

    Y, X = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    L = [rot[i, 0] * X + rot[i, 1] * Y + rot[i, 2] for i in range(3)]
    z = L[2][None] * dep + trans[2] + 1e-6
    px = (L[0][None] * dep + trans[0]) / z
    py = (L[1][None] * dep + trans[1]) / z
    px[:, :, w_valid:] = -1e6
    py[:, :, w_valid:] = -1e6

    rt = jnp.asarray(np.concatenate([rot.ravel(), trans]))
    in_prod_c, sim_c = warp_pallas_v6sdc(
        src, ref, jnp.asarray(dep), rt, w_valid=w_valid, interpret=True
    )
    in_prod, sim = warp_pallas_v6sd(
        src, ref, jnp.asarray(px), jnp.asarray(py), interpret=True
    )
    in_prod_c = np.asarray(in_prod_c, np.float32)
    in_prod = np.asarray(in_prod, np.float32)
    assert np.mean(in_prod_c != in_prod) < 0.02
    np.testing.assert_allclose(in_prod_c, in_prod, atol=0.06)
    np.testing.assert_allclose(np.asarray(sim_c), np.asarray(sim), atol=0.25)


def test_warp_pallas_v7m_matches_v6sdc():
    """The MXU-contraction warp (x-select+lerp as a selection-matrix matmul,
    y-mix on the VPU) matches the crossbar-gather kernel within the bf16
    x-lerp-weight rounding it introduces (Mx is a bf16 MXU operand)."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v6sdc, warp_pallas_v7m

    rng = np.random.default_rng(5)
    H, W, C, D = 16, 128, 8, 4
    q = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    src = q(rng.standard_normal((C, H, W)))
    ref = q(rng.standard_normal((C, H, W)))
    rot = (np.eye(3) + 0.02 * rng.standard_normal((3, 3))).astype(np.float32)
    rot[2, :2] *= 0.02
    trans = (50.0 * rng.standard_normal(3)).astype(np.float32)
    dep = rng.uniform(400.0, 600.0, (D, H, W)).astype(np.float32)
    rt = jnp.asarray(np.concatenate([rot.ravel(), trans]))

    a_ip, a_sim = warp_pallas_v6sdc(src, ref, jnp.asarray(dep), rt,
                                    w_valid=120, interpret=True)
    b_ip, b_sim = warp_pallas_v7m(src, ref, jnp.asarray(dep), rt,
                                  w_valid=120, interpret=True)
    np.testing.assert_allclose(
        np.asarray(b_ip, np.float32), np.asarray(a_ip, np.float32), atol=0.08
    )
    np.testing.assert_allclose(np.asarray(b_sim), np.asarray(a_sim), atol=0.3)


def test_warp_pallas_v7m_out_of_image_zeros():
    """Hypotheses projecting entirely outside the source image (including
    the -1e6 sentinel for padded lanes and tiny-z blowups) must produce
    zero warped features and zero similarity — the corner weights vanish
    and no selection-matrix column matches."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v7m

    rng = np.random.default_rng(11)
    H, W, C, D = 16, 128, 8, 4
    q = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    src = q(rng.standard_normal((C, H, W)))
    ref = q(rng.standard_normal((C, H, W)))
    # translation far beyond the image for every plane
    rot = np.eye(3, dtype=np.float32)
    trans = np.array([1e7, 1e7, 0.0], np.float32)
    dep = rng.uniform(400.0, 600.0, (D, H, W)).astype(np.float32)
    rt = jnp.asarray(np.concatenate([rot.ravel(), trans]))
    in_prod, sim = warp_pallas_v7m(src, ref, jnp.asarray(dep), rt,
                                   w_valid=120, interpret=True)
    assert np.all(np.asarray(in_prod, np.float32) == 0.0)
    assert np.all(np.asarray(sim) == 0.0)


@pytest.mark.parametrize("gate", ["row", "odloop"])
def test_warp_pallas_v6sdc_gate_variants_exact(gate):
    """The window-sweep gate variants (per-row cond skip / per-depth-plane
    window loops) are bit-identical to the ungated union sweep — they only
    skip work whose masked contribution is zero."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v6sdc

    rng = np.random.default_rng(7)
    H, W, C, D = 16, 128, 8, 4
    q = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    src = q(rng.standard_normal((C, H, W)))
    ref = q(rng.standard_normal((C, H, W)))
    rot = (np.eye(3) + 0.02 * rng.standard_normal((3, 3))).astype(np.float32)
    rot[2, :2] *= 0.02
    trans = (50.0 * rng.standard_normal(3)).astype(np.float32)
    dep = rng.uniform(400.0, 600.0, (D, H, W)).astype(np.float32)
    rt = jnp.asarray(np.concatenate([rot.ravel(), trans]))

    base = warp_pallas_v6sdc(src, ref, jnp.asarray(dep), rt, w_valid=120,
                             interpret=True)
    gated = warp_pallas_v6sdc(src, ref, jnp.asarray(dep), rt, w_valid=120,
                              interpret=True, gate=gate)
    for x, y in zip(base, gated):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_warp_pallas_v6s_dma_cache_exact():
    """Per-view depth-innermost grid + DMA window cache is bit-identical to
    the plain v6s launch, even on incoherent geometry (cache misses sweep)."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v6s

    rng = np.random.default_rng(13)
    H, W, C, D = 16, 128, 8, 4
    q = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    src = q(rng.standard_normal((C, H, W)))
    ref = q(rng.standard_normal((C, H, W)))
    px = jnp.asarray(rng.uniform(-5, W + 5, (D, H, W)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-5, H + 5, (D, H, W)).astype(np.float32))

    in_prod_c, sim_c = warp_pallas_v6s(src, ref, px, py, interpret=True, dma_cache=True)
    in_prod, sim = warp_pallas_v6s(src, ref, px, py, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(in_prod_c, np.float32), np.asarray(in_prod, np.float32)
    )
    np.testing.assert_array_equal(np.asarray(sim_c), np.asarray(sim))


@pytest.mark.parametrize("dma_cache", [False, True])
def test_warp_pallas_v6s_batched_matches_per_view(dma_cache):
    """The all-views launch must reproduce each per-view v6s result exactly
    (same kernel body; only the grid gains a view axis). With dma_cache the
    grid runs depth-innermost and band DMAs are skipped on window reuse —
    still exact on arbitrary (incoherent) geometry."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v6s, warp_pallas_v6s_batched

    rng = np.random.default_rng(11)
    V, H, W, C, D = 3, 16, 128, 8, 2
    q = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    srcs = q(rng.standard_normal((V, C, H, W)))
    refs = q(rng.standard_normal((V, C, H, W)))
    px = rng.uniform(-5, W + 5, (V, D, H, W)).astype(np.float32)
    py = rng.uniform(-5, H + 5, (V, D, H, W)).astype(np.float32)

    in_prod_b, sim_b = warp_pallas_v6s_batched(
        srcs, refs, jnp.asarray(px), jnp.asarray(py), interpret=True,
        dma_cache=dma_cache,
    )
    for v in range(V):
        in_prod, sim = warp_pallas_v6s(
            srcs[v], refs[v], jnp.asarray(px[v]), jnp.asarray(py[v]), interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(in_prod_b[v], np.float32), np.asarray(in_prod, np.float32)
        )
        np.testing.assert_array_equal(np.asarray(sim_b[v]), np.asarray(sim))


@pytest.mark.parametrize("row_ymix", [False, True])
def test_warp_pallas_v8_matches_v7m(row_ymix):
    """v8's vectorized y-mix (and its row_ymix A/B knob) reproduces v7m's
    in_prod and sim bit-for-bit in sim-emitting mode — the contraction and
    weights are identical, only the instruction shapes change."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v7m, warp_pallas_v8

    rng = np.random.default_rng(17)
    H, W, C, D = 16, 128, 8, 4
    q = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    src = q(rng.standard_normal((C, H, W)))
    ref = q(rng.standard_normal((C, H, W)))
    rot = (np.eye(3) + 0.02 * rng.standard_normal((3, 3))).astype(np.float32)
    rot[2, :2] *= 0.02
    trans = (50.0 * rng.standard_normal(3)).astype(np.float32)
    dep = rng.uniform(400.0, 600.0, (D, H, W)).astype(np.float32)
    rt = jnp.asarray(np.concatenate([rot.ravel(), trans]))

    a_ip, a_sim = warp_pallas_v7m(src, ref, jnp.asarray(dep), rt,
                                  w_valid=120, interpret=True)
    b_ip, b_sim = warp_pallas_v8(src, ref, jnp.asarray(dep), rt,
                                 w_valid=120, emit_entropy=False,
                                 row_ymix=row_ymix, interpret=True)
    np.testing.assert_array_equal(np.asarray(b_ip, np.float32),
                                  np.asarray(a_ip, np.float32))
    np.testing.assert_allclose(np.asarray(b_sim), np.asarray(a_sim),
                               rtol=0, atol=1e-5)


def test_warp_pallas_v8_entropy_matches_xla():
    """v8's in-kernel online softmax entropy equals softmax_entropy(sim)
    computed by XLA from the same kernel's sim output (fp32 rounding only)."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v8
    from cds_mvsnet_tpu.ops.sampling import softmax_entropy

    rng = np.random.default_rng(29)
    H, W, C, D = 16, 128, 8, 8
    q = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    src = q(rng.standard_normal((C, H, W)))
    ref = q(rng.standard_normal((C, H, W)))
    rot = (np.eye(3) + 0.02 * rng.standard_normal((3, 3))).astype(np.float32)
    rot[2, :2] *= 0.02
    trans = (50.0 * rng.standard_normal(3)).astype(np.float32)
    dep = rng.uniform(400.0, 600.0, (D, H, W)).astype(np.float32)
    rt = jnp.asarray(np.concatenate([rot.ravel(), trans]))

    ip_s, sim = warp_pallas_v8(src, ref, jnp.asarray(dep), rt, w_valid=120,
                               emit_entropy=False, interpret=True)
    ip_e, ent = warp_pallas_v8(src, ref, jnp.asarray(dep), rt, w_valid=120,
                               emit_entropy=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ip_e, np.float32),
                                  np.asarray(ip_s, np.float32))
    want = np.asarray(softmax_entropy(jnp.asarray(sim)[None], axis=1)[0, 0])
    np.testing.assert_allclose(np.asarray(ent), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("slots", [2, 4])
def test_warp_pallas_v8_lru_band_cache_bit_exact(slots):
    """The S-slot LRU band cache (r5) only changes WHEN bands are DMA'd,
    never their contents: in_prod and entropy must match the 1-slot kernel
    bit-for-bit across a multi-tile, multi-depth-step grid (the thrash
    pattern the cache exists for)."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v8

    rng = np.random.default_rng(43)
    H, W, C, D = 32, 256, 8, 8
    q = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    src = q(rng.standard_normal((C, H, W)))
    ref = q(rng.standard_normal((C, H, W)))
    rot = (np.eye(3) + 0.02 * rng.standard_normal((3, 3))).astype(np.float32)
    rot[2, :2] *= 0.02
    trans = (50.0 * rng.standard_normal(3)).astype(np.float32)
    dep = rng.uniform(400.0, 600.0, (D, H, W)).astype(np.float32)
    rt = jnp.asarray(np.concatenate([rot.ravel(), trans]))

    ip1, ent1 = warp_pallas_v8(src, ref, jnp.asarray(dep), rt, w_valid=250,
                               kd=2, interpret=True)
    ipS, entS = warp_pallas_v8(src, ref, jnp.asarray(dep), rt, w_valid=250,
                               kd=2, cache_slots=slots, interpret=True)
    np.testing.assert_array_equal(np.asarray(ipS, np.float32),
                                  np.asarray(ip1, np.float32))
    np.testing.assert_array_equal(np.asarray(entS), np.asarray(ent1))


def test_warp_pallas_v8_multiblock_entropy():
    """kd < D: the online (m, s, u) state must carry correctly across the
    tile's multiple depth grid-steps (kd=2 over D=8 -> 4 visits/tile)."""
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_v8
    from cds_mvsnet_tpu.ops.sampling import softmax_entropy

    rng = np.random.default_rng(31)
    H, W, C, D = 16, 128, 8, 8
    q = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    src = q(rng.standard_normal((C, H, W)))
    ref = q(rng.standard_normal((C, H, W)))
    rot = (np.eye(3) + 0.02 * rng.standard_normal((3, 3))).astype(np.float32)
    rot[2, :2] *= 0.02
    trans = (50.0 * rng.standard_normal(3)).astype(np.float32)
    dep = rng.uniform(400.0, 600.0, (D, H, W)).astype(np.float32)
    rt = jnp.asarray(np.concatenate([rot.ravel(), trans]))

    _, sim = warp_pallas_v8(src, ref, jnp.asarray(dep), rt, w_valid=120,
                            kd=2, emit_entropy=False, interpret=True)
    _, ent = warp_pallas_v8(src, ref, jnp.asarray(dep), rt, w_valid=120,
                            kd=2, emit_entropy=True, interpret=True)
    want = np.asarray(softmax_entropy(jnp.asarray(sim)[None], axis=1)[0, 0])
    np.testing.assert_allclose(np.asarray(ent), want, rtol=1e-5, atol=1e-5)
