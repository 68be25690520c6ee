"""Probe: does Mosaic accept a dynamic 128-aligned lane-dim slice of a VMEM
scratch buffer? (v7 warp design depends on it: one wide band DMA per tile +
per-segment gathers at traced 128-multiple offsets.)

Run on the real TPU: python tools/probe_lane_slice.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offs_ref, x_hbm, o_ref, band, sem, *, nseg):
    copy = pltpu.make_async_copy(x_hbm.at[:, :], band, sem)
    copy.start()
    copy.wait()
    acc = jnp.zeros((8, 128), jnp.float32)
    for i in range(nseg):
        # GENUINELY dynamic offset (from input data), provably 128-aligned
        off = (offs_ref[0, i] // 128) * 128
        seg = band[:, pl.ds(off, 128)]  # (8, 128)
        idx = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1), (8, 128)
        )
        acc = acc + jnp.take_along_axis(seg, idx, axis=1)
    o_ref[...] = acc


def main():
    nseg = 4
    x = jnp.arange(8 * 128 * nseg, dtype=jnp.float32).reshape(8, 128 * nseg)
    offs = jnp.arange(nseg, dtype=jnp.int32).reshape(1, nseg) * 128
    out = pl.pallas_call(
        functools.partial(_kernel, nseg=nseg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128 * nseg), jnp.float32), pltpu.SemaphoreType.DMA],
    )(offs, x)
    want = sum(np.asarray(x)[:, i * 128 : (i + 1) * 128][:, :] for i in range(nseg))
    got = np.asarray(out)
    # each segment contributes its own columns via iota gather
    ok = np.allclose(got, want)
    print("dynamic 128-aligned lane slice:", "OK" if ok else f"WRONG {got[0,:3]} vs {want[0,:3]}")


if __name__ == "__main__":
    main()
