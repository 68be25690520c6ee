"""Minimal repro for the gather16 (bf16 crossbar gather) compile failure.

Context (VERDICT r4 #3): bf16 gather rows move 2x faster than fp32 through
the TPU crossbar, and the v3-generation warp kernel had a ``gather16`` knob
(bf16 band values + int16 lane indices into ``take_along_axis``) that failed
the REMOTE compile server with HTTP 500. This probe binary-searches the
failing feature with four tiny kernels, compiled independently against the
real backend, and prints one result line each:

  ctrl_fp32_i32   fp32 values, int32 idx  — the v3 production form (control)
  g16_bf16_i16    bf16 values, int16 idx  — the gather16 form (the suspect)
  bf16_i32        bf16 values, int32 idx  — bitwidth MISMATCH (Mosaic
                  documents idx/result bitwidths must match; expected reject)
  i16_arith       int16 iota/compare/add only — does 16-bit integer vector
                  code survive lowering at all?

Relevance note: the PRODUCTION warp route (v7m/v8, ops/pallas/warp.py) no
longer performs any in-kernel crossbar gather — the x-select rides an MXU
contraction against a selection matrix, and the band DMA is already bf16.
gather16 could only speed up the archived v3/v6 generations. This probe
exists to close the avenue with a recorded failure mode (or reopen it if a
compile-server update fixed the lowering).

Usage: python tools/probe_gather16.py            # on the TPU backend
       CDS_PROBE_INTERPRET=1 python tools/...    # CPU interpret sanity
"""

from __future__ import annotations

import functools
import os
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

INTERPRET = bool(os.environ.get("CDS_PROBE_INTERPRET"))
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

R, L = 64, 128  # rows x lanes


def _gather_kernel(src_ref, idx_ref, out_ref, *, vdt, idt):
    src = src_ref[...]
    idx = idx_ref[...].astype(idt)
    out_ref[...] = jnp.take_along_axis(src, idx, axis=1).astype(jnp.float32)


def _i16_arith_kernel(src_ref, out_ref):
    i = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1).astype(jnp.int16)
    j = (i + jnp.int16(3)) % jnp.int16(7)
    out_ref[...] = src_ref[...] + jnp.where(j == jnp.int16(2), 1.0, 0.0)


def _run(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        val = float(np.asarray(jax.device_get(out)).sum())
        print(f"{name:16s} OK   checksum={val:.3f}")
        return True
    except Exception as e:  # noqa: BLE001 - probe records every failure mode
        first = str(e).strip().splitlines()
        head = first[0][:160] if first else type(e).__name__
        print(f"{name:16s} FAIL {type(e).__name__}: {head}")
        if os.environ.get("CDS_PROBE_VERBOSE"):
            traceback.print_exc()
        return False


def main():
    rng = np.random.default_rng(0)
    src32 = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32))
    src16 = src32.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, L, (R, L)).astype(np.int32))

    def make(vdt, idt):
        kern = functools.partial(_gather_kernel, vdt=vdt, idt=idt)
        return lambda s, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
            interpret=INTERPRET,
        )(s.astype(vdt), i)

    print(f"backend={jax.default_backend()} interpret={INTERPRET}")
    _run("ctrl_fp32_i32", make(jnp.float32, jnp.int32), src32, idx)
    _run("g16_bf16_i16", make(jnp.bfloat16, jnp.int16), src16, idx)
    _run("bf16_i32", make(jnp.bfloat16, jnp.int32), src16, idx)
    _run(
        "i16_arith",
        lambda s: pl.pallas_call(
            _i16_arith_kernel,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
            interpret=INTERPRET,
        )(s),
        src32,
    )


if __name__ == "__main__":
    main()
