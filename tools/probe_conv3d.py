"""On-device probe for the Pallas conv3d front (ops/pallas/conv3d.py).

Compiles and runs JUST the kernel at per-stage cost-reg shapes on the real
TPU — a ~100x smaller MLIR than the full model, so remote-compile iterations
take seconds-to-a-minute instead of many minutes. Checks numerics against
the XLA conv and reports same-process timing deltas (the only trustworthy
kind under the axon relay — see CLAUDE.md).

Usage: python tools/probe_conv3d.py [stage ...]   (default: 1 2 3)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from cds_mvsnet_tpu.ops.pallas.conv3d import conv3d_front  # noqa: E402

# bench-config (1152x864) cost-reg entry shapes: (C, D, h, w, kd, tr)
STAGES = {
    "1": (32, 48, 216, 288, 4, 24),
    "2": (16, 32, 432, 576, 4, 24),
    "3": (8, 8, 864, 1152, 4, 32),
}


def xla_conv3d(vol, w, b):
    # (C, D, h, w) -> NCDHW conv, stride 1, same padding, + bias + relu
    y = jax.lax.conv_general_dilated(
        vol[None].astype(jnp.float32),
        jnp.transpose(w, (4, 3, 0, 1, 2)).astype(jnp.float32),  # (O, C, 3,3,3)
        (1, 1, 1),
        [(1, 1)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )[0]
    return jnp.maximum(y + b[:, None, None, None], 0.0)


def fetch(x):
    return np.asarray(jax.device_get(x.ravel()[0]))


def main():
    stages = sys.argv[1:] or ["1", "2", "3"]
    O = 8
    for s in stages:
        C, D, h, w, kd, tr = STAGES[s]
        key = jax.random.PRNGKey(int(s))
        vol = jax.random.normal(key, (C, D, h, w), jnp.bfloat16)
        wgt = jax.random.normal(key, (3, 3, 3, C, O), jnp.float32) * 0.1
        bias = jax.random.normal(key, (O,), jnp.float32) * 0.1

        jk = jax.jit(lambda v: conv3d_front(v, wgt, bias, kd=kd, tr=tr))
        jx = jax.jit(lambda v: xla_conv3d(v, wgt, bias))
        try:
            t0 = time.time()
            yk = jk(vol)
            fetch(yk)
            print(f"stage{s}: kernel compiled+ran ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()
            print(f"stage{s}: KERNEL FAILED: {msg[0] if msg else e}")
            for line in msg:
                if "must be aligned" in line or "Mosaic" in line:
                    print("   ", line.strip())
            continue
        yx = jx(vol)
        err = float(jnp.max(jnp.abs(yk.astype(jnp.float32) - yx)))
        ref = float(jnp.max(jnp.abs(yx)))
        print(f"stage{s}: max|diff| {err:.4f} (max|ref| {ref:.2f})")

        # same-process timing: kernel vs XLA (bf16-input conv for fairness)
        jx16 = jax.jit(
            lambda v: jnp.maximum(
                jax.lax.conv_general_dilated(
                    v[None],
                    jnp.transpose(wgt, (4, 3, 0, 1, 2)).astype(jnp.bfloat16),
                    (1, 1, 1),
                    [(1, 1)] * 3,
                    dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
                    preferred_element_type=jnp.float32,
                )[0]
                + bias[:, None, None, None],
                0.0,
            ).astype(jnp.bfloat16)
        )
        fetch(jx16(vol))
        for name, f in (("kernel", jk), ("xla16", jx16)):
            fetch(f(vol))
            n = 10
            t0 = time.time()
            for _ in range(n):
                r = f(vol)
            fetch(r)
            print(f"  {name}: {(time.time() - t0) / n * 1e3:.2f} ms/call")


if __name__ == "__main__":
    main()
