"""Benchmark: DTU-config depth-map inference throughput on one TPU chip.

Measures depth maps/sec/chip at the BASELINE.json metric point (1152x864,
5 views, 192 depth hypotheses — reference test.py defaults; refinement off,
as required for 864-divisibility, matching scripts/tt_eval.sh's no-refine
eval mode). Prints ONE JSON line.

``vs_baseline`` compares against an assumed A100-PyTorch per-view throughput
of 4.0 maps/s for the reference implementation at this operating point (the
repo publishes no runtime number — README.md:4 says only "real-time"; 4 maps/s
is a generous estimate for a CasMVSNet-class network at 1152x864 on A100).
BASELINE.json's target is vs_baseline >= 8.

Failure behavior (the reference's test.py:198-214,263 always reports a
latency line; we always report a JSON line): if the remote TPU relay is down
the backend probe fails fast with bounded retries and this script prints a
machine-readable ``{"error": "relay_down", ...}`` line instead of hanging or
dumping a traceback. A watchdog alarm bounds the whole run.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

A100_PYTORCH_MAPS_PER_SEC = 4.0

# BENCH_CONFIG=default: the BASELINE.json metric point (1152x864, no refine,
# reference test.py defaults). BENCH_CONFIG=protocol: the published DTU
# protocol point (1152x1536 WITH refinement, scripts/dtu_eval.sh) — the
# configuration that produces the 0.315 mm table.
if os.environ.get("BENCH_CONFIG", "default") == "protocol":
    H, W, V, D, REFINE = 1152, 1536, 5, 192, True
else:
    H, W, V, D, REFINE = 864, 1152, 5, 192, False
# Ref-view batching (the eval CLI's --batch_size): B maps share ONE jitted
# dispatch, amortizing the ~33 ms fixed relay round trip; stage_net's B>1
# unroll keeps the B=1 Pallas kernel route per slice, bit-exact
# (tests/test_stage_batch.py). Measured r4 (tools/bench_batch.py, same
# process): default point B=1 345.4 / B=2 329.2 / B=4 322.9 ms/map;
# protocol point (refine on) B=1 154.7 / B=2 140.6 / B=4 137.7 ms/map —
# B=4 fits HBM and wins at both points. B=8's unrolled program fails the
# remote compile server (HTTP 500), and would only amortize ~8 ms/map more.
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
# Operating-point knobs (fast presets, README "operating points"): D is the
# stage-1 sweep size (reference test.py --numdepth), NDEPTHS the per-stage
# refined counts (reference CDSMVSNet ndepths). Defaults = the published
# protocol; the quality gate below measures what a preset costs in mm.
D = int(os.environ.get("BENCH_NUMDEPTH", str(D)))
NDEPTHS = tuple(
    int(x) for x in os.environ.get("BENCH_NDEPTHS", "48,32,8").split(",")
)
# the 3-level cost-reg UNet strides depth 2x three times: counts must be %8
assert len(NDEPTHS) == 3 and not any(d % 8 for d in NDEPTHS), NDEPTHS
WARMUP = 2
ITERS = 8

# Every output path emits exactly one JSON line. Error records carry
# value 0.0 so downstream tooling never mistakes a failed run for a number.
def _emit_error(kind: str, detail: str) -> None:
    print(
        json.dumps(
            {
                "metric": f"DTU depth maps/sec/chip at {W}x{H}, {V} views, {D} depths",
                "value": 0.0,
                "unit": "maps/sec/chip",
                "vs_baseline": 0.0,
                "error": kind,
                "detail": detail[:400],
            }
        ),
        flush=True,
    )


def _watchdog(signum, frame):  # pragma: no cover - timing dependent
    _emit_error("watchdog_timeout", "bench exceeded its wall-clock budget (relay flap mid-run?)")
    os._exit(1)


def _probe_backend(timeout_s: float, attempts: int, budget_s: float) -> tuple[bool, str]:
    """Fast-fail probe of the default (axon TPU) backend in a subprocess.

    A hung relay makes in-process ``jax.devices()`` block for minutes with no
    timeout; a subprocess can be killed. One tiny jitted op + host transfer
    proves dispatch AND readback work end to end.

    The relay demonstrably flaps for minutes at a time (it zeroed the r2 AND
    r4 driver captures), so the probe retries with exponential backoff until
    ``attempts`` are spent or ``budget_s`` of wall clock has elapsed — one
    flap must not forfeit the round's only externally-verified number.
    """
    code = (
        "import jax, numpy as np\n"
        "x = jax.numpy.ones((8, 128))\n"
        "y = jax.jit(lambda a: (a * a).sum())(x)\n"
        "print('OK', float(np.asarray(jax.device_get(y))))\n"
    )
    last = ""
    t_start = time.monotonic()
    for i in range(attempts):
        remaining = budget_s - (time.monotonic() - t_start)
        if remaining <= 5.0:
            return False, f"probe budget ({budget_s:.0f}s) exhausted; last: {last}"
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=min(timeout_s, remaining),
                capture_output=True, text=True,
            )
            if r.returncode == 0 and "OK" in r.stdout:
                return True, ""
            last = (r.stderr or r.stdout).strip().splitlines()[-1] if (r.stderr or r.stdout) else "rc!=0"
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {min(timeout_s, remaining):.0f}s"
        if i + 1 < attempts:
            backoff = min(10.0 * (1.6 ** i), 120.0)
            backoff = min(backoff, max(0.0, budget_s - (time.monotonic() - t_start)))
            if backoff > 0:
                time.sleep(backoff)
    return False, last


def main():
    signal.signal(signal.SIGALRM, _watchdog)
    # Probe phase gets its own watchdog window: a relay flap is survivable
    # (retries below), a hard hang is not. The run-phase alarm is re-armed
    # after the probe succeeds so probe retries never eat the run budget.
    probe_budget = float(os.environ.get("BENCH_PROBE_BUDGET_S", "900"))
    signal.alarm(int(probe_budget) + 120)
    ok, why = _probe_backend(
        timeout_s=float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "120")),
        attempts=int(os.environ.get("BENCH_PROBE_ATTEMPTS", "10")),
        budget_s=probe_budget,
    )
    if not ok:
        _emit_error("relay_down", why)
        sys.exit(1)

    # A cold-cache compile of the B>1 unrolled program on the remote compile
    # server can exceed the B=1 budget several-fold; repeat runs hit the
    # persistent compilation cache and finish in ~1 min either way.
    default_budget = "540" if BATCH == 1 else "1800"
    signal.alarm(int(os.environ.get("BENCH_WALL_BUDGET_S", default_budget)))

    import jax
    import jax.numpy as jnp
    import numpy as np

    # Persistent compilation cache: the full-model TPU compile takes minutes;
    # cache hits make repeat bench runs start in seconds.
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/cds_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from cds_mvsnet_tpu.config import ModelConfig
    from cds_mvsnet_tpu.models import layers
    from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet, init_cds_mvsnet

    # default = bf16 MXU passes (the throughput configuration; parity/quality
    # is validated separately in fp32 by the test suite)
    precision = os.environ.get("BENCH_PRECISION", "default")
    layers.set_default_precision(
        jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    )
    compute_dtype = (
        jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    )

    cfg = ModelConfig(refine=REFINE, ndepths=NDEPTHS)
    ckpt = "/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth"
    if os.path.exists(ckpt):
        from cds_mvsnet_tpu.models.convert import convert_checkpoint

        params = convert_checkpoint(ckpt)
        if not REFINE:
            params.pop("refine_network", None)
    else:
        params = init_cds_mvsnet(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)

    # Textured-plane scene: geometrically consistent views with coherent
    # depth structure, the workload shape of real DTU scans (random-noise
    # images produce pathological incoherent depth hypotheses that no real
    # capture exhibits).
    from cds_mvsnet_tpu.utils.synthetic import textured_plane_batch

    batch = jax.tree.map(
        jnp.asarray, textured_plane_batch(V=V, H=H, W=W, D=D, refine=REFINE)
    )
    gt_depth = float(np.asarray(batch.pop("gt_plane_depth")))  # constant-z plane
    if BATCH > 1:
        batch = jax.tree.map(
            lambda x: jnp.concatenate([x] * BATCH, axis=0), batch
        )

    @jax.jit
    def forward(params, imgs, proj, depth_values):
        outputs, _ = apply_cds_mvsnet(
            params, cfg, imgs, proj, depth_values, temperature=0.01, train=False,
            compute_dtype=compute_dtype, feature_impl="s2d",
        )
        return (
            outputs["refined_depth"],
            outputs["stage3"]["photometric_confidence"],
            outputs["stage3"]["depth"],
        )

    args = (params, batch["imgs"], batch["proj_matrices"], batch["depth_values"])

    def run_once():
        out = forward(*args)
        # block_until_ready is not a reliable barrier under the remote-TPU
        # relay; a host transfer is. Pull one scalar to force full execution.
        float(out[0][0, 0, 0])

    for _ in range(WARMUP):
        run_once()

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    # Pipelined steady-state throughput: dispatch every iteration before
    # syncing any (the production eval loop overlaps the next view's compute
    # with the previous view's host transfer — eval/depth_inference.py), so
    # per-call relay latency hides behind device work. Both rates are
    # reported under distinct keys; `value` is the pipelined rate.
    t0 = time.perf_counter()
    outs = [forward(*args) for _ in range(ITERS)]
    for o in outs:
        float(o[0][0, 0, 0])
    dt_pipe = (time.perf_counter() - t0) / ITERS

    maps_per_sec = BATCH / min(dt, dt_pipe)
    # Label the headline by which measurement actually won (VERDICT r3 weak
    # #2: a blocking rate tagged "[pipelined]" breaks cross-round comparisons).
    rate_tag = "[pipelined]" if dt_pipe <= dt else "[blocking]"

    # Quality gate on the same run: the fixture has exact closed-form GT, so
    # every bench also checks the fast path's numerics. Current level on this
    # scene: 0.397 mm median (bf16, v8 warp route); fp32 golden 0.40 mm.
    # Gate hard at 0.5 mm — a numerics regression must fail the bench, not
    # ship a green number (VERDICT r2 weak #3). In protocol mode (refine on)
    # the cascade runs at HALF input resolution (model.py:146-147 semantics),
    # so the per-pixel depth footprint is ~2.4x the default config's and the
    # fixture's cascade level is ~0.96 mm (measured r3: stage3 0.963,
    # refined 0.952 pallas front / 0.956 s2d front — front-independent, and
    # refine parity vs the torch reference is golden-tested in
    # tests/test_model_parity.py). The hard gates ride the calibrated level
    # (VERDICT r3 weak #6): stage3 depth at 1.1 mm, refined at 1.2 mm — both
    # ~15-25% above the measured 0.96 mm so a half-regression trips them.
    out_f = forward(*args)
    depth = np.asarray(jax.device_get(out_f[2 if REFINE else 0]))[0]
    med_err = float(np.median(np.abs(depth - gt_depth)))
    gate_default = "1.1" if REFINE else "0.5"
    if REFINE:
        ref_err = float(
            np.median(np.abs(np.asarray(jax.device_get(out_f[0]))[0] - gt_depth))
        )
        if not ref_err < float(os.environ.get("BENCH_REFINE_GATE_MM", "1.2")):
            _emit_error("quality_gate", f"refined median_depth_err_mm={ref_err:.4f} >= gate")
            sys.exit(1)
    if not med_err < float(os.environ.get("BENCH_QUALITY_GATE_MM", gate_default)):
        _emit_error("quality_gate", f"median_depth_err_mm={med_err:.4f} >= gate")
        sys.exit(1)

    signal.alarm(0)
    print(
        json.dumps(
            {
                "metric": f"DTU depth maps/sec/chip at {W}x{H}, {V} views, {D} depths"
                + (f" [ndepths={','.join(map(str, NDEPTHS))}]" if NDEPTHS != (48, 32, 8) else "")
                + (" (protocol: refine on)" if REFINE else "")
                + (f" [B={BATCH} batched dispatch]" if BATCH > 1 else "")
                + " " + rate_tag,
                "value": round(maps_per_sec, 4),
                "unit": "maps/sec/chip",
                "vs_baseline": round(maps_per_sec / A100_PYTORCH_MAPS_PER_SEC, 4),
                "pipelined_maps_per_sec": round(BATCH / dt_pipe, 4),
                "blocking_maps_per_sec": round(BATCH / dt, 4),
                "batch": BATCH,
                "latency_s": round(dt, 4),
                "median_depth_err_mm": round(med_err, 3),
                **({"refined_depth_err_mm": round(ref_err, 3)} if REFINE else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
