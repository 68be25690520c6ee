"""Two-process jax.distributed smoke test (VERDICT r1 #9: exercise the
multi-host path instead of shipping silent scaffolding).

Each process runs on 2 virtual CPU devices; the pair forms a 4-device global
data mesh over DCN (grpc coordinator on localhost). The child computes a
global mean over a process-locally-assembled sharded array — the exact
assembly pattern multi-host training uses (per-host batch slice +
make_array_from_process_local_data + jit reduction over the mesh).
"""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

CHILD = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cds_mvsnet_tpu.parallel.distributed import (
        global_data_mesh, initialize_distributed, process_local_batch_slice)

    pid = int(sys.argv[1])
    initialize_distributed(
        coordinator_address=sys.argv[2], num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    mesh = global_data_mesh()
    assert mesh.devices.size == 4

    GLOBAL_BATCH = 8
    start, size = process_local_batch_slice(GLOBAL_BATCH)
    assert size == 4 and start == pid * 4, (start, size)
    local = np.arange(start, start + size, dtype=np.float32)[:, None] * np.ones((1, 3), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (GLOBAL_BATCH, 3))

    mean = jax.jit(lambda x: jnp.mean(x), out_shardings=NamedSharding(mesh, P()))(arr)
    got = float(jax.device_get(mean))
    assert abs(got - 3.5) < 1e-6, got  # mean of 0..7
    print("proc{{}} ok".format(pid), flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_mesh(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "child.py"
    script.write_text(CHILD.format(repo=str(REPO)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} ok" in out


def test_sharded_eval_matches_per_view():
    """View-list sharding over the 8-device CPU mesh (SURVEY §2.3 fleet
    parallelism): batched sharded forward == per-view single-device forward,
    including a non-multiple batch (padding path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cds_mvsnet_tpu.config import ModelConfig
    from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet, init_cds_mvsnet
    from cds_mvsnet_tpu.parallel.eval_sharding import make_sharded_eval
    from cds_mvsnet_tpu.parallel.mesh import data_mesh
    from cds_mvsnet_tpu.utils.synthetic import textured_plane_batch

    cfg = ModelConfig(refine=False)
    params = init_cds_mvsnet(jax.random.PRNGKey(0), cfg)

    # 5 distinct "reference view" problems (non-multiple of 8 -> padding)
    batches = [
        textured_plane_batch(V=3, H=64, W=96, D=16, seed=s, plane_depth=550.0 + 20 * s)
        for s in range(5)
    ]
    imgs = jnp.concatenate([jnp.asarray(b["imgs"]) for b in batches])
    proj = {
        k: jnp.concatenate([jnp.asarray(b["proj_matrices"][k]) for b in batches])
        for k in batches[0]["proj_matrices"]
    }
    dv = jnp.concatenate([jnp.asarray(b["depth_values"]) for b in batches])

    mesh = data_mesh(8)
    run = make_sharded_eval(mesh, params, cfg)
    depth, conf = run(imgs, proj, dv)
    assert depth.shape[0] == 5 and conf.shape[0] == 5

    for i in [0, 3, 4]:
        out, _ = apply_cds_mvsnet(
            params, cfg, imgs[i : i + 1],
            {k: v[i : i + 1] for k, v in proj.items()}, dv[i : i + 1],
            temperature=0.01, train=False,
        )
        np.testing.assert_allclose(
            np.asarray(depth[i]), np.asarray(out["refined_depth"][0]), rtol=2e-4, atol=2e-3
        )
