"""Streaming reconstruction API smoke test (CPU, tiny shapes)."""

import jax
import numpy as np

from cds_mvsnet_tpu.config import ModelConfig
from cds_mvsnet_tpu.eval.streaming import StreamingConfig, StreamingReconstructor
from cds_mvsnet_tpu.models.cds_mvsnet import init_cds_mvsnet


def test_streaming_window_and_depth():
    # D must stay divisible through the cost UNet's three stride-2 levels
    cfg = ModelConfig(refine=False, ndepths=(16, 8, 8), depth_intervals_ratio=(4.0, 2.0, 1.0))
    params = init_cds_mvsnet(jax.random.PRNGKey(0), cfg)
    params.pop("refine_network", None)
    sc = StreamingConfig(window=3, ndepths_full=32, height=64, width=128,
                         depth_min=1.0, depth_max=4.0, compute_dtype="float32")
    rec = StreamingReconstructor(params, sc, model_cfg=cfg)

    rng = np.random.default_rng(0)
    f = 4 * 128.0
    results = []
    for i in range(5):
        frame = rng.uniform(0, 1, (64, 128, 3)).astype(np.float32)
        cam = np.zeros((2, 4, 4), np.float32)
        cam[0] = np.eye(4)
        cam[0, 0, 3] = 0.05 * i
        cam[1, :3, :3] = [[f, 0, 64], [0, f, 32], [0, 0, 1]]
        cam[1, 3, 3] = 1
        results.append(rec.push(frame, cam))

    assert results[0] is None and results[1] is None
    for r in results[2:]:
        depth, conf = r
        assert depth.shape == (64, 128)
        assert np.isfinite(depth).all()
        assert (depth >= 1.0 - 1e-3).all() and (depth <= 4.0 + 1e-3).all()
        assert conf.shape[-2:] == (64, 128)

    rec.reset()
    assert not rec.ready
