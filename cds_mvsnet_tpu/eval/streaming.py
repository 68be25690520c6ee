"""Real-time streaming reconstruction: depth from a posed video stream.

Capability parity with the reference's smartphone-video + SLAM demo
(README.md:4; long-range configs use 512 depth planes split 128/32/8 —
README.md:87). A rolling window of posed frames is kept on device; each new
reference frame runs one jitted cascade forward (static shapes -> compiled
once), so the host loop does no per-frame tracing work.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.cds_mvsnet import apply_cds_mvsnet

__all__ = ["StreamingConfig", "StreamingReconstructor"]


@dataclass(frozen=True)
class StreamingConfig:
    window: int = 5  # frames per inference (1 ref + window-1 sources)
    ndepths_full: int = 512  # hypotheses across the full range
    height: int = 480
    width: int = 640
    depth_min: float = 0.3
    depth_max: float = 10.0
    temperature: float = 0.01
    compute_dtype: str = "bfloat16"


class StreamingReconstructor:
    """Push posed frames; get a depth map per push once the window fills.

    Frames: ``(H, W, 3)`` float32 in [0, 1]; cams: packed ``(2, 4, 4)``
    (extrinsic world->cam, intrinsic at full frame resolution).
    """

    def __init__(self, params, stream_cfg: StreamingConfig = StreamingConfig(),
                 model_cfg: ModelConfig | None = None):
        self.cfg = stream_cfg
        # long-range cascade split (reference README.md:87): 512 -> 128/32/8
        self.model_cfg = model_cfg or ModelConfig(
            refine=False, ndepths=(128, 32, 8), depth_intervals_ratio=(4.0, 2.0, 1.0)
        )
        self.params = jax.device_put(params)
        self.frames: deque = deque(maxlen=stream_cfg.window)
        self.cams: deque = deque(maxlen=stream_cfg.window)
        dtype = jnp.bfloat16 if stream_cfg.compute_dtype == "bfloat16" else jnp.float32

        cfg = self.model_cfg

        @jax.jit
        def forward(params, imgs, proj, depth_values):
            outputs, _ = apply_cds_mvsnet(
                params, cfg, imgs, proj, depth_values,
                temperature=stream_cfg.temperature, train=False,
                compute_dtype=dtype,
                feature_impl="s2d" if stream_cfg.height % 8 == 0 else "plain",
            )
            return (
                outputs["refined_depth"],
                outputs[f"stage{cfg.num_stages}"]["photometric_confidence"],
            )

        self._forward = forward
        dv = np.linspace(
            stream_cfg.depth_min, stream_cfg.depth_max, stream_cfg.ndepths_full,
            dtype=np.float32,
        )
        self._depth_values = jnp.asarray(dv[None])

    def reset(self):
        self.frames.clear()
        self.cams.clear()

    @property
    def ready(self) -> bool:
        return len(self.frames) == self.cfg.window

    def push(self, frame: np.ndarray, cam: np.ndarray):
        """Add a posed frame; returns (depth, confidence) for THIS frame as
        the reference view against the previous window-1 frames, or None
        while the window is filling."""
        assert frame.shape[:2] == (self.cfg.height, self.cfg.width), frame.shape
        self.frames.appendleft(np.asarray(frame, np.float32))
        self.cams.appendleft(np.asarray(cam, np.float32))
        if not self.ready:
            return None
        imgs = jnp.asarray(np.stack(self.frames))[None]  # (1, V, H, W, 3)
        cams = np.stack(self.cams)  # (V, 2, 4, 4)
        scales = [1.0, 2.0, 4.0] if not self.model_cfg.refine else [0.5, 1.0, 2.0, 4.0]
        proj = {}
        for i, s in enumerate(scales):
            m = cams.copy()
            m[:, 1, :2, :] *= s / 4.0  # streamed intrinsics are full-res
            proj[f"stage{i + 1}"] = jnp.asarray(m)[None]
        depth, conf = self._forward(self.params, imgs, proj, self._depth_values)
        return np.asarray(depth[0]), np.asarray(conf[0])
