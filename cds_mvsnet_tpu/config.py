"""Typed configuration for the framework (replaces the reference's JSON +
reflection `ConfigParser`; SURVEY §5.6 calls for one typed config with no
dead flags)."""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (reference: CDSMVSNet.__init__ args,
    configs/config_dtu.json arch.args)."""

    refine: bool = True
    ndepths: tuple[int, ...] = (48, 32, 8)
    depth_intervals_ratio: tuple[float, ...] = (4.0, 2.0, 1.0)
    share_cr: bool = False
    cr_base_chs: tuple[int, ...] = (8, 8, 8)
    grad_method: str = "detach"  # "detach" | "undetach"
    arch_mode: str = "fpn"

    @property
    def num_stages(self) -> int:
        return len(self.ndepths)

    # Working-resolution scale per cascade stage (reference model.py:115-125).
    stage_scales: tuple[float, ...] = (4.0, 2.0, 1.0)


@dataclass(frozen=True)
class DataConfig:
    datapath: str = ""
    listfile: str = ""
    dataset: str = "dtu"  # dtu | blended | general
    nviews: int = 5
    ndepths: int = 192
    interval_scale: float = 1.06
    max_h: int = 864
    max_w: int = 1152
    fix_res: bool = False
    batch_size: int = 1
    shuffle: bool = False


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 30
    lr: float = 0.01
    weight_decay: float = 0.01
    momentum: float = 0.0  # torch SGD default; reference config sets none
    lr_step: int = 3
    lr_gamma: float = 0.5
    dlossw: tuple[float, ...] = (0.5, 1.0, 2.0)
    depth_scale: float = 1.0
    save_period: int = 1
    eval_freq: int = 3
    logging_every: int = 50
    seed: int = 123
    early_stop: int = 10
    monitor: str = "min val_loss"
    # "fp32" (reference-parity) or "bf16": conv/feature/volume compute dtype
    # of the train step; master params, loss, softmaxes stay fp32 (§5.7)
    compute_dtype: str = "fp32"
    # jax.checkpoint the FeatureNet in the train step: its full-resolution
    # dynamic-conv intermediates dominate the HBM peak. Default ON — the
    # reference-parity config (fp32, DTU 512x640, B=2) overflows a 16G chip
    # by ~180M without it (measured: with remat it runs at 1.491 s/step);
    # the recompute costs bf16 +6% (0.975 vs 0.919 s/step), turn off for
    # memory-comfortable bf16 runs. Bit-exact (tests/test_train_remat.py).
    remat_features: bool = True


@dataclass(frozen=True)
class Config:
    name: str = "cds_mvsnet_tpu"
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: tuple[DataConfig, ...] = ()
    save_dir: str = "saved"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "Config":
        raw = json.loads(text)

        def tupled(d, cls):
            fields = {f.name: f for f in dataclasses.fields(cls)}
            kw = {}
            for k, v in d.items():
                if k not in fields:
                    continue
                if isinstance(v, list):
                    v = tuple(v)
                kw[k] = v
            return cls(**kw)

        return Config(
            name=raw.get("name", "cds_mvsnet_tpu"),
            model=tupled(raw.get("model", {}), ModelConfig),
            train=tupled(raw.get("train", {}), TrainConfig),
            data=tuple(tupled(d, DataConfig) for d in raw.get("data", [])),
            save_dir=raw.get("save_dir", "saved"),
        )

    @staticmethod
    def load(path) -> "Config":
        return Config.from_json(Path(path).read_text())
