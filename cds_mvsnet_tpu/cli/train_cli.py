"""Training CLI (the reference train.py: config-driven multi-dataset
training with --lr/--bs overrides and --resume)."""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train CDS-MVSNet (TPU)")
    p.add_argument("-c", "--config", required=True, help="JSON config path")
    p.add_argument("-r", "--resume", default=None, help="checkpoint to resume from")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--bs", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--save_dir", default=None)
    p.add_argument("--n_devices", type=int, default=None, help="data-parallel width")
    return p


def build_loaders(cfg, batch_override=None, n_devices=None):
    from ..data.blended import BlendedMVSDataset
    from ..data.dtu import DTUDataset
    from ..data.loader import DataLoader
    from ..parallel.mesh import batch_sharding, data_mesh

    import jax

    mesh = data_mesh(n_devices) if (n_devices or 0) > 1 else None
    put = (lambda b: jax.device_put(b, batch_sharding(mesh))) if mesh else None

    train_loaders, val_loaders = [], []
    for d in cfg.data:
        cls = {"dtu": DTUDataset, "blended": BlendedMVSDataset}[d.dataset]
        bs = batch_override or d.batch_size
        train_ds = cls(d.datapath, d.listfile, mode="train", nviews=d.nviews,
                       ndepths=d.ndepths, interval_scale=d.interval_scale)
        train_loaders.append(
            DataLoader(train_ds, batch_size=bs, shuffle=True, drop_last=True,
                       device_put_fn=put)
        )
        val_list = Path(d.listfile).with_name(
            "val.txt" if d.dataset == "dtu" else "validation_list.txt"
        )
        if val_list.exists():
            val_ds = cls(d.datapath, str(val_list), mode="val",
                         nviews=5 if d.dataset != "dtu" else d.nviews,
                         ndepths=d.ndepths, interval_scale=d.interval_scale)
            val_bs = 2 if d.dataset == "dtu" else 5
            val_loaders.append(DataLoader(val_ds, batch_size=val_bs, drop_last=True,
                                          device_put_fn=put))
    return train_loaders, val_loaders, mesh


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    from .test_cli import _honor_jax_platforms_env

    _honor_jax_platforms_env()

    from ..config import Config
    from ..models.cds_mvsnet import init_cds_mvsnet
    from ..parallel.mesh import replicate
    from ..training.trainer import Trainer

    cfg = Config.load(args.config)
    if args.lr is not None:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, lr=args.lr))
    if args.epochs is not None:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, epochs=args.epochs))

    train_loaders, val_loaders, mesh = build_loaders(cfg, args.bs, args.n_devices)
    params = init_cds_mvsnet(jax.random.PRNGKey(cfg.train.seed), cfg.model)

    trainer = Trainer(cfg, params, train_loaders, val_loaders, save_dir=args.save_dir)
    if args.resume:
        trainer.resume(args.resume)
    if mesh is not None:
        trainer.state = replicate(mesh, trainer.state)
    trainer.train()


if __name__ == "__main__":
    main()
