#!/usr/bin/env python
"""Convert a released PyTorch CDS-MVSNet checkpoint to this framework's .npz."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help=".pth/.ckpt torch checkpoint")
    p.add_argument("dst", help="output .npz path")
    args = p.parse_args()

    from cds_mvsnet_tpu.models.convert import convert_checkpoint, flatten_params, save_params

    params = convert_checkpoint(args.src)
    save_params(args.dst, params)
    import numpy as np

    flat = flatten_params(params)
    total = sum(np.asarray(v).size for v in flat.values())
    print(f"converted {len(flat)} tensors / {total} elements -> {args.dst}")


if __name__ == "__main__":
    main()
