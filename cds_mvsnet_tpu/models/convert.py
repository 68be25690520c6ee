"""PyTorch → JAX checkpoint conversion for the released CDS-MVSNet weights.

Maps the reference's ``state_dict`` (SURVEY §2.2 "Pretrained assets": 387
tensors, 983,843 elements incl. BatchNorm buffers) onto this framework's
parameter pytree. The tree structure intentionally mirrors the torch module
paths, so conversion is purely mechanical:

  * conv weights   (O, I, kh, kw)      -> (kh, kw, I, O)       [HWIO]
  * conv3d weights (O, I, kd, kh, kw)  -> (kd, kh, kw, I, O)   [DHWIO]
  * transposed-conv weights (I, O, k..) -> spatially flipped, (k.., I, O)
    (so they apply as a direct conv with lhs_dilation — see layers._deconv)
  * 1-D tensors (biases, norm params/buffers) unchanged
  * ``module.`` DataParallel prefixes stripped; num_batches_tracked dropped
"""

from __future__ import annotations

import io
import pickle
import re
from pathlib import Path
from typing import Any

import numpy as np

Params = dict[str, Any]

_DECONV_PATTERNS = [
    re.compile(r"^refine_network\.deconv\.weight$"),
    re.compile(r"^cost_regularization(\.\d+)?\.conv(7|9|11)\.conv\.weight$"),
]


class _TolerantUnpickler(pickle.Unpickler):
    """Unpickler that stubs out classes we don't ship (the reference stores
    its ConfigParser object inside checkpoints)."""

    _ALLOWED_PREFIXES = ("torch", "collections", "numpy", "builtins", "_codecs")

    def find_class(self, module, name):
        if module.startswith(self._ALLOWED_PREFIXES):
            return super().find_class(module, name)

        class _Stub:
            def __init__(self, *a, **k):
                pass

            def __setstate__(self, state):
                self.__dict__["_state"] = state

            def __reduce__(self):
                return (_Stub, ())

        _Stub.__name__ = name
        _Stub.__module__ = module
        return _Stub


class _PickleShim:
    Unpickler = _TolerantUnpickler
    load = staticmethod(lambda f, **kw: _TolerantUnpickler(f, **kw).load())
    loads = staticmethod(lambda b, **kw: _TolerantUnpickler(io.BytesIO(b), **kw).load())


def load_torch_state_dict(path) -> dict[str, np.ndarray]:
    """Load a reference checkpoint's state_dict as numpy arrays."""
    import torch

    ckpt = torch.load(
        str(path), map_location="cpu", weights_only=False, pickle_module=_PickleShim
    )
    state = ckpt["state_dict"] if isinstance(ckpt, dict) and "state_dict" in ckpt else ckpt
    out = {}
    for k, v in state.items():
        k = k.replace("module.", "", 1) if k.startswith("module.") else k
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = v.detach().cpu().numpy()
    return out


def _is_deconv(key: str) -> bool:
    return any(p.match(key) for p in _DECONV_PATTERNS)


def convert_state_dict(state: dict[str, np.ndarray]) -> Params:
    """Flat torch state_dict -> nested JAX param tree (numpy leaves)."""
    tree: Params = {}
    for key, arr in state.items():
        if _is_deconv(key):
            # (I, O, k...) -> flip spatial, then (k..., I, O)
            spatial = tuple(range(2, arr.ndim))
            arr = np.flip(arr, axis=spatial)
            arr = np.transpose(arr, (*spatial, 0, 1))
        elif arr.ndim == 4:  # conv2d (O, I, kh, kw)
            arr = np.transpose(arr, (2, 3, 1, 0))
        elif arr.ndim == 5:  # conv3d (O, I, kd, kh, kw)
            arr = np.transpose(arr, (2, 3, 4, 1, 0))
        node = tree
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.ascontiguousarray(arr, dtype=np.float32)
    return tree


def convert_checkpoint(path) -> Params:
    return convert_state_dict(load_torch_state_dict(path))


# ---------------------------------------------------------------------------
# Flat (de)serialization — .npz with dotted keys, loadable without torch.
# ---------------------------------------------------------------------------


def flatten_params(tree: Params, prefix: str = "") -> dict[str, Any]:
    """Flatten a nested tree to dotted keys. Leaves are passed through
    untouched (jit-safe: may be tracers)."""
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten_params(v, key))
        else:
            flat[key] = v
    return flat


def unflatten_params(flat: dict[str, np.ndarray]) -> Params:
    tree: Params = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = arr
    return tree


def save_params(path, tree: Params) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in flatten_params(tree).items()})


def load_params(path) -> Params:
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})
