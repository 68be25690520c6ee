"""Multi-host (pod-scale) initialization and meshes.

SURVEY §2.3: the reference's only parallelism is single-process DataParallel;
multi-process distributed is dead scaffolding there (utils.py:169-209). Here
multi-host data parallelism is first-class: processes join via
``jax.distributed.initialize`` (DCN), and the data mesh spans all hosts'
devices — gradients all-reduce over ICI within a slice and DCN across slices,
entirely through XLA collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize_distributed", "global_data_mesh", "process_local_batch_slice"]


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-host job. With no args, relies on the TPU environment's
    auto-detection (GCE metadata); no-op on single-process setups."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_data_mesh() -> Mesh:
    """1-D data mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), ("data",))


def process_local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this process's shard of a global batch (per-host data
    loading: each host reads only its slice, jax.make_array_from_process_local_data
    assembles the global array)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return i * per, per
