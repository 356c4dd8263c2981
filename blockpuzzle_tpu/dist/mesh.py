"""Device mesh construction and multi-host initialization (SURVEY.md §2.4).

The reference is single-process with no communication backend; the target
equivalent is JAX's native runtime: ``jax.distributed.initialize`` for the
multi-host process group over DCN, and XLA-compiled collectives over ICI
inside ``jit`` (BASELINE config 5).  The mesh carries two axes:

  * ``dp`` — the env/batch data-parallel axis (envs are independent, so the
    env step needs zero collectives; only learner gradients all-reduce).
  * ``tp`` — a spare tensor-parallel axis for oversized-model experiments
    (Megatron column/row sharding of the Dense layers, SURVEY.md §2.3).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "dp"
MODEL_AXIS = "tp"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host rendezvous over DCN.  No-op when single-process.

    On TPU pods the arguments are auto-detected from the environment;
    explicit values support manual launches.  Safe to call unconditionally:
    single-host runs skip initialization.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("BLOCKPUZZLE_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(dp, tp) mesh over all devices; dp = num_devices // tp.

    ICI-friendly layout: ``tp`` is the minor (fastest-varying) axis so
    tensor-parallel collectives ride neighbor ICI links; ``dp`` spans the
    rest (and DCN across hosts, where only the once-per-update grad psum
    crosses).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % tp:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    arr = np.array(devices).reshape(n // tp, tp)
    return Mesh(arr, (ENV_AXIS, MODEL_AXIS))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading env axis sharded over dp; everything else replicated."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_axis(mesh: Mesh, pytree):
    """Apply env-axis sharding to every array leaf with a leading batch dim."""
    sh = env_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), pytree)
