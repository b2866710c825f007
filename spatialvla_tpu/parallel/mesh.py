"""Device mesh — the framework's communication backend.

The reference's distribution stack (deepspeed.init_distributed + NCCL +
torchrun/SLURM rendezvous, train/dist_utils.py:29-99) is replaced by the
TPU-native equivalent: `jax.distributed.initialize()` for multi-host
bootstrap and a named `jax.sharding.Mesh` over which GSPMD inserts all
collectives (all-reduce over ICI for gradients == DDP; parameter/optimizer
sharding over the fsdp axis == ZeRO-1/2/3; the model axis == tensor
parallelism, which the reference only carries as a vestigial annotation,
modeling_gemma2.py:889).

Axes:
  data   pure data parallelism (gradient all-reduce)
  fsdp   parameter/grad/optimizer-state sharding (ZeRO-3 semantics)
  model  tensor parallelism (attention heads / MLP hidden)
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "model")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = -1  # -1: absorb remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple:
        dims = [self.data, self.fsdp, self.model]
        if -1 in dims:
            known = int(np.prod([d for d in dims if d != -1]))
            dims[dims.index(-1)] = n_devices // known
        assert int(np.prod(dims)) <= n_devices, (
            f"mesh {dims} needs more than the {n_devices} available devices"
        )
        return tuple(dims)


def make_mesh(
    cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    """Builds the named mesh; an explicit shape smaller than the device count
    uses the first prod(shape) devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = cfg.resolve(len(devices))
    n = int(np.prod(shape))
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, AXES)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host bootstrap (replaces dist_utils.init_dist). On single-host
    or preconfigured TPU pods the args are auto-detected."""
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard over the combined (data, fsdp) axes."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
