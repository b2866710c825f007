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
  sp     optional sequence parallelism (size 1 unless requested): the axis
         parallel/ring_attention.py rotates K/V shards over; lay it on a
         physical ICI ring
  pipe   optional pipeline parallelism (size 1 unless requested): depth-wise
         decoder stages with GPipe microbatching (parallel/pipeline.py);
         lay it on a physical ICI ring so stage handoffs are one hop
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "model", "sp", "pipe")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = -1  # -1: absorb remaining devices
    model: int = 1
    sp: int = 1  # sequence parallelism (ring attention)
    pipe: int = 1  # pipeline parallelism (GPipe stages)

    def resolve(self, n_devices: int) -> tuple:
        dims = [self.data, self.fsdp, self.model, self.sp, self.pipe]
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
) -> tuple:
    """Multi-host bootstrap (replaces the reference's init_dist,
    train/dist_utils.py:29-99, which rendezvouses via torchrun/OMPI/SLURM
    env). Resolution order:

      1. explicit args (or SPATIALVLA_COORDINATOR / _NUM_PROCESSES /
         _PROCESS_ID env vars) -> jax.distributed.initialize with them;
      2. a cluster launcher environment (SLURM, OMPI, or a TPU pod) ->
         jax.distributed.initialize() with JAX's built-in auto-detection;
      3. otherwise single-process: no-op.

    On the CPU backend, cross-process collectives use the gloo transport.
    Returns (process_index, process_count). Must run before any other JAX
    backend touch in multi-process settings.
    """
    env = os.environ
    coordinator_address = coordinator_address or env.get("SPATIALVLA_COORDINATOR")
    if num_processes is None and env.get("SPATIALVLA_NUM_PROCESSES"):
        num_processes = int(env["SPATIALVLA_NUM_PROCESSES"])
    if process_id is None and env.get("SPATIALVLA_PROCESS_ID"):
        process_id = int(env["SPATIALVLA_PROCESS_ID"])

    explicit = coordinator_address is not None and num_processes is not None
    auto = (
        int(env.get("SLURM_NTASKS", "1")) > 1
        or int(env.get("OMPI_COMM_WORLD_SIZE", "1")) > 1
        or len(env.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1
    )
    if not (explicit or auto):
        return jax.process_index(), jax.process_count()

    platforms = jax.config.jax_platforms or env.get("JAX_PLATFORMS", "")
    if "cpu" in str(platforms):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def honor_jax_platforms_env() -> None:
    """CLI-entry helper: make the JAX_PLATFORMS env var win over a
    sitecustomize that force-registers an accelerator plugin and overwrites
    the jax_platforms config at interpreter start. Called only from the
    ``__main__`` blocks of the training CLIs — library callers (tests,
    notebooks) manage jax.config themselves."""
    envp = os.environ.get("JAX_PLATFORMS")
    cfgp = jax.config.jax_platforms
    if envp and (not cfgp or cfgp.split(",")[0] != envp.split(",")[0]):
        jax.config.update("jax_platforms", envp)


def form_global_batch(mesh: Mesh, batch: dict, pspec=None) -> dict:
    """Assemble per-process host-local batch shards into global jax.Arrays
    (the multi-host replacement for feeding numpy straight into jit: each
    host contributes batch_global/process_count rows, mirroring the
    reference's per-rank dataset sharding, data/dataset.py:82,115-119)."""
    if jax.process_count() == 1:
        return batch
    sharding = NamedSharding(mesh, pspec if pspec is not None else P(("data", "fsdp")))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard over the combined (data, fsdp) axes."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
