"""Multi-host / multi-slice distribution.

The reference goes multi-node through accelerate/DeepSpeed launchers
(trainers/utils.py:546-550, accelerate_config_14B.yaml) and NCCL process
groups (`dist.init_process_group("nccl")` at wan_video_new.py:316,
denoising_enhancing/wan/distributed/util.py:6-10), with elasticity delegated
to DLRover (README.md:136-138). The TPU-native equivalent is one runtime
call + one global mesh:

  * `initialize()` wraps `jax.distributed.initialize` — coordinator/rank
    discovery comes from explicit args, torchrun-style env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID), or TPU metadata
    (on real pods jax autodetects and every argument may be None);
  * `make_global_mesh(dp=..., fsdp=..., sp=...)` builds a Mesh over ALL
    processes' devices. For multi-slice (DCN-connected) topologies,
    `dcn_dp` adds a leading data-parallel axis laid out across slices via
    `mesh_utils.create_hybrid_device_mesh`, so cross-slice traffic stays on
    the data axis (gradient all-reduce) and model axes ride ICI;
  * `is_main_process()` gates checkpoint/log IO (the accelerate
    `is_main_process` analog); `sync_processes()` is a barrier.

Single-process use is untouched: every function degrades to the local mesh.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    Falls back to env vars COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
    (the torchrun MASTER_ADDR/WORLD_SIZE/RANK analog used by the reference's
    launchers), then to TPU pod autodetection.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    _initialized = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """Gate checkpoint saves / logging (reference: accelerator.is_main_process
    at trainers/utils.py:493-517, rank-0 decode at video_enhancing_batch)."""
    return jax.process_index() == 0


def make_global_mesh(dp: int = 1, fsdp: int = 1, sp: int = 1,
                     dcn_dp: Optional[int] = None) -> Mesh:
    """Mesh over every process's devices (axes dp/fsdp/sp, like
    parallel.mesh.make_mesh but global).

    dcn_dp: number of DCN-connected slices; when given, the dp axis is built
    as (dcn_dp x per-slice dp) with the slice dimension outermost so XLA
    routes only data-parallel collectives over DCN.
    """
    devices = jax.devices()
    n = dp * fsdp * sp
    if dcn_dp is not None:
        from jax.experimental import mesh_utils
        if dp % dcn_dp:
            raise ValueError(f"dp={dp} must be divisible by dcn_dp={dcn_dp}")
        per_slice = (dp // dcn_dp, fsdp, sp)
        arr = mesh_utils.create_hybrid_device_mesh(
            per_slice, (dcn_dp, 1, 1), devices=devices)
        return Mesh(arr, axis_names=("dp", "fsdp", "sp"))
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{fsdp}x{sp} needs {n} devices, "
                         f"have {len(devices)} across "
                         f"{jax.process_count()} processes")
    arr = np.asarray(devices[:n]).reshape(dp, fsdp, sp)
    return Mesh(arr, axis_names=("dp", "fsdp", "sp"))


def sync_processes(name: str = "barrier") -> None:
    """Cross-process barrier (reference: dist.barrier at
    utils/__init__.py:208-210)."""
    if not is_distributed():
        return
    # a tiny all-reduce across all devices acts as the barrier
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def coordination_barrier(name: str = "barrier",
                         timeout_s: float = 1800.0) -> None:
    """Barrier on the coordination SERVICE (no device collective).

    Unlike sync_processes, this never touches the CPU/TPU collective stack,
    so it is safe to use BEFORE the first collective executes. That matters
    on CPU/Gloo: context bootstrap has a hardcoded 30 s key-exchange window
    (GetKeyValue deadline), and if one process reaches its first collective
    while a peer is still compiling — minutes apart on a loaded host — the
    window lapses. AOT-compile, barrier here, then execute.
    """
    if not is_distributed():
        return
    try:
        from jax._src import distributed as _dist
        client = _dist.global_state.client
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))
    except Exception:
        sync_processes(name)  # fallback: device-collective barrier


def broadcast_object(obj, root: int = 0):
    """Broadcast a small python object from `root` to all processes
    (reference: dist.broadcast_object_list for seeds/prompts at
    video_enhancing_batch.py:347-350)."""
    if not is_distributed():
        return obj
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(
        obj, is_source=jax.process_index() == root)
