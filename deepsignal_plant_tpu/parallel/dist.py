"""Multi-host runtime: process initialization and input sharding.

The reference's multi-node story is "run the CLI per node on disjoint fast5
subsets and merge the outputs" (SURVEY.md §5.8). The TPU-native equivalent
keeps that data plane — each host ingests its own shard — but runs one JAX
process per host in a single job:

- ``init_distributed()`` wires jax.distributed (coordinator address/rank
  from the standard env vars or explicit args);
- ``shard_for_host(items)`` deterministically partitions a file list over
  processes (round-robin by sorted order, like the reference's manual
  splits);
- call_mods/extract then run unchanged per host (outputs carry a host
  suffix), and call_freq or the combine tools merge downstream — or train
  runs with the batch axis sharded over the global mesh so XLA's psum
  handles gradient sync over ICI/DCN.
"""
from __future__ import annotations

import os
from typing import Sequence, TypeVar

T = TypeVar("T")


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed if a multi-process env is configured.
    Safe to call in single-process runs (no-op)."""
    import jax
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else \
        int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    pid = process_id if process_id is not None else \
        int(os.environ.get("JAX_PROCESS_ID", "0") or 0)
    if addr and nproc > 1:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=nproc, process_id=pid)


def pod_configured() -> bool:
    """True when the multi-process env (the one init_distributed reads)
    is configured — WITHOUT initializing the jax backend. Host-only
    tools (call_freq without --device_agg) use this to decide pod mode:
    calling jax.process_count() would force a backend init (a
    multi-second TPU client grab on remote-attached rigs) in a tool
    that otherwise never touches the device."""
    return bool(os.environ.get("JAX_COORDINATOR_ADDRESS")) and \
        int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0) > 1


def process_info() -> tuple[int, int]:
    """(process_index, process_count) of this host."""
    import jax
    return jax.process_index(), jax.process_count()


def shard_for_host(items: Sequence[T], process_id: int | None = None,
                   process_count: int | None = None) -> list[T]:
    """Deterministic round-robin shard of a work list for this host.

    Always sorts first: directory listings (os.walk/scandir) are not
    ordered consistently across hosts, and every host must agree on the
    partition or files get duplicated/dropped."""
    if process_id is None or process_count is None:
        pid, pcount = process_info()
    else:
        pid, pcount = process_id, process_count
    if pcount == 1:
        return list(items)
    ordered = sorted(items)
    return [x for i, x in enumerate(ordered) if i % pcount == pid]


def host_output_path(path: str) -> str:
    """Suffix per-host outputs so hosts never collide
    (merged later by call_freq / combine tools)."""
    import jax
    if jax.process_count() == 1:
        return path
    root, ext = os.path.splitext(path)
    return f"{root}.host{jax.process_index()}{ext}"
