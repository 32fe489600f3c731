"""Device-mesh and sharding helpers.

The reference scales with process-level pipeline + round-robin GPU placement
(call_modifications.py:523-529); the TPU-native equivalent is a
``jax.sharding.Mesh`` with batch-axis data parallelism: model parameters are
replicated, the site-batch axis is sharded over all devices, and XLA inserts
the collectives (SURVEY.md §5.8).

Axis convention:
    "dp"  — data-parallel over the site/sample batch axis (ICI-friendly;
            the model is a 13-step classifier, so DP is the whole story —
            there is no sequence/tensor axis worth sharding at H=256).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    """A 1-D data-parallel mesh over ``devices`` (default: this process's
    addressable devices — pipelines feed host-local numpy batches, which
    cannot target other hosts' devices; multi-host scaling shards input
    files per host instead, parallel/dist.py)."""
    devices = devices if devices is not None else jax.local_devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def local_batch_target(device_batch: int, mesh: Mesh, axis: str = "dp") -> int:
    """Round a requested device batch up so it divides evenly over the mesh."""
    ndev = mesh.shape[axis]
    return pad_to_multiple(device_batch, ndev)
