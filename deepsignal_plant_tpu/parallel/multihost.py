"""Multi-host (multi-process) training support: global dp mesh fed from
host-local data.

The standard pod recipe (jax-ml.github.io/scaling-book): one process per
host, ``jax.distributed.initialize``, a mesh over *all* devices, and
host-local numpy batches lifted into global arrays with
``jax.make_array_from_process_local_data`` — XLA then inserts the gradient
psum over ICI/DCN.

Validated in this repo in degenerate single-process mode and on the
virtual multi-device CPU mesh (this rig has one TPU chip and its jaxlib
has no multi-process CPU collectives); the code paths are the standard
ones and carry no rig-specific assumptions.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_mesh(axis: str = "dp") -> Mesh:
    """Mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_row_shard(n_rows: int, pid: int | None = None,
                   pcount: int | None = None) -> np.ndarray:
    """This host's row indices (strided round-robin) of a dataset every
    host loaded identically."""
    if pid is None:
        pid, pcount = jax.process_index(), jax.process_count()
    return np.arange(pid, n_rows, pcount)


def to_global(sharding: NamedSharding, local_tree,
              global_batch: int):
    """Lift a pytree of host-local numpy arrays (leading axis =
    local_batch) into global arrays whose leading axis is
    ``global_batch``, sharded over the mesh's dp axis."""

    def lift(x):
        x = np.asarray(x)
        gshape = (global_batch,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, gshape)

    return jax.tree.map(lift, local_tree)


def global_scalar_sum(values: np.ndarray, mesh: Mesh) -> np.ndarray:
    """Sum a small per-host vector across processes (for metric counts):
    lift per-host rows into a (pcount, k) global array and reduce on
    device."""
    pcount = jax.process_count()
    if pcount == 1:
        return np.asarray(values, np.float64)
    import jax.numpy as jnp
    sharding = NamedSharding(mesh, P("dp"))
    # replicate each host's row over its local devices so the global array
    # is (pcount * local_devices, k); divide by local device count after
    ldev = len(mesh.local_devices)
    local = np.tile(np.asarray(values, np.float32)[None, :], (ldev, 1))
    garr = jax.make_array_from_process_local_data(
        sharding, local, (pcount * ldev, len(values)))
    total = jax.jit(lambda x: jnp.sum(x, axis=0),
                    out_shardings=NamedSharding(mesh, P()))(garr)
    return np.asarray(jax.device_get(total), np.float64) / ldev
