"""Multi-host (multi-process) training support: global dp mesh fed from
host-local data.

The standard pod recipe (jax-ml.github.io/scaling-book): one process per
host, ``jax.distributed.initialize``, a mesh over *all* devices, and
host-local numpy batches lifted into global arrays with
``jax.make_array_from_process_local_data`` — XLA then inserts the gradient
psum over ICI/DCN.

Validated with a REAL 2-process jax.distributed run (CPU + gloo
collectives) in tests/test_dist_2proc.py — process_count()==2, global
mesh, to_global feeding, psum'd eval counts, broadcast resume, and the
cross-host call_freq reduction. Rig notes for reproducing: set
jax_cpu_collectives_implementation=gloo and strip the axon sitecustomize
from PYTHONPATH (it breaks jax.distributed; see the test docstring).
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


def allgather_bytes(data: bytes) -> list[bytes]:
    """All-gather one variable-length byte payload per process (returned
    in process order, identical on every host). Rides the device
    collectives via multihost_utils.process_allgather: payloads are
    length-broadcast, zero-padded to the max, and gathered as uint8
    arrays."""
    from jax.experimental import multihost_utils as mhu
    if jax.process_count() == 1:
        return [data]
    sizes = np.asarray(mhu.process_allgather(
        np.array([len(data)], np.int64))).reshape(-1)
    maxn = int(sizes.max())
    buf = np.zeros(maxn, np.uint8)
    buf[:len(data)] = np.frombuffer(data, np.uint8)
    gathered = np.asarray(mhu.process_allgather(buf))
    return [gathered[i, :int(sizes[i])].tobytes()
            for i in range(jax.process_count())]


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
