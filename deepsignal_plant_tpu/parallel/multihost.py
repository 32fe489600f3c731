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


def split_i64(v: int) -> list[int]:
    """An int64 as two non-negative int31 words (collective-safe: jax
    silently canonicalizes int64 arrays to int32 when x64 is off, which
    would wrap values >= 2**31 — e.g. byte lengths of >=2 GiB payloads)."""
    return [v >> 31, v & 0x7FFFFFFF]


def join_i64(words) -> np.ndarray:
    """Inverse of split_i64 over a trailing axis of word pairs."""
    w = np.asarray(words, np.int64)
    return (w[..., 0] << 31) + w[..., 1]


def allgather_bytes(data: bytes, chunk_bytes: int = 256 << 20,
                    keep: bool = True) -> list[bytes]:
    """All-gather one variable-length byte payload per process (returned
    in process order). Rides the device collectives via
    multihost_utils.process_allgather: payload lengths are exchanged as
    int31 word pairs (int64 would be canonicalized to int32 and wrap for
    >=2 GiB payloads), then the zero-padded uint8 payloads ride in
    ``chunk_bytes`` rounds so peak transient memory is bounded by
    ``pcount * chunk_bytes`` per round. A host that only participates to
    satisfy the collective passes ``keep=False`` and gets ``[]`` back
    without ever materializing the other hosts' full payloads."""
    from jax.experimental import multihost_utils as mhu
    pcount = jax.process_count()
    if pcount == 1:
        return [data] if keep else []
    n = len(data)
    words = np.asarray(mhu.process_allgather(
        np.array(split_i64(n), np.int32)))
    sizes = join_i64(words.reshape(pcount, 2))
    maxn = int(sizes.max())
    src = np.frombuffer(data, np.uint8)
    out = [bytearray() for _ in range(pcount)] if keep else None
    for off in range(0, maxn, chunk_bytes):
        w = int(min(chunk_bytes, maxn - off))
        buf = np.zeros(w, np.uint8)
        if off < n:
            k = min(w, n - off)
            buf[:k] = src[off:off + k]
        g = np.asarray(mhu.process_allgather(buf))
        if keep:
            for i in range(pcount):
                take = int(min(max(int(sizes[i]) - off, 0), w))
                if take:
                    out[i] += g[i, :take].tobytes()
    return [bytes(b) for b in out] if keep else []


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
