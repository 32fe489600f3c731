"""Process-level JAX runtime setup shared by the CLI entrypoints."""
from __future__ import annotations

import os

_allocator_tuned = False


def tune_host_allocator() -> bool:
    """Keep large freed numpy buffers on the glibc heap instead of
    mmap/munmap per batch.

    The host feed allocates ~10-30 MB arrays per parsed block; glibc's
    default M_MMAP_THRESHOLD (128 KB) serves them with fresh mmaps, so
    every batch pays soft page faults on first touch and all parser
    threads serialize on the kernel's mmap lock (measured: 171k -> 260k
    rows/s single-thread, 247k -> 846k with 4 threads on this rig).
    Bounded pipeline depth keeps the retained heap small. No-op off
    glibc/Linux."""
    global _allocator_tuned
    if _allocator_tuned:
        return True
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        ok = bool(libc.mallopt(M_MMAP_THRESHOLD, 1 << 28)) and \
            bool(libc.mallopt(M_TRIM_THRESHOLD, 1 << 28))
        _allocator_tuned = ok
        return ok
    except Exception:
        return False


def setup_jax(compilation_cache: bool = True) -> None:
    """Enable the persistent XLA compilation cache so repeated CLI
    invocations skip recompiles (TPU compiles of the full model can take
    minutes through remote-attached runtimes)."""
    import jax
    tune_host_allocator()
    if compilation_cache:
        cache_dir = os.environ.get(
            "DSP_TPU_COMPILE_CACHE",
            os.path.expanduser("~/.cache/dsp_tpu_xla"))
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              0)
        except Exception:
            pass  # older jax without these flags: in-process cache only


def resolve_recurrence(choice: str = "auto",
                       allow_multi_device: bool = True) -> str:
    """Map the CLI's --recurrence auto|scan|pallas to a concrete impl.

    auto selects the fused pallas kernels on TPU backends (axon = tunneled
    TPU), scan elsewhere. Multi-device meshes run the kernels too: every
    multi-device code path (inference engine, train/eval steps) wraps the
    forward in jax.shard_map, so each device executes the kernel on its
    local batch shard (validated in tests/test_pallas_shardmap.py;
    ``allow_multi_device=False`` restores the round-1 conservative
    scan-on-multi-device behavior for callers outside those paths)."""
    if choice != "auto":
        return choice
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        return "scan"
    if not allow_multi_device and jax.device_count() > 1:
        return "scan"
    return "pallas"


def resolve_compute_dtype(choice: str = "auto") -> str:
    """Map --compute_dtype auto|float32|bfloat16 to a concrete dtype.

    auto selects bfloat16 on TPU backends: matmuls at the MXU's native
    rate (fused recurrence measured 1.76x f32,
    benchmarks/bf16_slope.py). Both recurrences share one
    mixed-precision contract — bf16 storage/matmul operands, f32 gate
    math, f32 cell states, f32 gradient accumulation — and logits
    upcast to f32 before softmax. Measured prob
    deviation vs f32 on the real chip (both recurrences): mean ~3e-5 /
    max ~1.2e-4 with 100.0000% call agreement — far below the
    reference's own run-to-run noise (it draws randn h0/c0 every
    forward, models.py:169-176: mean |dP| 3.8e-3 / max 2.0e-2, self
    call agreement 99.78%). float32 everywhere else (CPU bf16 is
    emulated and slower, and exact f32 keeps golden tests bitwise)."""
    if choice != "auto":
        return choice
    import jax
    return ("bfloat16" if jax.default_backend() in ("tpu", "axon")
            else "float32")
