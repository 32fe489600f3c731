"""Interleaved A/B of resident-plane training chunks on the real chip:
f32-scan vs f32-pallas vs bf16-scan vs bf16-pallas. One dispatch = K
train steps (multi-second compute), params mutate every dispatch so the
tunnel cannot memoize. Measured 2026-08 on the v5e (B=2048, K=100,
medians of 3 interleaved rounds): f32-scan 56.1k / f32-pallas 83.7k /
bf16-scan 100.7k / bf16-pallas 145.8k samples/s (after removing the
round-1 f32 force-cast at the kernel call site in ops/lstm.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import time

import numpy as np
import jax
import jax.numpy as jnp

from deepsignal_plant_tpu.config import ModelConfig
from deepsignal_plant_tpu.models.bilstm import init_params
from deepsignal_plant_tpu.ops.optim import make_optimizer, step_decay_schedule
from deepsignal_plant_tpu.pipeline.train import make_train_chunk
from deepsignal_plant_tpu.utils.jaxinit import setup_jax

setup_jax()
print("devices:", jax.devices(), flush=True)

K, B = 100, 2048
N = K * B

rng = np.random.default_rng(0)
data_np = [rng.integers(0, 16, (N, 13)).astype(np.int32),
           rng.standard_normal((N, 13), dtype=np.float32),
           np.abs(rng.standard_normal((N, 13), dtype=np.float32)),
           rng.integers(1, 30, (N, 13)).astype(np.float32),
           rng.standard_normal((N, 13, 16), dtype=np.float32)]
labels_np = rng.integers(0, 2, (N,)).astype(np.int32)
perm_np = rng.permutation(N).astype(np.int32)

up = jax.jit(lambda x: x)
data = tuple(up(a) for a in data_np)
labels = up(labels_np)
perm = up(perm_np)
jax.block_until_ready((data, labels, perm))
print(f"resident: {sum(a.nbytes for a in data_np)/1e6:.0f} MB", flush=True)

VARIANTS = {
    "f32-scan   ": ("float32", "scan"),
    "f32-pallas ": ("float32", "pallas"),
    "bf16-scan  ": ("bfloat16", "scan"),
    "bf16-pallas": ("bfloat16", "pallas"),
}

cw = np.array([1.0, 1.0], np.float32)
state = {}
for tag, (cdt, rec) in VARIANTS.items():
    cfg = ModelConfig(dropout_rate=0.5, compute_dtype=cdt, recurrence=rec)
    tx = make_optimizer("Adam", step_decay_schedule(1e-3, K, 2, 0.1))
    chunk = make_train_chunk(cfg, tx, cw, 0.5, K, B, N)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = tx.init(params)
    t0 = time.perf_counter()
    params, opt_state, losses = chunk(params, opt_state, data, labels,
                                      perm, 0, 0, jax.random.PRNGKey(1))
    jax.block_until_ready(losses)
    print(f"{tag} warm (compile+{K} steps): {time.perf_counter()-t0:.1f}s",
          flush=True)
    state[tag] = [chunk, params, opt_state, 1]

rates = {t: [] for t in VARIANTS}
for r in range(3):
    for tag in VARIANTS:
        chunk, params, opt_state, g = state[tag]
        t0 = time.perf_counter()
        params, opt_state, losses = chunk(params, opt_state, data, labels,
                                          perm, 0, g * K,
                                          jax.random.PRNGKey(1))
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        state[tag] = [chunk, params, opt_state, g + 1]
        rates[tag].append(K * B / dt)
        print(f"round {r} {tag}: {dt:.2f}s = {K*B/dt:,.0f} samples/s "
              f"(loss {float(losses[-1]):.4f})", flush=True)

print("--- medians ---", flush=True)
for tag, rs in rates.items():
    print(f"{tag}: {np.median(rs):,.0f} samples/s "
          f"(best {max(rs):,.0f})", flush=True)
