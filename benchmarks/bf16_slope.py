"""bf16 vs f32 pallas LSTM kernel: slope timing with multi-second compute.

Method (extends docs/BENCH.md round-2 investigation, method 5):
- input uniqueness costs 4 bytes: base xproj is device-resident, each
  dispatch passes a fresh salt scalar folded into the input, so the
  tunnel cannot memoize.
- compute is K chained kernel invocations inside ONE dispatch
  (fori_loop), K chosen so the K2-K1 compute delta is tens of seconds,
  far above the tunnel's seconds-scale jitter.
- per-iteration cost = (t(K2) - t(K1)) / (K2 - K1), several rounds.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp
import functools

from deepsignal_plant_tpu.ops.pallas_lstm import bilstm_recurrence_pallas

T, B, H = 13, 4096, 256
K1, K2 = 200, 2200
ROUNDS = 3

# generate on device: a host upload of this base is ~440 MB through the
# tunnel and can stall for minutes during outage phases
k0, k1 = jax.random.split(jax.random.PRNGKey(0))
base_f32 = (jax.random.normal(k0, (T, 2, B, 4 * H), jnp.float32) * 0.1).block_until_ready()
w_f32 = (jax.random.normal(k1, (2, H, 4 * H), jnp.float32) * 0.05).block_until_ready()
print("base ready on device", flush=True)


def make_fn(dtype, K):
    # base/w passed as args, NOT closed over: jit embeds closure arrays as
    # constants in the compile payload (436 MB -> relay HTTP 413)
    @jax.jit
    def run(base, w, salt):
        dt = base.dtype
        x0 = base * (1 + salt.astype(dt) * jnp.asarray(1e-6, dt))

        def body(i, x):
            y = bilstm_recurrence_pallas(x, w, H)          # (T,2,B,H)
            y4 = jnp.concatenate([y, y, y, y], axis=-1)     # (T,2,B,4H)
            return (x * jnp.asarray(0.9, dt)
                    + y4.astype(dt) * jnp.asarray(0.1, dt))

        xK = jax.lax.fori_loop(0, K, body, x0)
        return jnp.sum(xK.astype(jnp.float32))

    return run


def bench(dtype, tag):
    base = base_f32.astype(dtype).block_until_ready()
    w = w_f32.astype(dtype).block_until_ready()
    fns = {K: make_fn(dtype, K) for K in (K1, K2)}
    # warm up compiles
    for K, f in fns.items():
        t0 = time.perf_counter()
        f(base, w, jnp.float32(0.5)).block_until_ready()
        print(f"{tag} K={K} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    slopes = []
    salt = 1.0
    for r in range(ROUNDS):
        ts = {}
        for K in (K1, K2):
            salt += 1.0
            t0 = time.perf_counter()
            v = fns[K](base, w, jnp.float32(salt)).block_until_ready()
            ts[K] = time.perf_counter() - t0
        slope = (ts[K2] - ts[K1]) / (K2 - K1) * 1e3
        slopes.append(slope)
        print(f"{tag} round {r}: t{K1}={ts[K1]:.2f}s t{K2}={ts[K2]:.2f}s "
              f"slope={slope:.3f} ms/iter (val={float(v):.3e})", flush=True)
    print(f"{tag} slopes: {[f'{s:.3f}' for s in slopes]} "
          f"median={np.median(slopes):.3f} ms/iter", flush=True)
    return float(np.median(slopes))


print("devices:", jax.devices(), flush=True)
f32 = bench(jnp.float32, "f32 ")
bf16 = bench(jnp.bfloat16, "bf16")
print(f"RESULT f32={f32:.3f} ms/iter bf16={bf16:.3f} ms/iter ratio={f32/bf16:.2f}x")
