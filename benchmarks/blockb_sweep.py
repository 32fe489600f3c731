"""block_b sweep, hardened: non-converging loop (value must depend on
salt), print raw times and values, and bust caches with a fresh ~53KB
random array per call (scalar salts appear to be memoized by the relay
in some phases)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp

from deepsignal_plant_tpu.ops.pallas_lstm import bilstm_recurrence_pallas

T, B, H = 13, 4096, 256
K1, K2 = 200, 2200

k0, k1 = jax.random.split(jax.random.PRNGKey(0))
base = (jax.random.normal(k0, (T, 2, B, 4 * H), jnp.bfloat16) * 0.1
        ).block_until_ready()
w = (jax.random.normal(k1, (2, H, 4 * H), jnp.bfloat16) * 0.05
     ).block_until_ready()
print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(99)


def fresh_noise():
    # (13, 2, 1, 1024)-broadcastable fresh bytes, ~53KB
    return jnp.asarray(rng.standard_normal((T, 2, 1, 4 * H))
                       .astype(np.float16) * 0.01)


def make_fn(K, block_b):
    @jax.jit
    def run(base, w, noise):
        dt = base.dtype
        x0 = base + noise.astype(dt)

        def body(i, x):
            y = bilstm_recurrence_pallas(x, w, H, block_b=block_b)
            y4 = jnp.concatenate([y, y, y, y], axis=-1)
            # renormalized mix: keeps the state alive (no decay to zero)
            m = y4.astype(jnp.float32)
            m = m / (jnp.sqrt(jnp.mean(m * m)) + 1e-3)
            return (x * jnp.asarray(0.7, dt)
                    + m.astype(dt) * jnp.asarray(0.3, dt))

        xK = jax.lax.fori_loop(0, K, body, x0)
        return jnp.sum(jnp.abs(xK.astype(jnp.float32)))
    return run


for block_b in (256, 512):
    fns = {K: make_fn(K, block_b) for K in (K1, K2)}
    for K, f in fns.items():
        t0 = time.perf_counter()
        v = f(base, w, fresh_noise()).block_until_ready()
        print(f"  warm block_b={block_b} K={K}: {time.perf_counter()-t0:.2f}s "
              f"val={float(v):.6e}", flush=True)
    for r in range(3):
        ts = {}
        for K in (K1, K2):
            t0 = time.perf_counter()
            v = fns[K](base, w, fresh_noise()).block_until_ready()
            ts[K] = time.perf_counter() - t0
            print(f"  block_b={block_b} r{r} K={K}: {ts[K]:.3f}s "
                  f"val={float(v):.6e}", flush=True)
        print(f"block_b={block_b} r{r}: slope "
              f"{(ts[K2]-ts[K1])/(K2-K1)*1e3:.3f} ms/iter", flush=True)
