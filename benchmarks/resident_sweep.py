"""Resident-plane device_batch sweep: does the measured chip-bound
ceiling (bench.py resident_sites_s, 439k at B=4096) rise with larger
per-step GEMMs? The resident scan's per-step gate matmul is
(B, 512) @ (512, 1024) per layer-direction; B is the only lever that
fattens it (T=13 is fixed, hid 256 is the model). Interleaved arms,
compute-window timing only (upload excluded — the plane's premise).

Usage: python benchmarks/resident_sweep.py [rows] [arm,arm,...] [rounds]
"""
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
ARMS = ([int(a) for a in sys.argv[2].split(",")]
        if len(sys.argv) > 2 else [2048, 4096, 8192, 16384])
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

import bench  # noqa: E402
from deepsignal_plant_tpu.config import CallConfig, ModelConfig  # noqa
from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine  # noqa
from deepsignal_plant_tpu.utils.jaxinit import (resolve_compute_dtype,  # noqa
                                                resolve_recurrence,
                                                setup_jax)

setup_jax()
import jax  # noqa: E402

from deepsignal_plant_tpu.models.bilstm import init_params  # noqa: E402
from deepsignal_plant_tpu.models.convert import save_checkpoint  # noqa

print("devices:", jax.devices(), flush=True)
td = tempfile.TemporaryDirectory()
features = os.path.join(td.name, "features.tsv")
bench.make_features_file(features, ROWS)

ckpt = os.path.join(td.name, "m.npz")
cfg = ModelConfig(dropout_rate=0.0)
cpu0 = jax.devices("cpu")[0]
with jax.default_device(cpu0):
    params = jax.device_get(init_params(jax.random.PRNGKey(0), cfg))
save_checkpoint(ckpt, params, cfg)

mcfg = ModelConfig(dropout_rate=0.0,
                   compute_dtype=resolve_compute_dtype("auto"),
                   recurrence=resolve_recurrence("auto",
                                                 allow_multi_device=True))
engines = {b: CallModsEngine(ckpt, mcfg,
                             CallConfig(device_batch=b,
                                        device_resident="always",
                                        transfer_dtype="float16"))
           for b in ARMS}
out = os.path.join(td.name, "out.tsv")
for b, eng in engines.items():
    eng.run_features_file(features, out)    # warm compile + cache
    print(f"warm b={b} done", flush=True)

rates = {b: [] for b in ARMS}
for r in range(ROUNDS):
    order = ARMS if r % 2 == 0 else list(reversed(ARMS))
    for b in order:
        eng = engines[b]
        eng.run_features_file(features, out)
        prof = eng.last_resident_profile
        if not prof["compute_s"]:
            continue            # degenerate input (no segments)
        rate = prof["rows"] / prof["compute_s"]
        rates[b].append(rate)
        print(f"round {r} b={b}: {rate:,.0f} sites/s compute "
              f"(upload {prof['upload_s']:.2f}s, K={prof['k_chunks']})",
              flush=True)

for b in ARMS:
    if not rates[b]:
        print(f"b={b}: no passes")
        continue
    print(f"b={b}: median {statistics.median(rates[b]):,.0f} "
          f"best {max(rates[b]):,.0f} "
          f"all {[round(x) for x in rates[b]]}")
