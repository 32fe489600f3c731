"""Interleaved dispatch_workers A/B on the features-TSV plane at the
auto device_batch (4096). Round 3 set 6 workers (from 4, +38%); this
re-tests the knob after the round-4 loader/routing changes shifted the
host-side cost balance.

Usage: python benchmarks/workers_ab.py [rows] [arm,arm,...] [rounds]
"""
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
ARMS = ([int(a) for a in sys.argv[2].split(",")]
        if len(sys.argv) > 2 else [6, 8, 10])
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 4

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
t0 = time.time()
bench.make_features_file(features, ROWS)
print(f"fixture: {ROWS} rows in {time.time()-t0:.1f}s", flush=True)

ckpt = os.path.join(td.name, "bench.ckpt.npz")
cfg = ModelConfig(dropout_rate=0.0)
cpu0 = jax.devices("cpu")[0]
with jax.default_device(cpu0):
    params = jax.device_get(init_params(jax.random.PRNGKey(0), cfg))
save_checkpoint(ckpt, params, cfg)

mcfg = ModelConfig(dropout_rate=0.0,
                   compute_dtype=resolve_compute_dtype("auto"),
                   recurrence=resolve_recurrence("auto",
                                                 allow_multi_device=True))
engines = {w: CallModsEngine(ckpt, mcfg,
                             CallConfig(device_batch=4096,
                                        dispatch_workers=w))
           for w in ARMS}

out = os.path.join(td.name, "out.tsv")
warm = os.path.join(td.name, "warm.tsv")
bench.make_features_file(warm, 4096)
for w, eng in engines.items():
    eng.run_features_file(warm, out)
    eng.run_features_file(features, out)    # full-pass warm
    print(f"warm w={w} done", flush=True)

rates = {w: [] for w in ARMS}
outs = {w: os.path.join(td.name, f"out_{w}.tsv") for w in ARMS}
for r in range(ROUNDS):
    order = ARMS if r % 2 == 0 else list(reversed(ARMS))
    for w in order:
        st = engines[w].run_features_file(features, outs[w])
        rates[w].append(st.sites_per_s)
        print(f"round {r} w={w}: {st.sites_per_s:,.0f} sites/s", flush=True)

ref_rows = sorted(open(outs[ARMS[0]]).readlines())
for w in ARMS[1:]:
    assert sorted(open(outs[w]).readlines()) == ref_rows, \
        f"workers={w} output differs"
print(f"outputs identical across arms ({len(ref_rows)} rows)")
for w in ARMS:
    print(f"w={w}: median {statistics.median(rates[w]):,.0f} "
          f"best {max(rates[w]):,.0f} all {[round(x) for x in rates[w]]}")
