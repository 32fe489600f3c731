"""Interleaved transfer_dtype A/B on the features-TSV plane.

The round-2/3 transport model (docs/BENCH.md) says host->device wire
bytes bind on remote-attached (axon) rigs: per-site payload is ~466 B
(f16), ~273 B (int8). This
harness measures the arms interleaved (tunnel weather hits all equally,
order reversed on odd rounds per ADVICE r2) and cross-checks that every
arm's OUTPUT calls are recorded for agreement analysis — quantized wire
formats are only worth their speed if calls match the f16 arm.

Usage: python benchmarks/wire_ab.py [rows] [arm,arm,...] [rounds]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import statistics
import tempfile
import time

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
ARMS = (sys.argv[2].split(",") if len(sys.argv) > 2
        else ["float16", "int8"])
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

import bench  # noqa: E402
from deepsignal_plant_tpu.config import CallConfig, ModelConfig  # noqa: E402
from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine  # noqa
from deepsignal_plant_tpu.utils.jaxinit import (resolve_compute_dtype,  # noqa
                                                resolve_recurrence,
                                                setup_jax)

setup_jax()
import jax  # noqa: E402

from deepsignal_plant_tpu.models.bilstm import init_params  # noqa: E402
from deepsignal_plant_tpu.models.convert import save_checkpoint  # noqa: E402

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
engines = {a: CallModsEngine(ckpt, mcfg,
                             CallConfig(device_batch=32768,
                                        dispatch_workers=4,
                                        transfer_dtype=a))
           for a in ARMS}

outs = {a: os.path.join(td.name, f"out_{a}.tsv") for a in ARMS}
warm = os.path.join(td.name, "warm.tsv")
bench.make_features_file(warm, 32768)
for a, eng in engines.items():
    st = eng.run_features_file(warm, outs[a])
    print(f"warm {a}: {st.sites_per_s:.0f} sites/s", flush=True)

rates = {a: [] for a in ARMS}
for r in range(ROUNDS):
    order = ARMS if r % 2 == 0 else list(reversed(ARMS))
    for a in order:
        st = engines[a].run_features_file(features, outs[a])
        rates[a].append(st.sites_per_s)
        print(f"round {r} {a}: {st.sites_per_s:,.0f} sites/s "
              f"({st.seconds:.2f}s)", flush=True)


def calls(path):
    d = {}
    for line in open(path):
        f = line.rstrip("\n").split("\t")
        # key: chrom,pos,strand,read; value: (call, prob1)
        d[(f[0], f[1], f[2], f[4])] = (f[8], float(f[7]))
    return d


base = calls(outs[ARMS[0]])
print(f"\nrows per arm: {len(base)}")
for a in ARMS[1:]:
    c = calls(outs[a])
    assert c.keys() == base.keys()
    agree = sum(base[k][0] == c[k][0] for k in base)
    dp = [abs(base[k][1] - c[k][1]) for k in base]
    print(f"{a} vs {ARMS[0]}: call agreement "
          f"{100.0 * agree / len(base):.4f}%  |dP| mean "
          f"{statistics.mean(dp):.2e} max {max(dp):.2e}")

for a in ARMS:
    print(f"{a}: median {statistics.median(rates[a]):,.0f} "
          f"best {max(rates[a]):,.0f} all "
          f"{[round(x) for x in rates[a]]}")
