"""Interleaved device_batch A/B on the features-TSV plane at steady-state
input size. The round-2 transport model (docs/BENCH.md) fits the relay
round trip as ~220 ms fixed + bytes/34 MB/s, which predicts larger
dispatch units amortize the fixed cost almost linearly — but an earlier
262144-row A/B measured 65536 *worse* (pipeline starvation: 4 units / 4
workers never reaches steady state). This harness re-tests with enough
units per pass (rows/batch >= 8 at the largest arm) and interleaves arms
so tunnel weather hits both equally.

Usage: python benchmarks/batch_ab.py [rows] [arm,arm,...] [rounds]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import statistics
import tempfile
import time

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
ARMS = ([int(a) for a in sys.argv[2].split(",")]
        if len(sys.argv) > 2 else [32768, 65536])
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

import bench  # noqa: E402  (repo root on sys.path via the insert above)
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
engines = {b: CallModsEngine(ckpt, mcfg,
                             CallConfig(device_batch=b, dispatch_workers=4))
           for b in ARMS}

out = os.path.join(td.name, "out.tsv")
warm = os.path.join(td.name, "warm.tsv")
bench.make_features_file(warm, max(ARMS))
for b, eng in engines.items():
    st = eng.run_features_file(warm, out)
    print(f"warm b={b}: {st.sites_per_s:.0f} sites/s", flush=True)

rates = {b: [] for b in ARMS}
outs = {b: os.path.join(td.name, f"out_{b}.tsv") for b in ARMS}
for r in range(ROUNDS):
    # reverse arm order on odd rounds so monotonic within-round drift
    # (tunnel warmup/decay) cancels instead of favoring one arm
    order = ARMS if r % 2 == 0 else list(reversed(ARMS))
    for b in order:
        st = engines[b].run_features_file(features, outs[b])
        rates[b].append(st.sites_per_s)
        print(f"round {r} b={b}: {st.sites_per_s:,.0f} sites/s "
              f"({st.seconds:.2f}s)", flush=True)

# correctness cross-check. Byte identity across BATCH SIZES only holds
# for f16/f32 wires; the int8 wire quantizes with per-batch amax
# scales, so different batch compositions differ in the ~1.5e-4 prob
# band (measured r5: zero call flips) — compare keys + flips + |dP|.
ref_lines = sorted(open(outs[ARMS[0]]).readlines())
wire = engines[ARMS[0]].call_cfg.transfer_dtype
for b in ARMS[1:]:
    lines = sorted(open(outs[b]).readlines())
    if wire in ("float16", "float32"):
        assert lines == ref_lines, \
            f"device_batch={b} output differs from device_batch={ARMS[0]}"
    else:
        import numpy as _np
        ka = [ln.split("\t")[:6] for ln in ref_lines]
        kb = [ln.split("\t")[:6] for ln in lines]
        assert ka == kb, f"device_batch={b} site keys differ"
        pa = _np.array([[float(ln.split("\t")[6]), float(ln.split("\t")[7])]
                        for ln in ref_lines])
        pb = _np.array([[float(ln.split("\t")[6]), float(ln.split("\t")[7])]
                        for ln in lines])
        flips = int(((pa[:, 1] > pa[:, 0]) != (pb[:, 1] > pb[:, 0])).sum())
        dp = float(_np.abs(pa - pb).max())
        assert flips == 0 and dp < 2e-3, (flips, dp)
        print(f"b={b}: int8 per-batch-scale band vs {ARMS[0]}: "
              f"max|dP|={dp:.2e}, 0 flips")
print(f"outputs consistent across arms ({len(ref_lines)} rows, "
      f"wire={wire})")

for b in ARMS:
    print(f"b={b}: median {statistics.median(rates[b]):,.0f} "
          f"best {max(rates[b]):,.0f} all "
          f"{[round(x) for x in rates[b]]}")
