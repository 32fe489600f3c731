"""True 2-process jax.distributed test of train_loop's multihost branch.

Round 1 validated the pod code paths only in degenerate single-process
mode. This launches two real processes over jax.distributed (CPU + gloo
collectives), giving process_count()==2, and drives the full multihost
train path: host row-sharding, to_global batch lifting, the psum'd
eval-counts step, and the pid-0-reads + broadcast-to-all resume (pid 1's
model_dir deliberately holds no state, so its resume epoch can only come
from the broadcast).

Rig notes (the round-1 "jaxlib limitation" pinned):
- multi-process CPU needs jax_cpu_collectives_implementation=gloo (the
  default leaves each process with a 1-device world).
- the axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the
  tunnel PJRT plugin in every process and breaks jax.distributed
  (process_count stays 1; the coordination service CHECK-crashes in
  WatchJobState). The workers therefore run with that entry stripped.
"""
import os
import socket
import subprocess
import sys

import numpy as np

from make_synthetic import synth_feature_rows, write_feature_file

_WORKER = '''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
data = sys.argv[3]; out = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

from deepsignal_plant_tpu.config import ModelConfig, TrainConfig
from deepsignal_plant_tpu.io.dataset import FeatureDataset
from deepsignal_plant_tpu.pipeline.train import train_loop

model_cfg = ModelConfig(hidden_size=16, dropout_rate=0.1)
train_ds = FeatureDataset.from_file(os.path.join(data, "train.tsv"))
valid_ds = FeatureDataset.from_file(os.path.join(data, "valid.tsv"))

# pid 1 gets its own (state-less) model_dir: resume state can only reach
# it through the broadcast from pid 0
model_dir = out if pid == 0 else out + "_p1"
os.makedirs(model_dir, exist_ok=True)

cfg1 = TrainConfig(batch_size=32, max_epoch_num=1, min_epoch_num=1,
                   step_interval=10, device_resident="never")
res1 = train_loop(model_cfg, cfg1, train_ds, valid_ds, model_dir,
                  verbose=False)
print("RUN1 pid=%d epochs=%d" % (pid, res1["epochs_run"]), flush=True)

cfg2 = TrainConfig(batch_size=32, max_epoch_num=2, min_epoch_num=1,
                   step_interval=10, device_resident="never")
res2 = train_loop(model_cfg, cfg2, train_ds, valid_ds, model_dir,
                  verbose=True, resume=True)
leaves = jax.tree.leaves(res2["params"])
checksum = float(sum(abs(x).sum() for x in leaves))
print("RUN2 pid=%d epochs=%d checksum=%.6f" % (pid, res2["epochs_run"],
                                               checksum), flush=True)

# multihost RESIDENT plane: each host uploads its devices' contiguous
# row blocks; epochs run as psum'd scan chunks (one dispatch per eval
# interval). Checksums must agree across hosts (replicated updates).
cfg3 = TrainConfig(batch_size=32, max_epoch_num=2, min_epoch_num=2,
                   step_interval=10, device_resident="auto")
res3 = train_loop(model_cfg, cfg3, train_ds, valid_ds, None,
                  verbose=True)
leaves3 = jax.tree.leaves(res3["params"])
checksum3 = float(sum(abs(x).sum() for x in leaves3))
print("RUN3 pid=%d epochs=%d checksum=%.6f" % (pid, res3["epochs_run"],
                                               checksum3), flush=True)

# chunked variable-length all-gather (lengths differ across hosts and
# exceed the chunk, so the int31-word size exchange + multi-round
# padded gather both execute)
from deepsignal_plant_tpu.parallel.multihost import allgather_bytes
payload = bytes([65 + pid]) * (1000 + 300 * pid)
g = allgather_bytes(payload, chunk_bytes=256)
assert len(g) == 2 and g[pid] == payload, [len(x) for x in g]
assert g[1 - pid] == bytes([65 + (1 - pid)]) * (1000 + 300 * (1 - pid))
assert allgather_bytes(payload, chunk_bytes=256, keep=False) == []
print("GATHER pid=%d ok" % pid, flush=True)

# cross-host call_freq reduction: each host aggregates its own call
# shard; merge_across_hosts reduces over the collectives onto process 0
# (the writer), with exact global counts on every host
from deepsignal_plant_tpu.pipeline.call_freq import (FreqAccumulator,
                                                     merge_across_hosts,
                                                     write_freq)
acc = FreqAccumulator(prob_cf=0.1)
acc.add_file(os.path.join(data, "calls_%d.tsv" % pid))
merged = merge_across_hosts(acc)
if pid == 0:
    write_freq(merged, os.path.join(out, "freq_p0.tsv"), True, False,
               False)
print("FREQ pid=%d sites=%d count=%d used=%d" % (
    pid, merged.n_sites, merged.count, merged.used), flush=True)
'''


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_loop_with_resume(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(17)
    write_feature_file(str(data / "train.tsv"),
                       synth_feature_rows(rng, 10, 20))
    write_feature_file(str(data / "valid.tsv"),
                       synth_feature_rows(rng, 4, 20))
    # per-host call_mods shards with overlapping sites (coverage spans
    # hosts, so the merge must sum — not just concatenate)
    for i in range(2):
        with open(data / f"calls_{i}.tsv", "w") as f:
            for j in range(300):
                pos = (j + i * 150) % 450   # rows 150..299 overlap
                p1 = round((j * 37 % 100) / 100, 6)
                p0 = round(1 - p1, 6)
                f.write(f"chr{j % 3}\t{pos}\t+\t{pos}\tr{j}\tt\t{p0}\t"
                        f"{p1}\t{int(p1 > 0.5)}\tACGTACCGTACGT\n")
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out = tmp_path / "model"
    out.mkdir()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # strip the axon sitecustomize (breaks jax.distributed, see module
    # docstring) and the forced 8-device flag (each proc: 1 CPU device)
    env["PYTHONPATH"] = repo
    env["XLA_FLAGS"] = ""
    port = str(_free_port())

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), port, str(data), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=540)
            outs.append(stdout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for i, (p, stdout) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {i} failed:\n{stdout[-4000:]}"
        assert f"RUN1 pid={i} epochs=1" in stdout, stdout[-2000:]
        # both hosts resumed from the pid-0 state at epoch 1
        assert "resuming training from epoch 1" in stdout, stdout[-2000:]
        assert f"RUN2 pid={i} epochs=2" in stdout, stdout[-2000:]
        # the multihost resident plane actually engaged
        assert "sharded device-resident data plane" in stdout, \
            stdout[-2000:]
        assert f"RUN3 pid={i} epochs=2" in stdout, stdout[-2000:]

    # identical collectives -> bit-identical replicated params on all
    # hosts, for the host-fed (RUN2) and resident (RUN3) planes alike
    for run in ("RUN2", "RUN3"):
        sums = [ln.split("checksum=")[1] for o in outs
                for ln in o.splitlines()
                if ln.startswith(run) and "checksum=" in ln]
        assert len(sums) == 2 and sums[0] == sums[1], (run, sums)

    # cross-host call_freq reduction: process 0 (the writer) holds the
    # merged table, equal to a single-process aggregation of both
    # shards; process 1 holds no table but the exact global counts
    from deepsignal_plant_tpu.pipeline.call_freq import (FreqAccumulator,
                                                         write_freq)
    ref_acc = FreqAccumulator(prob_cf=0.1)
    ref_acc.add_file(str(data / "calls_0.tsv"))
    ref_acc.add_file(str(data / "calls_1.tsv"))
    ref_out = tmp_path / "freq_ref.tsv"
    write_freq(ref_acc, str(ref_out), True, False, False)
    assert (out / "freq_p0.tsv").read_text() == ref_out.read_text()
    for i, o in enumerate(outs):
        assert f"GATHER pid={i} ok" in o, o[-1500:]
        sites = ref_acc.n_sites if i == 0 else 0
        assert f"FREQ pid={i} sites={sites} " \
               f"count={ref_acc.count} used={ref_acc.used}" in o, o[-1500:]
