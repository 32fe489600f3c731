"""4-process jax.distributed virtual pod test (VERDICT r3 item 5).

test_dist_2proc.py covers the train multihost branch and cross-host
call_freq at process_count==2 only. This launches FOUR real processes
over jax.distributed (CPU + gloo) and drives, in one worker script:

(a) the train multihost branch — host-fed and device-resident planes,
    bit-identical replicated params on all 4 hosts;
(b) pod call_freq input resolution at 4 hosts — shared list (auto
    round-robin shard + collective merge onto pid 0, equal to a
    single-process aggregation of all shards), disjoint per-host lists
    (auto keeps local lists; merge still exact), and the
    partial-overlap refusal;
(c) multi-host inference file-sharding — a shared features-file list is
    round-robin sharded (shard_for_host), each host calls its own shard
    on its host-local mesh and writes a host-suffixed output; the merged
    per-host outputs are asserted byte-equal (after sort) to a
    single-host run over all files.

Reference multi-node story this beats: per-node CLI + manual merge via
scripts/combine_call_mods_freq_files.py (reference :25).

Rig notes inherited from test_dist_2proc.py: gloo collectives required;
the axon sitecustomize must be stripped from PYTHONPATH; XLA_FLAGS=""
so each process owns exactly one CPU device.
"""
import os
import socket
import subprocess
import sys

import numpy as np

from make_synthetic import synth_feature_rows, write_feature_file

NPROC = 4

_WORKER = '''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
data = sys.argv[3]; out = sys.argv[4]
NPROC = %d
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=NPROC, process_id=pid)
assert jax.process_count() == NPROC, jax.process_count()
assert jax.device_count() == NPROC, jax.device_count()

# ---- (a) train multihost branch: host-fed + resident planes ----
from deepsignal_plant_tpu.config import ModelConfig, TrainConfig
from deepsignal_plant_tpu.io.dataset import FeatureDataset
from deepsignal_plant_tpu.pipeline.train import train_loop

model_cfg = ModelConfig(hidden_size=16, dropout_rate=0.1)
train_ds = FeatureDataset.from_file(os.path.join(data, "train.tsv"))
valid_ds = FeatureDataset.from_file(os.path.join(data, "valid.tsv"))

cfg1 = TrainConfig(batch_size=32, max_epoch_num=1, min_epoch_num=1,
                   step_interval=10, device_resident="never")
res1 = train_loop(model_cfg, cfg1, train_ds, valid_ds, None, verbose=False)
leaves = jax.tree.leaves(res1["params"])
print("TRAINFED pid=%%d checksum=%%.6f" %% (
    pid, float(sum(abs(x).sum() for x in leaves))), flush=True)

cfg2 = TrainConfig(batch_size=32, max_epoch_num=1, min_epoch_num=1,
                   step_interval=10, device_resident="auto")
res2 = train_loop(model_cfg, cfg2, train_ds, valid_ds, None, verbose=True)
leaves2 = jax.tree.leaves(res2["params"])
print("TRAINRES pid=%%d checksum=%%.6f" %% (
    pid, float(sum(abs(x).sum() for x in leaves2))), flush=True)

# ---- (b) pod call_freq input resolution at 4 hosts ----
from deepsignal_plant_tpu.pipeline.call_freq import (FreqAccumulator,
                                                     _pod_resolve_inputs,
                                                     merge_across_hosts,
                                                     write_freq)
all_calls = sorted(os.path.join(data, f) for f in os.listdir(data)
                   if f.startswith("calls_"))
# shared list: every host passes the SAME list; auto must shard it
mine, shared = _pod_resolve_inputs(list(all_calls), "auto")
assert shared and len(mine) == len(all_calls) // NPROC, (shared, mine)
acc = FreqAccumulator(prob_cf=0.1)
for f in mine:
    acc.add_file(f)
merged = merge_across_hosts(acc)
if pid == 0:
    write_freq(merged, os.path.join(out, "freq_shared_p0.tsv"), True,
               False, False)
print("FREQSHARED pid=%%d sites=%%d count=%%d used=%%d" %% (
    pid, merged.n_sites, merged.count, merged.used), flush=True)

# disjoint per-host lists: auto must keep the local list intact
local = [all_calls[pid], all_calls[pid + NPROC]]
mine2, shared2 = _pod_resolve_inputs(local, "auto")
assert not shared2 and mine2 == local, (shared2, mine2)
acc2 = FreqAccumulator(prob_cf=0.1)
for f in mine2:
    acc2.add_file(f)
merged2 = merge_across_hosts(acc2)
if pid == 0:
    write_freq(merged2, os.path.join(out, "freq_disjoint_p0.tsv"), True,
               False, False)
print("FREQDISJOINT pid=%%d count=%%d" %% (pid, merged2.count), flush=True)

# partial overlap: refuse loudly instead of dropping/double-counting
overlap = [all_calls[0], all_calls[(pid + 1) %% NPROC]]
try:
    _pod_resolve_inputs(overlap, "auto")
    print("OVERLAP pid=%%d NOT-RAISED" %% pid, flush=True)
except ValueError as e:
    assert "disjoint" in str(e)
    print("OVERLAP pid=%%d refused" %% pid, flush=True)

# same shared file observed with DIFFERENT sizes per host (stale NFS
# attribute cache / still flushing): must be refused, never classified
# as disjoint (that would double-count it process_count times)
import deepsignal_plant_tpu.pipeline.call_freq as cfq
real_getsize = cfq.os.path.getsize
cfq.os.path.getsize = lambda p: real_getsize(p) + pid
try:
    _pod_resolve_inputs([all_calls[0]], "auto")
    print("SIZESKEW pid=%%d NOT-RAISED" %% pid, flush=True)
except ValueError:
    print("SIZESKEW pid=%%d refused" %% pid, flush=True)
finally:
    cfq.os.path.getsize = real_getsize

# ---- (c) multi-host inference file-sharding ----
from deepsignal_plant_tpu.config import CallConfig
from deepsignal_plant_tpu.parallel.dist import (host_output_path,
                                                shard_for_host)
from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine

feats = sorted(os.path.join(data, f) for f in os.listdir(data)
               if f.startswith("feat_"))
mine3 = shard_for_host(feats)
assert len(mine3) == len(feats) // NPROC
eng = CallModsEngine(os.path.join(data, "m.npz"),
                     ModelConfig(hidden_size=16, dropout_rate=0.0),
                     CallConfig(device_batch=64,
                                transfer_dtype="float16"))
host_out = host_output_path(os.path.join(out, "calls.tsv"))
assert ".host%%d" %% pid in host_out
tot = 0
with open(host_out, "w") as sink:
    for f in mine3:
        part = host_out + ".part"
        st = eng.run_features_file(f, part)
        tot += st.sites
        with open(part) as src:
            sink.write(src.read())
        os.remove(part)
print("CALLS pid=%%d sites=%%d" %% (pid, tot), flush=True)
''' % NPROC


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_four_process_pod(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(23)
    write_feature_file(str(data / "train.tsv"),
                       synth_feature_rows(rng, 12, 24))
    write_feature_file(str(data / "valid.tsv"),
                       synth_feature_rows(rng, 4, 16))
    # 8 per-host call_mods shards with overlapping sites (coverage spans
    # hosts, so the collective merge must SUM)
    for i in range(2 * NPROC):
        with open(data / f"calls_{i}.tsv", "w") as f:
            for j in range(160):
                pos = (j + i * 80) % 400   # overlapping windows
                p1 = round((j * 41 % 100) / 100, 6)
                p0 = round(1 - p1, 6)
                f.write(f"chr{j % 3}\t{pos}\t+\t{pos}\tr{i}_{j}\tt\t{p0}"
                        f"\t{p1}\t{int(p1 > 0.5)}\tACGTACCGTACGT\n")
    # 8 features files for the inference shard (2 per host)
    for i in range(2 * NPROC):
        write_feature_file(str(data / f"feat_{i}.tsv"),
                           synth_feature_rows(rng, 3, 10))
    # shared checkpoint
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    mcfg = ModelConfig(hidden_size=16, dropout_rate=0.0)
    save_checkpoint(str(data / "m.npz"),
                    init_params(jax.random.PRNGKey(3), mcfg), mcfg)

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out = tmp_path / "outs"
    out.mkdir()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo
    env["XLA_FLAGS"] = ""
    port = str(_free_port())

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), port, str(data), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(NPROC)]
    outs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=540)
            outs.append(stdout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {i} failed:\n{o[-4000:]}"

    # (a) replicated params bit-identical on all 4 hosts, both planes
    for run in ("TRAINFED", "TRAINRES"):
        sums = [ln.split("checksum=")[1] for o in outs
                for ln in o.splitlines() if ln.startswith(run)]
        assert len(sums) == NPROC and len(set(sums)) == 1, (run, sums)
    # the resident plane actually engaged
    assert all("sharded device-resident data plane" in o for o in outs)

    # (b) merged pod aggregation == single-process aggregation, for the
    # shared-list AND the disjoint layout; overlap refused on all hosts
    from deepsignal_plant_tpu.pipeline.call_freq import (FreqAccumulator,
                                                         write_freq)
    ref_acc = FreqAccumulator(prob_cf=0.1)
    for i in range(2 * NPROC):
        ref_acc.add_file(str(data / f"calls_{i}.tsv"))
    ref_out = tmp_path / "freq_ref.tsv"
    write_freq(ref_acc, str(ref_out), True, False, False)
    for merged in ("freq_shared_p0.tsv", "freq_disjoint_p0.tsv"):
        assert (out / merged).read_text() == ref_out.read_text(), merged
    for i, o in enumerate(outs):
        assert f"OVERLAP pid={i} refused" in o, o[-1500:]
        assert f"SIZESKEW pid={i} refused" in o, o[-1500:]
        assert f"FREQSHARED pid={i} " in o
        assert (f"count={ref_acc.count} used={ref_acc.used}"
                in [ln for ln in o.splitlines()
                    if ln.startswith(f"FREQSHARED pid={i}")][0])

    # (c) merged host-suffixed call outputs == a single-host run over all
    # files (sorted: shard order differs from sequential order)
    from deepsignal_plant_tpu.config import CallConfig
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    eng = CallModsEngine(str(data / "m.npz"), mcfg,
                         CallConfig(device_batch=64,
                                    transfer_dtype="float16"))
    golden_lines = []
    for i in range(2 * NPROC):
        g = str(tmp_path / f"golden_{i}.tsv")
        eng.run_features_file(str(data / f"feat_{i}.tsv"), g)
        golden_lines.extend(open(g).read().splitlines())
    merged_lines = []
    for i in range(NPROC):
        merged_lines.extend(
            open(out / f"calls.host{i}.tsv").read().splitlines())
    assert sorted(merged_lines) == sorted(golden_lines)
    assert len(merged_lines) == 2 * NPROC * 3 * 10
