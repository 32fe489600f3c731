"""Multi-host helpers: single-process unit coverage on the virtual
8-device mesh, plus pod-mode branches simulated by patching
process_count/process_index. Real 2-process jax.distributed coverage
lives in test_dist_2proc.py."""
import numpy as np

import jax

from deepsignal_plant_tpu.parallel.multihost import (global_mesh,
                                                     global_scalar_sum,
                                                     host_row_shard,
                                                     to_global)
from deepsignal_plant_tpu.parallel.mesh import batch_sharding


def test_host_row_shard_partitions():
    shards = [host_row_shard(103, pid, 4) for pid in range(4)]
    merged = np.sort(np.concatenate(shards))
    np.testing.assert_array_equal(merged, np.arange(103))
    assert abs(len(shards[0]) - len(shards[3])) <= 1


def test_to_global_single_process_roundtrip():
    mesh = global_mesh()
    sharding = batch_sharding(mesh)
    local = {"a": np.arange(32, dtype=np.float32).reshape(16, 2),
             "b": np.arange(16, dtype=np.int32)}
    g = to_global(sharding, local, 16)
    assert g["a"].shape == (16, 2)
    # single-process: global == local content
    np.testing.assert_array_equal(np.asarray(g["a"]), local["a"])
    np.testing.assert_array_equal(np.asarray(g["b"]), local["b"])
    # and the array is actually sharded over the mesh
    assert len(g["a"].sharding.device_set) == mesh.devices.size


def test_split_join_i64_roundtrip():
    """Lengths/counts ride collectives as int31 word pairs (jax with x64
    off canonicalizes int64 arrays to int32, wrapping >= 2**31)."""
    from deepsignal_plant_tpu.parallel.multihost import join_i64, split_i64
    vals = [0, 1, 2**31 - 1, 2**31, 2**31 + 7, 5 << 31, 2**40 + 123]
    words = np.array([split_i64(v) for v in vals], np.int32)
    assert (words >= 0).all()          # canonicalization-safe
    assert join_i64(words).tolist() == vals


def test_allgather_bytes_single_process():
    from deepsignal_plant_tpu.parallel.multihost import allgather_bytes
    assert allgather_bytes(b"abc") == [b"abc"]
    assert allgather_bytes(b"abc", keep=False) == []


def test_global_scalar_sum_single_process():
    mesh = global_mesh()
    vals = np.array([1.0, 2.0, 3.0])
    out = global_scalar_sum(vals, mesh)
    np.testing.assert_allclose(out, vals)


def test_train_loop_multihost_branch_runs(tmp_path, rng, monkeypatch):
    """Drive train_loop's multihost branch on the virtual mesh by faking a
    2-process view: host sharding, global-step accounting, _feed lifting,
    counts-based eval, and pid-0 saves all execute."""
    from make_synthetic import synth_feature_rows, write_feature_file

    from deepsignal_plant_tpu.config import ModelConfig, TrainConfig
    from deepsignal_plant_tpu.io.dataset import FeatureDataset
    from deepsignal_plant_tpu.parallel import multihost as mh
    from deepsignal_plant_tpu.parallel import dist as dist_mod
    from deepsignal_plant_tpu.pipeline.train import train_loop

    monkeypatch.setattr(dist_mod, "process_info", lambda: (0, 2))

    def fake_to_global(sharding, tree, global_batch):
        def lift(x):
            x = np.asarray(x)
            reps = max(1, global_batch // max(x.shape[0], 1))
            return jax.device_put(np.concatenate([x] * reps), sharding)
        return jax.tree.map(lift, tree)

    monkeypatch.setattr(mh, "to_global", fake_to_global)

    train_p = write_feature_file(str(tmp_path / "t.tsv"),
                                 synth_feature_rows(rng, 8, 20))
    valid_p = write_feature_file(str(tmp_path / "v.tsv"),
                                 synth_feature_rows(rng, 4, 10))
    res = train_loop(
        ModelConfig(hidden_size=32, dropout_rate=0.1),
        TrainConfig(batch_size=32, max_epoch_num=1, min_epoch_num=1,
                    step_interval=2),
        FeatureDataset.from_file(train_p),
        FeatureDataset.from_file(valid_p),
        str(tmp_path) + "/", verbose=False)
    assert res["epochs_run"] == 1
    assert 0.0 <= res["best_accuracy"] <= 1.0
    import os
    assert any(f.endswith(".ckpt.npz") or f.endswith("train_state.npz")
               for f in os.listdir(str(tmp_path)))


def test_train_loop_multihost_branch_shapes():
    """Exercise the multihost code path's building blocks end-to-end on the
    virtual mesh: global batch sharded, eval counts replicated."""
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import Batch, init_params
    from deepsignal_plant_tpu.pipeline.train import make_eval_counts_step

    mesh = global_mesh()
    sharding = batch_sharding(mesh)
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    step = make_eval_counts_step(cfg, np.array([1.0, 1.0], np.float32),
                                 sharding)
    rng = np.random.default_rng(0)
    n = 16
    local = Batch(
        kmer=rng.integers(0, 4, (n, 13)).astype(np.int32),
        base_means=rng.normal(size=(n, 13)).astype(np.float32),
        base_stds=np.abs(rng.normal(size=(n, 13))).astype(np.float32),
        base_signal_lens=rng.integers(1, 30, (n, 13)).astype(np.float32),
        signals=rng.normal(size=(n, 13, 16)).astype(np.float32))
    labels = rng.integers(0, 2, n).astype(np.int32)
    mask = np.ones(n, np.float32)
    gb = to_global(sharding, local, n)
    gl = to_global(sharding, labels, n)
    gm = to_global(sharding, mask, n)
    counts = np.asarray(step(params, gb, gl, gm))
    assert counts.shape == (6,)
    loss, correct, total, tp, fp, fn = counts
    assert total == n and 0 <= correct <= n
    assert tp + fn == labels.sum()
    assert np.isfinite(loss)


def test_call_freq_pod_mode_contig_sharding(tmp_path, monkeypatch):
    """In pod mode with --contigs, each host takes a disjoint contig
    shard and writes a .hostK-suffixed output; the union equals the
    single-process contig run (merged downstream, the reference's
    multi-node story)."""
    import argparse

    from deepsignal_plant_tpu.pipeline.call_freq import \
        call_mods_frequency_to_file
    rng = np.random.default_rng(23)
    chroms = ["chr1", "chr10", "chr2", "scaffold_9"]
    calls = str(tmp_path / "calls.tsv")
    with open(calls, "w") as f:
        for i in range(600):
            c = chroms[int(rng.integers(len(chroms)))]
            pos = int(rng.integers(0, 300))
            p1 = round(float(rng.random()), 6)
            p0 = round(1.0 - p1, 6)
            f.write(f"{c}\t{pos}\t+\t{pos}\tr{i}\tt\t{p0}\t{p1}\t"
                    f"{int(p1 > p0)}\tACGTACCGTACGT\n")

    def args_for(result):
        return argparse.Namespace(
            input_path=[calls], file_uid=None, contigs=",".join(chroms),
            prob_cf=0.0, result_file=result, sort=True, bed=False,
            gzip=False, nproc=1, device_agg=False)

    single = str(tmp_path / "freq_single.tsv")
    call_mods_frequency_to_file(args_for(single))

    pod = str(tmp_path / "freq_pod.tsv")
    # pod mode is detected from the multi-process ENV (pod_configured),
    # not jax.process_count() — a host-only call_freq must not
    # initialize the jax backend just to ask
    from deepsignal_plant_tpu.parallel import dist as dist_mod
    from deepsignal_plant_tpu.parallel import multihost as mh
    monkeypatch.setattr(dist_mod, "pod_configured", lambda: True)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    # both simulated hosts read the same calls file (shared filesystem);
    # the pod input cross-check is a collective — stub it to report the
    # identical list from both hosts so auto mode shards the contigs
    monkeypatch.setattr(mh, "allgather_bytes",
                        lambda payload, keep=True: [payload, payload])
    for pid in range(2):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        call_mods_frequency_to_file(args_for(pod))
    h0 = open(str(tmp_path / "freq_pod.host0.tsv")).read()
    h1 = open(str(tmp_path / "freq_pod.host1.tsv")).read()
    # disjoint contigs per host, union == the single-process run
    assert {ln.split("\t")[0] for ln in h0.splitlines()} == {"chr1", "chr2"}
    assert {ln.split("\t")[0] for ln in h1.splitlines()} == \
        {"chr10", "scaffold_9"}
    assert sorted((h0 + h1).splitlines()) == \
        sorted(open(single).read().splitlines())


def test_call_freq_pod_mode_whole_genome_shards_files(tmp_path,
                                                      monkeypatch):
    """Whole-genome pod mode (no --contigs) must shard the INPUT FILES
    across hosts: on a shared filesystem every host sees every file, and
    aggregating them all before the cross-host merge would multiply
    every count by process_count (regression for the r3 review)."""
    import argparse
    import os

    from deepsignal_plant_tpu.pipeline import call_freq as cf
    from deepsignal_plant_tpu.parallel import dist as dist_mod

    rng = np.random.default_rng(29)
    files = []
    for k in range(2):
        p = str(tmp_path / f"calls.host{k}.tsv")
        with open(p, "w") as f:
            for i in range(50):
                pos = int(rng.integers(0, 40))
                p1 = round(float(rng.random()), 6)
                f.write(f"chr1\t{pos}\t+\t{pos}\tr{k}_{i}\tt\t"
                        f"{round(1 - p1, 6)}\t{p1}\t{int(p1 > 0.5)}\t"
                        f"ACGTACCGTACGT\n")
        files.append(p)

    monkeypatch.setattr(dist_mod, "pod_configured", lambda: True)
    monkeypatch.setattr(dist_mod, "process_info", lambda: (0, 2))
    seen = []
    orig_add = cf.FreqAccumulator.add_file

    def spy_add(self, path):
        seen.append(os.path.basename(path))
        return orig_add(self, path)

    monkeypatch.setattr(cf.FreqAccumulator, "add_file", spy_add)
    # merge is a collective; stub it to identity for the single process
    monkeypatch.setattr(cf, "merge_across_hosts", lambda acc: acc)
    monkeypatch.setattr(jax, "process_index", lambda: 0)

    out = str(tmp_path / "freq.tsv")
    cf.call_mods_frequency_to_file(argparse.Namespace(
        input_path=[str(tmp_path)], file_uid="calls", contigs=None,
        prob_cf=0.0, result_file=out, sort=True, bed=False, gzip=False,
        nproc=1, device_agg=False))
    # host 0 of 2 must aggregate only ITS shard, not both files
    assert seen == ["calls.host0.tsv"]


def test_pod_input_fingerprint_sees_interior_diffs(tmp_path):
    """ADVICE r4: same-size files with identical head/tail but different
    MIDDLES must fingerprint differently (head/tail-only sampling let
    them pass the shared-list check and get sharded, dropping rows)."""
    from deepsignal_plant_tpu.pipeline.call_freq import _pod_input_fingerprint

    size = 1 << 20  # 1 MiB: well past the whole-file-hash cutoff
    base = bytearray(b"x" * size)
    a = tmp_path / "a.tsv"
    b = tmp_path / "b.tsv"
    a.write_bytes(bytes(base))
    mid = bytearray(base)
    # differs ONLY deep in the interior, at an offset inside the 3rd
    # strided sample chunk (the old head/tail-only fingerprint read
    # nothing between 64 KiB and size-64 KiB)
    chunk = 65536
    mid[chunk + (size - 2 * chunk) * 3 // 7 + 100] = ord("y")
    b.write_bytes(bytes(mid))

    fa = _pod_input_fingerprint(str(a))
    fb = _pod_input_fingerprint(str(b))
    # strip the path component; compare size+hash only
    assert fa.split("\t", 1)[1] != fb.split("\t", 1)[1]

    # identical contents at different paths -> same size+hash
    c = tmp_path / "c.tsv"
    c.write_bytes(bytes(base))
    fc = _pod_input_fingerprint(str(c))
    assert fa.split("\t", 1)[1] == fc.split("\t", 1)[1]

    # small files hash whole: any single-byte diff is seen
    s1 = tmp_path / "s1.tsv"
    s2 = tmp_path / "s2.tsv"
    s1.write_bytes(b"q" * 1000)
    s2.write_bytes(b"q" * 999 + b"r")
    assert (_pod_input_fingerprint(str(s1)).split("\t", 1)[1]
            != _pod_input_fingerprint(str(s2)).split("\t", 1)[1])
