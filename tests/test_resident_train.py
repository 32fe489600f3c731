"""Device-resident training data plane: bitwise parity with the host
per-step path, tail masking, fallback conditions."""
import os

import jax
import numpy as np
import pytest

from make_synthetic import synth_feature_rows

import deepsignal_plant_tpu.pipeline.train as T
from deepsignal_plant_tpu.config import ModelConfig, TrainConfig
from deepsignal_plant_tpu.io.dataset import FeatureDataset
from deepsignal_plant_tpu.utils.formats import (parse_feature_lines,
                                                save_feature_npz)


@pytest.fixture()
def single_device_mesh(monkeypatch):
    """train_loop builds its mesh internally; pin it to one device so the
    resident branch triggers on the virtual 8-device CPU test rig."""
    real = T.make_mesh
    monkeypatch.setattr(T, "make_mesh",
                        lambda *a, **k: real(jax.devices()[:1]))


def _dataset(tmp_path, rng, n_rows, name="t.npz"):
    blocks = (n_rows + 47) // 48
    rows = synth_feature_rows(rng, blocks, 48)[:n_rows]
    fb = parse_feature_lines([r + "\n" for r in rows])
    p = str(tmp_path / name)
    save_feature_npz(p, fb)
    return FeatureDataset.from_file(p)


def _run(ds, vds, mode, **kw):
    mcfg = ModelConfig(hidden_size=32, dropout_rate=0.5)
    cfg = TrainConfig(device_resident=mode, **kw)
    return T.train_loop(mcfg, cfg, ds, vds, None, verbose=False)


def test_resident_bitwise_parity(tmp_path, single_device_mesh):
    """Same seed, same data: the scan-chunked resident path must produce
    bit-identical params to the per-step host path (same gather rows,
    same dropout fold_in stream, same update math)."""
    rng = np.random.default_rng(0)
    ds = _dataset(tmp_path, rng, 384)
    vds = _dataset(tmp_path, rng, 96, "v.npz")
    kw = dict(batch_size=64, max_epoch_num=2, min_epoch_num=1,
              step_interval=3)
    r_host = _run(ds, vds, "never", **kw)
    r_res = _run(ds, vds, "auto", **kw)
    assert r_host["best_accuracy"] == r_res["best_accuracy"]
    for a, b in zip(jax.tree.leaves(r_host["params"]),
                    jax.tree.leaves(r_res["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resident_uneven_tail(tmp_path, single_device_mesh):
    """N % batch_size != 0 and steps % step_interval != 0: the masked
    tail step and the short final chunk must match the host path."""
    rng = np.random.default_rng(1)
    ds = _dataset(tmp_path, rng, 200)     # 4 steps of 64, tail nv=8
    vds = _dataset(tmp_path, rng, 50, "v.npz")
    kw = dict(batch_size=64, max_epoch_num=1, min_epoch_num=1,
              step_interval=3)            # chunks of 3 + 1
    r_host = _run(ds, vds, "never", **kw)
    r_res = _run(ds, vds, "auto", **kw)
    for a, b in zip(jax.tree.leaves(r_host["params"]),
                    jax.tree.leaves(r_res["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resident_size_gate(tmp_path, single_device_mesh, monkeypatch):
    """Datasets over the HBM budget must fall back to host feeding (the
    run still completes)."""
    monkeypatch.setattr(T, "RESIDENT_MAX_BYTES", 1)
    rng = np.random.default_rng(2)
    ds = _dataset(tmp_path, rng, 96)
    vds = _dataset(tmp_path, rng, 48, "v.npz")
    r = _run(ds, vds, "auto", batch_size=48, max_epoch_num=1,
             min_epoch_num=1, step_interval=2)
    assert r["epochs_run"] == 1


def test_denoise_resident_parity(tmp_path, monkeypatch):
    """CrossRankTrainer resident mode (one dispatch per epoch + one
    scoring dispatch) must reproduce the host per-step path's scores:
    same epoch permutation stream, same dropout fold_in."""
    import deepsignal_plant_tpu.pipeline.denoise as D
    real = T.make_mesh
    monkeypatch.setattr(D, "make_mesh",
                        lambda *a, **k: real(jax.devices()[:1]))
    # the production floor (100k rows) exists to amortize per-iteration
    # compiles; parity is what's under test here
    monkeypatch.setattr(D.CrossRankTrainer, "RESIDENT_MIN_ROWS", 0)
    rng = np.random.default_rng(5)
    ds = _dataset(tmp_path, rng, 200)
    sds = _dataset(tmp_path, rng, 120, "s.npz")
    mcfg = ModelConfig(hidden_size=32, dropout_rate=0.5,
                       module="signal_bilstm")

    def run(mode):
        tr = D.CrossRankTrainer(
            mcfg, TrainConfig(batch_size=64, device_resident=mode))
        # the gate must route as the mode says (guards the monkeypatches)
        assert tr._use_resident(ds, sds) == (mode == "auto")
        return tr.train_then_score(ds, sds, seed=11, epoch_num=2,
                                   step_interval=2)

    p_host = run("never")
    p_res = run("auto")
    assert p_res.shape == (len(sds),)
    np.testing.assert_allclose(p_res, p_host, atol=1e-6)


def test_denoise_sharded_resident_multi_device(tmp_path, monkeypatch):
    """CrossRankTrainer on the multi-device mesh: the row-sharded
    resident plane must reproduce the host shard_map path's scores
    (dropout 0, one full-coverage batch per step)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    import deepsignal_plant_tpu.pipeline.denoise as D
    monkeypatch.setattr(D.CrossRankTrainer, "RESIDENT_MIN_ROWS", 0)
    rng = np.random.default_rng(9)
    ds = _dataset(tmp_path, rng, 96)
    sds = _dataset(tmp_path, rng, 99, "s.npz")   # indivisible by ndev
    mcfg = ModelConfig(hidden_size=32, dropout_rate=0.0,
                       module="signal_bilstm")

    def run(mode):
        tr = D.CrossRankTrainer(
            mcfg, TrainConfig(batch_size=96, device_resident=mode))
        assert (tr.sharding is not None) and \
            tr._use_resident(ds, sds) == (mode == "auto")
        return tr.train_then_score(ds, sds, seed=13, epoch_num=2,
                                   step_interval=1)

    p_host = run("never")
    p_res = run("auto")
    assert p_res.shape == (len(sds),)
    np.testing.assert_allclose(p_res, p_host, atol=2e-5, rtol=2e-5)


def test_resident_sharded_multi_device(tmp_path, capsys):
    """On a multi-device mesh auto takes the SHARDED-resident plane:
    dataset sharded over the row axis, shard-local shuffles, psum'd
    grads inside the scan. N indivisible by ndev exercises row_valid."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    rng = np.random.default_rng(3)
    ds = _dataset(tmp_path, rng, 99)      # pads to 104 on 8 devices
    vds = _dataset(tmp_path, rng, 49, "v.npz")
    mcfg = ModelConfig(hidden_size=32, dropout_rate=0.5)
    r = T.train_loop(mcfg, TrainConfig(device_resident="auto",
                                       batch_size=48, max_epoch_num=2,
                                       min_epoch_num=2, step_interval=2),
                     ds, vds, None, verbose=True)
    out = capsys.readouterr().out
    assert "sharded device-resident data plane" in out
    assert r["epochs_run"] == 2
    assert 0.0 <= r["best_accuracy"] <= 1.0


def test_resident_sharded_matches_host_no_dropout(tmp_path):
    """dropout=0, one batch per step covering every row: the sharded-
    resident update must match the host-fed shard_map step numerically
    (identical row set per step; sums are order-invariant)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    rng = np.random.default_rng(4)
    ds = _dataset(tmp_path, rng, 96)      # == batch_size: 1 step/epoch
    vds = _dataset(tmp_path, rng, 48, "v.npz")
    mcfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    kw = dict(batch_size=96, max_epoch_num=2, min_epoch_num=2,
              step_interval=1)
    r_host = T.train_loop(mcfg, TrainConfig(device_resident="never",
                                            **kw), ds, vds, None,
                          verbose=False)
    r_sh = T.train_loop(mcfg, TrainConfig(device_resident="auto", **kw),
                        ds, vds, None, verbose=False)
    for a, b in zip(jax.tree.leaves(r_host["params"]),
                    jax.tree.leaves(r_sh["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_spill_plane_engages_and_trains(tmp_path, single_device_mesh,
                                        monkeypatch, capsys):
    """VERDICT r4 item 4: a dataset bigger than the HBM budget takes the
    chunked-resident (spill) plane — double-buffered slab uploads, scan
    chunks per slab — instead of the per-step host-fed fallback."""
    rng = np.random.default_rng(71)
    ds = _dataset(tmp_path, rng, 600, "big.npz")
    vds = _dataset(tmp_path, rng, 96, "v.npz")
    # budget: valid fits (x4), train+valid does NOT -> spill; slabs
    # sized so several slabs exist
    budget = T.dataset_nbytes(vds) * 4 + 100
    assert T.dataset_nbytes(ds) + T.dataset_nbytes(vds) > budget
    monkeypatch.setattr(T, "RESIDENT_MAX_BYTES", budget)

    mcfg = ModelConfig(hidden_size=32, dropout_rate=0.5)
    # force the int8 slab wire (auto only selects it on remote-attached
    # links, mirroring the engine policy — CPU test rigs get f16)
    monkeypatch.setenv("DSP_TRAIN_SPILL_WIRE", "int8")
    res = T.train_loop(
        mcfg, TrainConfig(device_resident="auto", batch_size=48,
                          max_epoch_num=2, min_epoch_num=2,
                          step_interval=3), ds, vds, None, verbose=True)
    out = capsys.readouterr().out
    assert "chunked-resident (spill) data plane" in out
    assert "slab(s)" in out
    # trained: losses recorded, params finite
    assert len(res["epoch_seconds"]) == 2
    for leaf in jax.tree.leaves(res["params"]):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_spill_loss_decreases_like_host(tmp_path, single_device_mesh,
                                        monkeypatch):
    """Spill training learns the synthetic separable task to the same
    ballpark accuracy as the host-fed path (shuffle semantics differ —
    two-level block shuffle — so parity is statistical, not bitwise)."""
    rng = np.random.default_rng(72)
    ds = _dataset(tmp_path, rng, 480, "bt.npz")
    vds = _dataset(tmp_path, rng, 96, "bv.npz")
    kw = dict(batch_size=48, max_epoch_num=2, min_epoch_num=2,
              step_interval=5, seed=3)

    r_host = _run(ds, vds, "never", **kw)

    budget = T.dataset_nbytes(vds) * 4 + 100
    monkeypatch.setattr(T, "RESIDENT_MAX_BYTES", budget)
    r_spill = _run(ds, vds, "auto", **kw)

    acc_host = r_host["best_accuracy"]
    acc_spill = r_spill["best_accuracy"]
    assert acc_spill > 0.8, acc_spill              # separable fixture
    assert abs(acc_spill - acc_host) < 0.15, (acc_spill, acc_host)
