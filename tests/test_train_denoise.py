"""Training and denoise loop tests on synthetic separable data (small
model, CPU mesh)."""
import os
import types

import numpy as np
import pytest

from make_synthetic import synth_feature_rows, write_feature_file

from deepsignal_plant_tpu.config import ModelConfig, TrainConfig
from deepsignal_plant_tpu.io.dataset import FeatureDataset
from deepsignal_plant_tpu.pipeline.train import train_loop
from deepsignal_plant_tpu.utils import metrics as M


@pytest.fixture(scope="module")
def small_data(tmp_path_factory):
    rng = np.random.default_rng(21)
    d = tmp_path_factory.mktemp("traindata")
    train_path = write_feature_file(
        str(d / "train.tsv"), synth_feature_rows(rng, 20, 30))
    valid_path = write_feature_file(
        str(d / "valid.tsv"), synth_feature_rows(rng, 6, 20))
    return train_path, valid_path


def test_metrics_match_sklearn():
    from sklearn import metrics as SK
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 200)
    p = rng.integers(0, 2, 200)
    assert M.accuracy(y, p) == pytest.approx(SK.accuracy_score(y, p))
    assert M.precision(y, p) == pytest.approx(SK.precision_score(y, p))
    assert M.recall(y, p) == pytest.approx(SK.recall_score(y, p))


def test_dataset_loading(small_data):
    train_path, _ = small_data
    ds = FeatureDataset.from_file(train_path)
    assert len(ds) == 600
    assert ds.kmer.shape == (600, 13)
    assert ds.signals.shape == (600, 13, 16)
    assert set(np.unique(ds.labels)) == {0, 1}
    # padded batch iteration covers every row exactly once
    seen = 0
    for batch, labels, n_valid in ds.iter_batches(64, shuffle=True,
                                                  pad_to_batch=True):
        assert batch.kmer.shape[0] == 64
        seen += n_valid
    assert seen == 600


@pytest.mark.parametrize("optim,epochs,lr,floor", [
    ("Adam", 3, 0.005, 0.9),
    # Ranger (lookahead alpha .5 + RAdam warmup) needs more steps by design
    ("Ranger", 8, 0.01, 0.85),
])
def test_train_learns_synthetic(small_data, tmp_path, optim, epochs, lr,
                                floor):
    train_path, valid_path = small_data
    model_cfg = ModelConfig(hidden_size=32, dropout_rate=0.2)
    train_cfg = TrainConfig(batch_size=64, max_epoch_num=epochs,
                            min_epoch_num=epochs, step_interval=5,
                            optim_type=optim, lr=lr, lr_decay_step=4)
    res = train_loop(model_cfg, train_cfg,
                     FeatureDataset.from_file(train_path),
                     FeatureDataset.from_file(valid_path),
                     str(tmp_path) + "/", verbose=False)
    assert res["best_accuracy"] > floor, \
        f"{optim} failed to learn separable data: {res['best_accuracy']}"
    assert res["best_ckpt"] is not None and os.path.exists(res["best_ckpt"])


def test_train_ckpt_reload_and_infer(small_data, tmp_path):
    train_path, valid_path = small_data
    model_cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    train_cfg = TrainConfig(batch_size=64, max_epoch_num=1, min_epoch_num=1,
                            step_interval=5)
    res = train_loop(model_cfg, train_cfg,
                     FeatureDataset.from_file(train_path),
                     FeatureDataset.from_file(valid_path),
                     str(tmp_path) + "/", verbose=False)
    from deepsignal_plant_tpu.models.convert import load_checkpoint
    params, cfg2 = load_checkpoint(res["best_ckpt"])
    assert cfg2.hidden_size == 32


def test_denoise_loop(small_data, tmp_path):
    """Denoise on a file with 20% flipped positive labels: finishes, writes
    a denoised file, keeps most of the clean positives."""
    rng = np.random.default_rng(33)
    rows = synth_feature_rows(rng, 16, 25)
    # corrupt: flip some true-negative-looking rows to positive label
    noisy = []
    flipped = 0
    for i, r in enumerate(rows):
        w = r.split("\t")
        if w[11] == "0" and i % 5 == 0:
            w[11] = "1"
            flipped += 1
        noisy.append("\t".join(w))
    train_file = write_feature_file(str(tmp_path / "noisy.tsv"), noisy)

    args = types.SimpleNamespace(
        train_file=train_file, is_filter_fn="no",
        model_type="signal_bilstm", seq_len=13, signal_len=16, layernum1=3,
        layernum2=1, class_num=2, dropout_rate=0.2, n_vocab=16, n_embed=4,
        is_base="yes", is_signallen="yes", hid_rnn=32, pos_weight=1.0,
        batch_size=64, lr=0.005, epoch_num=2, step_interval=4,
        iterations=1, rounds=1, score_cf=0.5, kept_ratio=0.99,
        fst_iter_prob=False, seed=7)
    from deepsignal_plant_tpu.pipeline.denoise import denoise
    out = denoise(args)
    assert os.path.exists(out)
    out_lines = open(out).read().splitlines()
    assert len(out_lines) > 0
    labels = [int(l.split("\t")[11]) for l in out_lines]
    # output is a pos+balanced-neg mix
    assert 0 < sum(labels) < len(labels)
