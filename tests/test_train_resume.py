"""Training checkpoint/resume: state roundtrip and continued training."""
import os

import numpy as np

from make_synthetic import synth_feature_rows, write_feature_file

from deepsignal_plant_tpu.config import ModelConfig, TrainConfig
from deepsignal_plant_tpu.io.dataset import FeatureDataset
from deepsignal_plant_tpu.pipeline.train import (load_train_state,
                                                 train_loop,
                                                 train_state_path)


def test_resume_continues_from_saved_epoch(tmp_path, rng):
    train_f = write_feature_file(str(tmp_path / "t.tsv"),
                                 synth_feature_rows(rng, 10, 20))
    valid_f = write_feature_file(str(tmp_path / "v.tsv"),
                                 synth_feature_rows(rng, 4, 10))
    train_ds = FeatureDataset.from_file(train_f)
    valid_ds = FeatureDataset.from_file(valid_f)
    model_cfg = ModelConfig(hidden_size=32, dropout_rate=0.1)
    model_dir = str(tmp_path / "m") + "/"
    os.makedirs(model_dir, exist_ok=True)

    # phase 1: 2 epochs
    cfg1 = TrainConfig(batch_size=64, max_epoch_num=2, min_epoch_num=2,
                       step_interval=4)
    train_loop(model_cfg, cfg1, train_ds, valid_ds, model_dir,
               verbose=False)
    sp = train_state_path(model_dir, model_cfg.module)
    assert os.path.exists(sp)
    st = load_train_state(sp)
    assert st["epoch"] == 2 and st["global_step"] > 0

    # phase 2: resume to 4 epochs; must start at epoch 2
    cfg2 = TrainConfig(batch_size=64, max_epoch_num=4, min_epoch_num=4,
                       step_interval=4)
    res = train_loop(model_cfg, cfg2, train_ds, valid_ds, model_dir,
                     verbose=False, resume=True)
    st2 = load_train_state(sp)
    assert st2["epoch"] == 4
    assert st2["global_step"] == 2 * st["global_step"]
    assert res["best_accuracy"] >= 0.5


def test_resume_restores_exact_state(tmp_path, rng):
    """Optimizer state roundtrips exactly through the pickle container."""
    train_f = write_feature_file(str(tmp_path / "t.tsv"),
                                 synth_feature_rows(rng, 6, 10))
    train_ds = FeatureDataset.from_file(train_f)
    model_cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    model_dir = str(tmp_path / "m") + "/"
    os.makedirs(model_dir, exist_ok=True)
    cfg = TrainConfig(batch_size=32, max_epoch_num=1, min_epoch_num=1,
                      step_interval=2)
    res = train_loop(model_cfg, cfg, train_ds, train_ds, model_dir,
                     verbose=False)
    st = load_train_state(train_state_path(model_dir, model_cfg.module))
    import jax
    for a, b in zip(jax.tree.leaves(st["params"]),
                    jax.tree.leaves(res["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
