"""Streaming (block-shuffled) training dataset: coverage, shuffling, and
train-loop integration."""
import numpy as np

from make_synthetic import synth_feature_rows, write_feature_file

from deepsignal_plant_tpu.io.dataset import (FeatureDataset,
                                             StreamingFeatureDataset)


def _collect(ds, batch_size, shuffle, rng=None):
    rows = []
    total = 0
    for batch, labels, n_valid in ds.iter_batches(batch_size, shuffle,
                                                  rng=rng,
                                                  pad_to_batch=True):
        assert batch.kmer.shape[0] == batch_size
        rows.append(batch.base_means[:n_valid, 0])
        total += n_valid
    return np.concatenate(rows), total


def test_streaming_tsv_covers_every_row(tmp_path, rng):
    rows = synth_feature_rows(rng, 10, 37)   # 370 rows
    p = write_feature_file(str(tmp_path / "f.tsv"), rows)
    ds = StreamingFeatureDataset(p, block_rows=100)
    assert len(ds) == 370
    mem = FeatureDataset.from_file(p)
    got, total = _collect(ds, 64, shuffle=True,
                          rng=np.random.default_rng(0))
    assert total == 370
    # same multiset of rows as the in-memory dataset
    np.testing.assert_allclose(np.sort(got),
                               np.sort(mem.base_means[:, 0]), atol=0)
    # shuffling actually reorders
    got2, _ = _collect(ds, 64, shuffle=False)
    assert not np.array_equal(got, got2)


def test_streaming_npz_dir(tmp_path, rng):
    from deepsignal_plant_tpu.utils.formats import (parse_feature_lines,
                                                    save_feature_npz)
    rows = synth_feature_rows(rng, 4, 25)
    fb = parse_feature_lines([r + "\n" for r in rows])
    d = tmp_path / "npz"
    d.mkdir()
    save_feature_npz(str(d / "0.npz"), fb)
    save_feature_npz(str(d / "1.npz"), fb)
    ds = StreamingFeatureDataset(str(d))
    assert len(ds) == 200
    _got, total = _collect(ds, 32, shuffle=True,
                           rng=np.random.default_rng(1))
    assert total == 200


def test_train_loop_with_streaming_dataset(tmp_path, rng):
    from deepsignal_plant_tpu.config import ModelConfig, TrainConfig
    from deepsignal_plant_tpu.pipeline.train import train_loop

    train_p = write_feature_file(str(tmp_path / "t.tsv"),
                                 synth_feature_rows(rng, 12, 25))
    valid_p = write_feature_file(str(tmp_path / "v.tsv"),
                                 synth_feature_rows(rng, 4, 10))
    res = train_loop(
        ModelConfig(hidden_size=32, dropout_rate=0.1),
        TrainConfig(batch_size=64, max_epoch_num=2, min_epoch_num=2,
                    step_interval=3),
        StreamingFeatureDataset(train_p, block_rows=100),
        FeatureDataset.from_file(valid_p),
        str(tmp_path) + "/", verbose=False)
    assert res["best_accuracy"] > 0.8
