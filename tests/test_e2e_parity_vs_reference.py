"""End-to-end call parity: our engine with converted weights vs the
reference torch model (zero-pinned initial states) on the same features."""
import numpy as np
import pytest

from make_synthetic import synth_feature_rows, write_feature_file

torch = pytest.importorskip("torch")


def test_call_mods_agrees_with_reference_model(reference_importable,
                                               tmp_path, rng):
    import jax

    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.models.convert import (
        convert_torch_state_dict, save_checkpoint)
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    from deepsignal_plant_tpu.utils.formats import parse_feature_lines

    # reference model with pinned zero initial states
    from deepsignal_plant.models import ModelBiLSTM as TorchModel
    tm = TorchModel(dropout_rate=0, hidden_size=64)

    def zero_hidden(self, batch_size, num_layers, hidden_size):
        return (torch.zeros(num_layers * 2, batch_size, hidden_size),
                torch.zeros(num_layers * 2, batch_size, hidden_size))

    tm.init_hidden = zero_hidden.__get__(tm)
    tm.eval()

    cfg = ModelConfig(hidden_size=64, dropout_rate=0.0)
    params = convert_torch_state_dict(tm.state_dict(), cfg)
    ckpt = str(tmp_path / "conv.ckpt.npz")
    save_checkpoint(ckpt, params, cfg)

    rows = synth_feature_rows(rng, 8, 32)
    feat = write_feature_file(str(tmp_path / "f.tsv"), rows)
    out = str(tmp_path / "calls.tsv")
    # float32 wire for the exact-parity comparison
    engine = CallModsEngine(ckpt, cfg,
                            CallConfig(device_batch=64,
                                       transfer_dtype="float32"))
    engine.run_features_file(feat, out)

    # torch probabilities on the same parsed features
    fb = parse_feature_lines([r + "\n" for r in rows])
    with torch.no_grad():
        _, t_probs = tm(torch.tensor(fb.kmer),
                        torch.tensor(fb.base_means),
                        torch.tensor(fb.base_stds),
                        torch.tensor(fb.base_signal_lens),
                        torch.tensor(fb.signals))
    t_probs = t_probs.numpy()

    lines = open(out).read().splitlines()
    assert len(lines) == len(rows)
    agree = 0
    for i, ln in enumerate(lines):
        w = ln.split("\t")
        p0, p1, label = float(w[6]), float(w[7]), int(w[8])
        tp0 = t_probs[i, 0] / (t_probs[i, 0] + t_probs[i, 1])
        assert abs(p0 - tp0) < 5e-5, (i, p0, tp0)
        t_label = int(t_probs[i, 1] > t_probs[i, 0])
        if label == t_label:
            agree += 1
    # calls agree except where probs sit within float noise of 0.5
    assert agree >= len(rows) - 1
