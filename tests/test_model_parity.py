"""Model parity: our JAX ModelBiLSTM vs the reference torch model.

The reference samples randn initial LSTM states on every forward
(reference models.py:169-176), so for a bitwise comparison we pin its
init_hidden to zeros — matching our deterministic design — and compare
logits/probs on identical inputs with converted weights.
"""
import numpy as np
import pytest

from deepsignal_plant_tpu.config import ModelConfig
from deepsignal_plant_tpu.models.bilstm import Batch, forward, init_params
from deepsignal_plant_tpu.models.convert import (
    convert_torch_state_dict, load_checkpoint, params_to_torch_state_dict,
    save_checkpoint)

torch = pytest.importorskip("torch")


def _make_batch(rng, n=8, L=13, S=16):
    return Batch(
        kmer=rng.integers(0, 4, size=(n, L)).astype(np.int32),
        base_means=rng.normal(size=(n, L)).astype(np.float32),
        base_stds=np.abs(rng.normal(size=(n, L))).astype(np.float32),
        base_signal_lens=rng.integers(1, 30, size=(n, L)).astype(np.float32),
        signals=rng.normal(size=(n, L, S)).astype(np.float32),
    )


def _reference_model(reference_importable, module, L=13, S=16):
    from deepsignal_plant.models import ModelBiLSTM as TorchModel
    model = TorchModel(seq_len=L, signal_len=S, dropout_rate=0,
                       module=module)
    # pin the reference's per-forward randn initial states to zeros
    def zero_hidden(self, batch_size, num_layers, hidden_size):
        return (torch.zeros(num_layers * 2, batch_size, hidden_size),
                torch.zeros(num_layers * 2, batch_size, hidden_size))
    model.init_hidden = zero_hidden.__get__(model)
    model.eval()
    return model


@pytest.mark.parametrize("module", ["both_bilstm", "seq_bilstm",
                                    "signal_bilstm"])
def test_forward_parity_with_reference(reference_importable, rng, module):
    tm = _reference_model(reference_importable, module)
    cfg = ModelConfig(module=module, dropout_rate=0.0)
    params = convert_torch_state_dict(tm.state_dict(), cfg)

    batch = _make_batch(rng)
    with torch.no_grad():
        t_logits, t_probs = tm(
            torch.tensor(batch.kmer), torch.tensor(batch.base_means),
            torch.tensor(batch.base_stds),
            torch.tensor(batch.base_signal_lens),
            torch.tensor(batch.signals))
    j_logits, j_probs = forward(params, batch, cfg)

    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(j_probs), t_probs.numpy(),
                               atol=2e-5)


def test_roundtrip_torch_export(reference_importable, rng):
    """our params -> torch state_dict -> back == identity (inference-exact)."""
    cfg = ModelConfig(dropout_rate=0.0)
    import jax
    params = init_params(jax.random.PRNGKey(0), cfg)
    sd = params_to_torch_state_dict(params, cfg)
    sd = {k: torch.tensor(v) for k, v in sd.items()}
    params2 = convert_torch_state_dict(sd, cfg)
    batch = _make_batch(rng, n=4)
    l1, _ = forward(params, batch, cfg)
    l2, _ = forward(params2, batch, cfg)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_npz_checkpoint_roundtrip(tmp_path, rng):
    import jax
    cfg = ModelConfig(dropout_rate=0.0)
    params = init_params(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "model.npz")
    save_checkpoint(path, params, cfg)
    params2, cfg2 = load_checkpoint(path)
    assert cfg2 == cfg
    batch = _make_batch(rng, n=4)
    l1, _ = forward(params, batch, cfg)
    l2, _ = forward(params2, batch, cfg)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=0)


def test_param_count_matches_reference(reference_importable):
    """Same trainable parameter count as the reference model (~8.2M)."""
    tm = _reference_model(reference_importable, "both_bilstm")
    t_count = sum(p.numel() for p in tm.parameters())
    import jax
    cfg = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    j_count = sum(int(np.prod(np.shape(x)))
                  for x in jax.tree.leaves(params))
    # our combined bias replaces torch's two separate bias vectors
    bias_diff = sum(np.prod(np.shape(layer["b"]))
                    for name in ("lstm_seq", "lstm_signal", "lstm_comb")
                    for layer in params[name])
    assert j_count + bias_diff == t_count
