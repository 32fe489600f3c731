"""Checkpoint-load robustness for real published torch ckpts.

The published reference checkpoints may be saved from a DataParallel
wrapper (``module.``-prefixed keys) or be partial/truncated; the loader
must strip prefixes, prefer weights_only loads, and report key mismatches
instead of surfacing a raw KeyError (reference behavior at
call_modifications.py:219-224 silently tolerates partial dicts).
"""
import numpy as np
import pytest

from deepsignal_plant_tpu.config import ModelConfig
from deepsignal_plant_tpu.models.bilstm import Batch, forward, init_params
from deepsignal_plant_tpu.models.convert import (
    convert_torch_state_dict, load_torch_checkpoint,
    params_to_torch_state_dict)

torch = pytest.importorskip("torch")


def _torch_sd(cfg):
    import jax
    params = init_params(jax.random.PRNGKey(7), cfg)
    sd = params_to_torch_state_dict(params, cfg)
    return params, {k: torch.tensor(v) for k, v in sd.items()}


def _batch(rng, n=4, L=13, S=16):
    return Batch(
        kmer=rng.integers(0, 4, size=(n, L)).astype(np.int32),
        base_means=rng.normal(size=(n, L)).astype(np.float32),
        base_stds=np.abs(rng.normal(size=(n, L))).astype(np.float32),
        base_signal_lens=rng.integers(1, 30, size=(n, L)).astype(np.float32),
        signals=rng.normal(size=(n, L, S)).astype(np.float32),
    )


def test_dataparallel_prefix_is_stripped(rng):
    cfg = ModelConfig(dropout_rate=0.0)
    params, sd = _torch_sd(cfg)
    prefixed = {"module." + k: v for k, v in sd.items()}
    params2 = convert_torch_state_dict(prefixed, cfg)
    b = _batch(rng)
    l1, _ = forward(params, b, cfg)
    l2, _ = forward(params2, b, cfg)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_truncated_state_dict_reports_missing_keys():
    cfg = ModelConfig(dropout_rate=0.0)
    _, sd = _torch_sd(cfg)
    del sd["fc1.weight"]
    del sd["lstm_comb.weight_ih_l0"]
    with pytest.raises(ValueError) as ei:
        convert_torch_state_dict(sd, cfg)
    msg = str(ei.value)
    assert "missing keys" in msg
    assert "fc1.weight" in msg and "lstm_comb.weight_ih_l0" in msg


def test_unexpected_extra_keys_are_ignored(rng):
    """Extra buffers (e.g. batchnorm stats from other archs) are tolerated,
    matching the reference's filtered-dict update."""
    cfg = ModelConfig(dropout_rate=0.0)
    params, sd = _torch_sd(cfg)
    sd["some.extra.buffer"] = torch.zeros(3)
    params2 = convert_torch_state_dict(sd, cfg)
    b = _batch(rng)
    l1, _ = forward(params, b, cfg)
    l2, _ = forward(params2, b, cfg)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_wrong_module_config_reports_mismatch():
    cfg = ModelConfig(module="seq_bilstm", dropout_rate=0.0)
    _, sd = _torch_sd(cfg)
    both = ModelConfig(module="both_bilstm", dropout_rate=0.0)
    with pytest.raises(ValueError) as ei:
        convert_torch_state_dict(sd, both)
    assert "lstm_signal" in str(ei.value)


class _LegacyWrapper:
    """Stand-in for a legacy ckpt object that needs the full unpickler."""

    def __init__(self, sd=None):
        self.sd = sd

    def state_dict(self):
        return self.sd


def test_unsafe_ckpt_load_requires_opt_in(tmp_path, monkeypatch):
    """A ckpt that fails the safe (weights_only) load is a hard error by
    default — the automatic fallback would execute pickle payloads in
    non-interactive runs (ADVICE r3, convert.py)."""
    cfg = ModelConfig(dropout_rate=0.0)
    _, sd = _torch_sd(cfg)
    path = str(tmp_path / "legacy.ckpt")
    torch.save(_LegacyWrapper(sd), path)
    monkeypatch.delenv("DSP_ALLOW_UNSAFE_CKPT", raising=False)
    with pytest.raises(RuntimeError) as ei:
        load_torch_checkpoint(path, cfg)
    assert "DSP_ALLOW_UNSAFE_CKPT" in str(ei.value)


def test_unsafe_ckpt_load_with_opt_in(tmp_path, rng, monkeypatch):
    cfg = ModelConfig(dropout_rate=0.0)
    params, sd = _torch_sd(cfg)
    path = str(tmp_path / "legacy.ckpt")
    torch.save(_LegacyWrapper(sd), path)
    monkeypatch.setenv("DSP_ALLOW_UNSAFE_CKPT", "1")
    params2 = load_torch_checkpoint(path, cfg)
    b = _batch(rng)
    l1, _ = forward(params, b, cfg)
    l2, _ = forward(params2, b, cfg)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_load_torch_checkpoint_weights_only(tmp_path, rng):
    """A plain tensor-dict ckpt loads via the weights_only=True path."""
    cfg = ModelConfig(dropout_rate=0.0)
    params, sd = _torch_sd(cfg)
    path = str(tmp_path / "ref.ckpt")
    torch.save({"module." + k: v for k, v in sd.items()}, path)
    params2 = load_torch_checkpoint(path, cfg)
    b = _batch(rng)
    l1, _ = forward(params, b, cfg)
    l2, _ = forward(params2, b, cfg)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
