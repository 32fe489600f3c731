"""Fused LSTM backward (custom VJP) vs autodiff through the scan path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepsignal_plant_tpu.ops import pallas_lstm
from deepsignal_plant_tpu.ops.lstm import _scan_bidir, init_bilstm_layer


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_lstm, "_INTERPRET", True)


def _setup(B=8, H=16, T=7, seed=0):
    layer = init_bilstm_layer(jax.random.PRNGKey(seed), 2 * H, H)
    rng = np.random.default_rng(seed)
    xproj = jnp.asarray(rng.normal(size=(T, 2, B, 4 * H)).astype(np.float32))
    w_hh = layer["w_hh"].astype(jnp.float32)
    weights = jnp.asarray(rng.normal(size=(T, 2, B, H)).astype(np.float32))
    return xproj, w_hh, weights


def test_primal_matches_scan():
    xproj, w_hh, _ = _setup()
    ys_tr = pallas_lstm.bilstm_recurrence_trainable(xproj, w_hh, 16)
    ys_scan, _, _ = _scan_bidir(xproj, w_hh, 16, None, jnp.float32)
    np.testing.assert_allclose(np.asarray(ys_tr), np.asarray(ys_scan),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_scan_autodiff():
    xproj, w_hh, weights = _setup()

    def loss_pallas(xp, w):
        ys = pallas_lstm.bilstm_recurrence_trainable(xp, w, 16)
        return jnp.sum(ys * weights)

    def loss_scan(xp, w):
        ys, _, _ = _scan_bidir(xp, w, 16, None, jnp.float32)
        return jnp.sum(ys * weights)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(xproj, w_hh)
    gx_s, gw_s = jax.grad(loss_scan, argnums=(0, 1))(xproj, w_hh)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s),
                               atol=2e-3, rtol=2e-3)


def test_gradients_with_ragged_batch_padding():
    xproj, w_hh, weights = _setup(B=13)   # not a multiple of block_b

    def loss_pallas(xp, w):
        ys = pallas_lstm.bilstm_recurrence_trainable(xp, w, 16)
        return jnp.sum(ys * weights)

    def loss_scan(xp, w):
        ys, _, _ = _scan_bidir(xp, w, 16, None, jnp.float32)
        return jnp.sum(ys * weights)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(xproj, w_hh)
    gx_s, gw_s = jax.grad(loss_scan, argnums=(0, 1))(xproj, w_hh)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s),
                               atol=2e-3, rtol=2e-3)


def test_bf16_primal_and_gradients_match_scan():
    """bf16 storage kernels (mixed-precision training): primal and grads
    track the bf16 scan path within bf16 resolution (~8e-3 relative)."""
    xproj, w_hh, weights = _setup(B=13)   # exercise padding too
    xp16, w16 = xproj.astype(jnp.bfloat16), w_hh.astype(jnp.bfloat16)

    ys_tr = pallas_lstm.bilstm_recurrence_trainable(xp16, w16, 16)
    assert ys_tr.dtype == jnp.bfloat16
    ys_scan, _, _ = _scan_bidir(xp16, w16, 16, None, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(ys_tr, np.float32),
                               np.asarray(ys_scan, np.float32),
                               atol=2e-2, rtol=2e-2)

    def loss_pallas(xp, w):
        ys = pallas_lstm.bilstm_recurrence_trainable(xp, w, 16)
        return jnp.sum(ys.astype(jnp.float32) * weights)

    def loss_scan(xp, w):
        ys, _, _ = _scan_bidir(xp, w, 16, None, jnp.bfloat16)
        return jnp.sum(ys.astype(jnp.float32) * weights)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(xp16, w16)
    gx_s, gw_s = jax.grad(loss_scan, argnums=(0, 1))(xp16, w16)
    assert gx_p.dtype == jnp.bfloat16
    # compare both against the f32 reference grads: bf16 pallas must be
    # as close to truth as bf16 scan is (not merely close to scan's own
    # bf16 rounding)
    def loss_f32(xp, w):
        ys, _, _ = _scan_bidir(xp, w, 16, None, jnp.float32)
        return jnp.sum(ys * weights)

    gx_t, gw_t = jax.grad(loss_f32, argnums=(0, 1))(xproj, w_hh)
    err_p = np.abs(np.asarray(gx_p, np.float32) - np.asarray(gx_t)).max()
    err_s = np.abs(np.asarray(gx_s, np.float32) - np.asarray(gx_t)).max()
    assert err_p < max(2 * err_s, 0.05), (err_p, err_s)
    errw_p = np.abs(np.asarray(gw_p, np.float32) - np.asarray(gw_t)).max()
    errw_s = np.abs(np.asarray(gw_s, np.float32) - np.asarray(gw_t)).max()
    assert errw_p < max(2 * errw_s, 0.05), (errw_p, errw_s)


def test_bf16_model_grad_through_pallas():
    """End-to-end bf16 model gradients, pallas vs scan recurrence."""
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import (Batch, forward,
                                                    init_params)

    cfg_s = ModelConfig(hidden_size=32, dropout_rate=0.0,
                        compute_dtype="bfloat16")
    cfg_p = cfg_s.with_(recurrence="pallas")
    params = init_params(jax.random.PRNGKey(1), cfg_s)
    rng = np.random.default_rng(1)
    n = 12
    batch = Batch(
        kmer=rng.integers(0, 4, (n, 13)).astype(np.int32),
        base_means=rng.normal(size=(n, 13)).astype(np.float32),
        base_stds=np.abs(rng.normal(size=(n, 13))).astype(np.float32),
        base_signal_lens=rng.integers(1, 30, (n, 13)).astype(np.float32),
        signals=rng.normal(size=(n, 13, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, n))

    def loss(p, cfg):
        logits, _ = forward(p, batch, cfg, train=True,
                            dropout_rng=jax.random.PRNGKey(7))
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    gs = jax.grad(lambda p: loss(p, cfg_s))(params)
    gp = jax.grad(lambda p: loss(p, cfg_p))(params)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=2e-2, rtol=5e-2)


def test_train_mode_grad_through_pallas(monkeypatch):
    """train=True (dropout active, shared rng) gradients: pallas == scan —
    exercises the actual training wiring, not just inference-mode grads."""
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import (Batch, forward,
                                                    init_params)

    cfg_s = ModelConfig(hidden_size=32, dropout_rate=0.5)
    cfg_p = cfg_s.with_(recurrence="pallas")
    params = init_params(jax.random.PRNGKey(2), cfg_s)
    rng = np.random.default_rng(2)
    n = 8
    batch = Batch(
        kmer=rng.integers(0, 4, (n, 13)).astype(np.int32),
        base_means=rng.normal(size=(n, 13)).astype(np.float32),
        base_stds=np.abs(rng.normal(size=(n, 13))).astype(np.float32),
        base_signal_lens=rng.integers(1, 30, (n, 13)).astype(np.float32),
        signals=rng.normal(size=(n, 13, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, n))
    drng = jax.random.PRNGKey(5)

    def loss(p, cfg):
        logits, _ = forward(p, batch, cfg, train=True, dropout_rng=drng)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    ls = float(loss(params, cfg_s))
    lp = float(loss(params, cfg_p))
    assert ls == pytest.approx(lp, abs=1e-5)
    gs = jax.grad(lambda p: loss(p, cfg_s))(params)
    gp = jax.grad(lambda p: loss(p, cfg_p))(params)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)


def test_model_grad_through_pallas_recurrence(monkeypatch):
    """End-to-end model gradient with recurrence='pallas' (training path)
    == scan gradients."""
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import (Batch, forward,
                                                    init_params)

    cfg_s = ModelConfig(hidden_size=32, dropout_rate=0.0)
    cfg_p = cfg_s.with_(recurrence="pallas")
    params = init_params(jax.random.PRNGKey(1), cfg_s)
    rng = np.random.default_rng(1)
    n = 12
    batch = Batch(
        kmer=rng.integers(0, 4, (n, 13)).astype(np.int32),
        base_means=rng.normal(size=(n, 13)).astype(np.float32),
        base_stds=np.abs(rng.normal(size=(n, 13))).astype(np.float32),
        base_signal_lens=rng.integers(1, 30, (n, 13)).astype(np.float32),
        signals=rng.normal(size=(n, 13, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, n))

    def loss(p, cfg):
        logits, _ = forward(p, batch, cfg, train=False)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    gs = jax.grad(lambda p: loss(p, cfg_s))(params)
    gp = jax.grad(lambda p: loss(p, cfg_p))(params)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)
