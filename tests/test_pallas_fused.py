"""Parity tests for the fully-fused BiLSTM layer kernel (interpret mode
on CPU) against the lax.scan reference path in ops/lstm.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsignal_plant_tpu.ops.lstm import bilstm_layer, bilstm_stack, \
    init_bilstm_layer
from deepsignal_plant_tpu.ops.pallas_fused import (bilstm_layer_fused,
                                                   bilstm_stack_fused)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def _layer(key, F, H):
    return init_bilstm_layer(jax.random.PRNGKey(key), F, H)


@pytest.mark.parametrize("B,T,F,H", [
    (4, 13, 16, 8),        # tiny, unaligned B
    (16, 13, 7, 32),       # seq-branch-like odd F
    (8, 5, 24, 16),        # short T
])
def test_fused_layer_matches_scan(rng, B, T, F, H):
    p = _layer(B + F, F, H)
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    want = bilstm_layer(jnp.asarray(x), p, H, impl="scan")
    ys_f, ys_b = bilstm_layer_fused(
        jnp.moveaxis(jnp.asarray(x), 0, 1), p["w_ih"], p["b"],
        p["w_hh"], H, block_b=8, interpret=True)
    got = jnp.concatenate([jnp.moveaxis(ys_f, 0, 1),
                           jnp.moveaxis(ys_b, 0, 1)], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_layer_final_states(rng):
    B, T, F, H = 6, 13, 16, 8
    p = _layer(3, F, H)
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    want = bilstm_layer(jnp.asarray(x), p, H, impl="scan",
                        return_sequence=False)        # (B, 2H) readout
    ys_f, ys_b = bilstm_layer_fused(
        jnp.moveaxis(jnp.asarray(x), 0, 1), p["w_ih"], p["b"],
        p["w_hh"], H, seq_out=False, block_b=8, interpret=True)
    got = jnp.concatenate([ys_f[0], ys_b[0]], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_layer_split_inputs(rng):
    """Row-split projection: passing (xa, xb) separately == concat."""
    B, T, Fa, Fb, H = 4, 9, 8, 24, 16
    p = _layer(7, Fa + Fb, H)
    xa = rng.normal(size=(B, T, Fa)).astype(np.float32)
    xb = rng.normal(size=(B, T, Fb)).astype(np.float32)
    x = np.concatenate([xa, xb], axis=-1)
    want = bilstm_layer(jnp.asarray(x), p, H, impl="scan")
    ys_f, ys_b = bilstm_layer_fused(
        (jnp.moveaxis(jnp.asarray(xa), 0, 1),
         jnp.moveaxis(jnp.asarray(xb), 0, 1)), p["w_ih"], p["b"],
        p["w_hh"], H, block_b=8, interpret=True)
    got = jnp.concatenate([jnp.moveaxis(ys_f, 0, 1),
                           jnp.moveaxis(ys_b, 0, 1)], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("last_seq", [True, False])
def test_fused_stack_matches_scan(rng, last_seq):
    """3-layer stack with inter-layer (fwd, bwd) threading == scan
    stack over materialized concats."""
    B, T, F, H = 8, 13, 16, 16
    layers = [_layer(11, F, H), _layer(12, 2 * H, H), _layer(13, 2 * H, H)]
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    want = bilstm_stack(jnp.asarray(x), layers, H,
                        last_layer_sequence=last_seq, impl="scan")
    got = bilstm_stack_fused(jnp.asarray(x), layers, H,
                             last_layer_sequence=last_seq,
                             block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_stack_two_branch_entry(rng):
    """The comb stack entry: (out_seq, out_signal) threaded without the
    concat; equals the scan path on the materialized concat."""
    B, T, H = 8, 13, 16
    layers = [_layer(21, 2 * H, H), _layer(22, 2 * H, H)]
    xa = rng.normal(size=(B, T, H)).astype(np.float32)
    xb = rng.normal(size=(B, T, H)).astype(np.float32)
    x = np.concatenate([xa, xb], axis=-1)
    want = bilstm_stack(jnp.asarray(x), layers, H,
                        last_layer_sequence=False, impl="scan")
    got = bilstm_stack_fused((jnp.asarray(xa), jnp.asarray(xb)),
                             layers, H, last_layer_sequence=False,
                             block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_layer_bf16_close(rng):
    """bf16 storage: gate math/cell state stay f32 inside the kernel, so
    outputs track the f32 scan path within bf16 resolution."""
    B, T, F, H = 8, 13, 16, 16
    p = _layer(31, F, H)
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    want = bilstm_layer(jnp.asarray(x), p, H, impl="scan")
    ys_f, ys_b = bilstm_layer_fused(
        jnp.moveaxis(jnp.asarray(x), 0, 1).astype(jnp.bfloat16),
        p["w_ih"], p["b"], p["w_hh"], H, block_b=8, interpret=True)
    got = jnp.concatenate([jnp.moveaxis(ys_f, 0, 1),
                           jnp.moveaxis(ys_b, 0, 1)],
                          axis=-1).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(got - want))) < 0.05


@pytest.mark.parametrize("module", ["both_bilstm", "seq_bilstm",
                                    "signal_bilstm"])
def test_forward_fused_matches_scan(rng, module, monkeypatch):
    """Model-level: forward(recurrence=pallas, train=False) routes
    through the fully-fused kernels and matches the scan path."""
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import (Batch, forward,
                                                    init_params)
    from deepsignal_plant_tpu.ops import pallas_fused, pallas_lstm
    monkeypatch.setattr(pallas_lstm, "_INTERPRET", True)
    monkeypatch.setattr(pallas_fused, "BLOCK_B", 8)

    n, L, S = 12, 13, 16
    batch = Batch(rng.integers(0, 4, (n, L)).astype(np.int32),
                  rng.normal(size=(n, L)).astype(np.float32),
                  np.abs(rng.normal(size=(n, L))).astype(np.float32),
                  rng.integers(1, 30, (n, L)).astype(np.float32),
                  rng.normal(size=(n, L, S)).astype(np.float32))
    cfg_s = ModelConfig(hidden_size=32, dropout_rate=0.0, module=module,
                        recurrence="scan")
    cfg_p = ModelConfig(hidden_size=32, dropout_rate=0.0, module=module,
                        recurrence="pallas")
    params = init_params(jax.random.PRNGKey(9), cfg_s)
    logits_s, probs_s = forward(params, batch, cfg_s, train=False)
    logits_p, probs_p = forward(params, batch, cfg_p, train=False)
    np.testing.assert_allclose(np.asarray(probs_p), np.asarray(probs_s),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(logits_s), atol=2e-4)


def test_fused_layer_grad_matches_scan(rng):
    """custom VJP: grads through the fused layer == grads through the
    scan formulation (the bwd recomputes via _layer_scan_tm)."""
    B, T, F, H = 6, 9, 16, 8
    p = _layer(41, F, H)
    x = jnp.asarray(rng.normal(size=(T, B, F)).astype(np.float32))

    def loss_fused(w_ih, b, w_hh, x):
        ys_f, ys_b = bilstm_layer_fused(x, w_ih, b, w_hh, H,
                                        block_b=8, interpret=True)
        return jnp.sum(ys_f ** 2) + jnp.sum(ys_b * 0.5)

    def loss_scan(w_ih, b, w_hh, x):
        from deepsignal_plant_tpu.ops.pallas_fused import _layer_scan_tm
        ys_f, ys_b = _layer_scan_tm((x,), w_ih, b, w_hh, H, True)
        return jnp.sum(ys_f ** 2) + jnp.sum(ys_b * 0.5)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
        p["w_ih"], p["b"], p["w_hh"], x)
    gs = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(
        p["w_ih"], p["b"], p["w_hh"], x)
    for a, b_ in zip(gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)
