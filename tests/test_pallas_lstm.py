"""Pallas fused BiLSTM recurrence vs the scan reference (interpret mode on
the CPU mesh; the real-TPU path is exercised by bench/verify drives)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepsignal_plant_tpu.ops.lstm import _scan_bidir, init_bilstm_layer
from deepsignal_plant_tpu.ops.pallas_lstm import bilstm_recurrence_pallas


@pytest.mark.parametrize("B,H,T", [(8, 32, 13), (20, 16, 7)])
def test_pallas_recurrence_matches_scan(B, H, T):
    key = jax.random.PRNGKey(0)
    layer = init_bilstm_layer(key, 2 * H, H)
    rng = np.random.default_rng(0)
    xproj = jnp.asarray(rng.normal(size=(T, 2, B, 4 * H)).astype(np.float32))

    ys_scan, h_T, _ = _scan_bidir(xproj, layer["w_hh"], H, None, jnp.float32)
    ys_pl = bilstm_recurrence_pallas(xproj, layer["w_hh"], H, block_b=8,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(ys_pl), np.asarray(ys_scan),
                               atol=1e-5, rtol=1e-5)
    # final states equal the last pallas step
    np.testing.assert_allclose(np.asarray(ys_pl[-1]), np.asarray(h_T),
                               atol=1e-5, rtol=1e-5)


def test_pallas_recurrence_pads_ragged_batch():
    H, T, B = 16, 5, 13  # B not a multiple of block_b
    layer = init_bilstm_layer(jax.random.PRNGKey(1), H, H)
    rng = np.random.default_rng(1)
    xproj = jnp.asarray(rng.normal(size=(T, 2, B, 4 * H)).astype(np.float32))
    ys_scan, _, _ = _scan_bidir(xproj, layer["w_hh"], H, None, jnp.float32)
    ys_pl = bilstm_recurrence_pallas(xproj, layer["w_hh"], H, block_b=8,
                                     interpret=True)
    assert ys_pl.shape == (T, 2, B, H)
    np.testing.assert_allclose(np.asarray(ys_pl), np.asarray(ys_scan),
                               atol=1e-5, rtol=1e-5)


def test_forward_with_pallas_recurrence_interpret():
    """Full model forward with recurrence="pallas" (interpret) == scan."""
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import Batch, forward, init_params
    from deepsignal_plant_tpu.ops import pallas_lstm

    # route the pallas call through interpret mode for CPU execution
    orig = pallas_lstm.bilstm_recurrence_pallas

    def interp(xproj, w_hh, hidden_size, block_b=256, interpret=False):
        return orig(xproj, w_hh, hidden_size, block_b=8, interpret=True)

    pallas_lstm.bilstm_recurrence_pallas = interp
    try:
        cfg_scan = ModelConfig(hidden_size=32, dropout_rate=0.0)
        cfg_pl = cfg_scan.with_(recurrence="pallas")
        params = init_params(jax.random.PRNGKey(2), cfg_scan)
        rng = np.random.default_rng(2)
        n = 12
        batch = Batch(
            kmer=rng.integers(0, 4, size=(n, 13)).astype(np.int32),
            base_means=rng.normal(size=(n, 13)).astype(np.float32),
            base_stds=np.abs(rng.normal(size=(n, 13))).astype(np.float32),
            base_signal_lens=rng.integers(1, 30, (n, 13)).astype(np.float32),
            signals=rng.normal(size=(n, 13, 16)).astype(np.float32))
        l_scan, _ = forward(params, batch, cfg_scan)
        l_pl, _ = forward(params, batch, cfg_pl)
        np.testing.assert_allclose(np.asarray(l_pl), np.asarray(l_scan),
                                   atol=2e-5, rtol=2e-5)
    finally:
        pallas_lstm.bilstm_recurrence_pallas = orig
