"""Pallas recurrence under multi-device SPMD (shard_map over the dp axis).

Round-1 excluded the fused kernels from multi-device meshes because
GSPMD cannot partition an opaque pallas_call. The production design runs
the kernel inside jax.shard_map — each device executes the kernel on its
local batch shard — which these tests validate on the virtual 8-device
CPU mesh (kernels in interpret mode): forward parity, gradient parity
with explicit psum, and the full model forward as the engine wraps it.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from deepsignal_plant_tpu.ops import pallas_lstm
from deepsignal_plant_tpu.ops.lstm import _scan_bidir, init_bilstm_layer
from deepsignal_plant_tpu.parallel.mesh import make_mesh


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_lstm, "_INTERPRET", True)


def _setup(B=64, H=16, T=7, seed=0):
    layer = init_bilstm_layer(jax.random.PRNGKey(seed), 2 * H, H)
    rng = np.random.default_rng(seed)
    xproj = jnp.asarray(rng.normal(size=(T, 2, B, 4 * H)).astype(np.float32))
    w_hh = layer["w_hh"].astype(jnp.float32)
    weights = jnp.asarray(rng.normal(size=(T, 2, B, H)).astype(np.float32))
    return xproj, w_hh, weights


def test_shardmap_fwd_matches_scan():
    """Kernel on per-device batch shards == scan on the full batch."""
    xproj, w_hh, _ = _setup()
    mesh = make_mesh()
    assert mesh.devices.size == 8

    def run(xp, w):
        return pallas_lstm.bilstm_recurrence_trainable(xp, w, 16)

    smapped = jax.jit(jax.shard_map(
        run, mesh=mesh, in_specs=(P(None, None, "dp"), P()),
        out_specs=P(None, None, "dp"), check_vma=False))
    ys_sharded = smapped(xproj, w_hh)
    ys_scan, _, _ = _scan_bidir(xproj, w_hh, 16, None, jnp.float32)
    np.testing.assert_allclose(np.asarray(ys_sharded), np.asarray(ys_scan),
                               atol=1e-5, rtol=1e-5)


def test_shardmap_grads_match_scan_autodiff():
    """Per-shard custom-VJP grads + psum == global scan autodiff grads."""
    xproj, w_hh, weights = _setup()
    mesh = make_mesh()

    def sharded_loss_and_grads(xp, w, wt):
        def body(xp_l, w_l, wt_l):
            def local_loss(xp_i, w_i):
                ys = pallas_lstm.bilstm_recurrence_trainable(xp_i, w_i, 16)
                return jnp.sum(ys * wt_l)
            loss, (gx, gw) = jax.value_and_grad(
                local_loss, argnums=(0, 1))(xp_l, w_l)
            # batch-sharded args keep per-shard grads; the replicated
            # weight's grad needs the cross-device sum
            return (jax.lax.psum(loss, "dp"), gx,
                    jax.lax.psum(gw, "dp"))

        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(None, None, "dp"), P(), P(None, None, "dp")),
            out_specs=(P(), P(None, None, "dp"), P()),
            check_vma=False))(xp, w, wt)

    loss_s, gx_s, gw_s = sharded_loss_and_grads(xproj, w_hh, weights)

    def loss_scan(xp, w):
        ys, _, _ = _scan_bidir(xp, w, 16, None, jnp.float32)
        return jnp.sum(ys * weights)

    loss_ref = loss_scan(xproj, w_hh)
    gx_ref, gw_ref = jax.grad(loss_scan, argnums=(0, 1))(xproj, w_hh)
    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_ref),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_ref),
                               atol=2e-3, rtol=2e-3)


def test_full_model_forward_shardmap_pallas():
    """The whole ModelBiLSTM forward with recurrence='pallas' under the
    engine's shard_map wrapping == unsharded scan forward."""
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import (Batch, forward,
                                                    init_params)

    cfg_p = ModelConfig(hidden_size=32, dropout_rate=0.0,
                        recurrence="pallas")
    cfg_s = cfg_p.with_(recurrence="scan")
    params = init_params(jax.random.PRNGKey(2), cfg_p)
    rng = np.random.default_rng(8)
    n = 64
    batch = Batch(
        kmer=rng.integers(0, 4, size=(n, 13)).astype(np.int32),
        base_means=rng.normal(size=(n, 13)).astype(np.float32),
        base_stds=np.abs(rng.normal(size=(n, 13))).astype(np.float32),
        base_signal_lens=rng.integers(1, 30, (n, 13)).astype(np.float32),
        signals=rng.normal(size=(n, 13, 16)).astype(np.float32))

    mesh = make_mesh()

    def step(p, b):
        _, probs = forward(p, b, cfg_p, train=False)
        return probs

    smapped = jax.jit(jax.shard_map(step, mesh=mesh,
                                    in_specs=(P(), P("dp")),
                                    out_specs=P("dp"), check_vma=False))
    probs_sharded = np.asarray(smapped(params, batch))
    _, probs_ref = forward(params, batch, cfg_s, train=False)
    np.testing.assert_allclose(probs_sharded, np.asarray(probs_ref),
                               atol=2e-5, rtol=2e-5)
