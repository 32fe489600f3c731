"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest


def test_eight_virtual_devices():
    import jax
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    import jax
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 2)
    np.testing.assert_allclose(np.asarray(out).sum(axis=1), 1.0, atol=1e-5)


def test_sharded_inference_matches_single_device(tmp_path):
    """The dp-sharded engine gives the same probs as an unsharded forward."""
    import jax

    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.models.bilstm import Batch, forward, init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.parallel.mesh import make_mesh
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine

    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    params = init_params(jax.random.PRNGKey(9), cfg)
    ckpt = str(tmp_path / "m.ckpt.npz")
    save_checkpoint(ckpt, params, cfg)

    engine = CallModsEngine(ckpt, cfg, CallConfig(device_batch=64))
    assert engine.mesh.devices.size == 8

    rng = np.random.default_rng(4)
    n = 64
    fb = Batch(
        kmer=rng.integers(0, 4, size=(n, 13)).astype(np.int32),
        base_means=rng.normal(size=(n, 13)).astype(np.float32),
        base_stds=np.abs(rng.normal(size=(n, 13))).astype(np.float32),
        base_signal_lens=rng.integers(1, 30, size=(n, 13)).astype(np.float32),
        signals=rng.normal(size=(n, 13, 16)).astype(np.float32),
    )

    class _FB:
        kmer = fb.kmer
        base_means = fb.base_means
        base_stds = fb.base_stds
        base_signal_lens = fb.base_signal_lens
        signals = fb.signals

    sharded = np.asarray(engine.predict_probs(_FB))
    _logits, unsharded = forward(params, fb, cfg)
    np.testing.assert_allclose(sharded, np.asarray(unsharded), atol=1e-5)


def test_sharded_train_step_runs():
    import jax
    import jax.numpy as jnp

    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import Batch, init_params
    from deepsignal_plant_tpu.ops.optim import make_optimizer
    from deepsignal_plant_tpu.parallel.mesh import batch_sharding, make_mesh
    from deepsignal_plant_tpu.pipeline.train import make_train_step

    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.5)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer("Ranger", 1e-3)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, np.array([1.0, 2.0], np.float32), 0.5,
                           sharding)

    rng = np.random.default_rng(0)
    n = 32
    batch = Batch(
        kmer=rng.integers(0, 4, size=(n, 13)).astype(np.int32),
        base_means=rng.normal(size=(n, 13)).astype(np.float32),
        base_stds=np.abs(rng.normal(size=(n, 13))).astype(np.float32),
        base_signal_lens=rng.integers(1, 30, size=(n, 13)).astype(np.float32),
        signals=rng.normal(size=(n, 13, 16)).astype(np.float32),
    )
    labels = jnp.asarray(rng.integers(0, 2, n))
    mask = jnp.ones(n, jnp.float32)
    p1, o1, loss1 = step(params, opt_state, batch, labels, mask,
                         jax.random.PRNGKey(1))
    p2, o2, loss2 = step(p1, o1, batch, labels, mask, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
