"""Engine robustness: pallas -> scan fallback when the fused kernel can't
run on the current backend (e.g. CPU without interpret mode)."""
import numpy as np

import jax

from deepsignal_plant_tpu.config import CallConfig, ModelConfig
from deepsignal_plant_tpu.models.bilstm import init_params
from deepsignal_plant_tpu.models.convert import save_checkpoint
from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine


def test_pallas_fallback_to_scan(tmp_path):
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0,
                      recurrence="pallas")
    params = init_params(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "m.ckpt.npz")
    save_checkpoint(ckpt, params, cfg)
    # force a single-device CPU engine with the pallas recurrence: the
    # Mosaic kernel cannot lower on CPU, so the first call must fall back
    from deepsignal_plant_tpu.parallel.mesh import make_mesh
    engine = CallModsEngine(ckpt, cfg, CallConfig(device_batch=16),
                            mesh=make_mesh(jax.devices()[:1]))

    class FB:
        rng = np.random.default_rng(0)
        kmer = rng.integers(0, 4, size=(16, 13)).astype(np.int32)
        base_means = rng.normal(size=(16, 13)).astype(np.float32)
        base_stds = np.abs(rng.normal(size=(16, 13))).astype(np.float32)
        base_signal_lens = rng.integers(1, 30, (16, 13)).astype(np.float32)
        signals = rng.normal(size=(16, 13, 16)).astype(np.float32)

    probs = np.asarray(engine.predict_probs(FB))
    assert probs.shape == (16, 2)
    assert np.allclose(probs.sum(1), 1.0, atol=1e-5)
    assert engine.model_cfg.recurrence == "scan"  # fell back
