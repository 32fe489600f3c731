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


def test_pallas_fallback_packed_int8(tmp_path):
    """The quantized PACKED dispatch must also fall back pallas -> scan:
    a regression test for an early-bound step local that retried the
    stale pallas step after _rebuild_steps (auto config on
    remote-attached rigs is exactly recurrence=pallas + int8 wire)."""
    import pytest

    from make_synthetic import synth_fast5_dir, synth_genome
    from deepsignal_plant_tpu.io.fast5 import read_tombo_fast5
    from deepsignal_plant_tpu.parallel.mesh import make_mesh
    from deepsignal_plant_tpu.pipeline.extract import (ExtractContext,
                                                       ExtractOptions,
                                                       extract_read_features,
                                                       features_to_packed)
    from deepsignal_plant_tpu.utils.fastparse import native_available
    from deepsignal_plant_tpu.utils.fileio import get_fast5s
    from deepsignal_plant_tpu.utils.formats import save_packed_npz
    if not native_available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    genome = synth_genome(rng, {"chr1": 2000})
    f5dir = str(tmp_path / "f5")
    synth_fast5_dir(f5dir, genome, rng, n_reads=4, read_len=120)
    ctx = ExtractContext.build(ExtractOptions(motifs="C"))
    feats = [f for p in sorted(get_fast5s(f5dir, True))
             if (f := extract_read_features(read_tombo_fast5(p), ctx))]
    pdir = tmp_path / "packed"
    pdir.mkdir()
    save_packed_npz(str(pdir / "000.npz"), features_to_packed(feats))

    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0,
                      recurrence="pallas")
    ckpt = str(tmp_path / "m.ckpt.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(0), cfg), cfg)
    engine = CallModsEngine(
        ckpt, cfg,
        CallConfig(device_batch=16, transfer_dtype="int8",
                   packed_wire="force"),
        mesh=make_mesh(jax.devices()[:1]))
    out = str(tmp_path / "out.tsv")
    st = engine.run_features_file(str(pdir), out)
    assert st.sites == len(open(out).readlines()) > 0
    assert engine.model_cfg.recurrence == "scan"  # fell back, not crashed
