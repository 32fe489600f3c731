"""bfloat16 compute mode: runs, and calls agree with float32 on clearly
separable inputs."""
import numpy as np

import jax

from deepsignal_plant_tpu.config import ModelConfig
from deepsignal_plant_tpu.models.bilstm import Batch, forward, init_params


def test_bf16_forward_close_to_f32(rng):
    cfg32 = ModelConfig(hidden_size=32, dropout_rate=0.0)
    cfg16 = cfg32.with_(compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), cfg32)
    n = 64
    batch = Batch(
        kmer=rng.integers(0, 4, size=(n, 13)).astype(np.int32),
        base_means=rng.normal(size=(n, 13)).astype(np.float32),
        base_stds=np.abs(rng.normal(size=(n, 13))).astype(np.float32),
        base_signal_lens=rng.integers(1, 30, (n, 13)).astype(np.float32),
        signals=rng.normal(size=(n, 13, 16)).astype(np.float32))
    l32, p32 = forward(params, batch, cfg32)
    l16, p16 = forward(params, batch, cfg16)
    assert l16.dtype == np.float32  # logits upcast at the head
    # bf16 has ~3 decimal digits: probabilities should track within ~2e-2
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32), atol=5e-2)
    # decisions agree except near the boundary
    d32 = np.asarray(p32[:, 1] > 0.5)
    d16 = np.asarray(p16[:, 1] > 0.5)
    margin = np.abs(np.asarray(p32[:, 1]) - 0.5) > 0.05
    assert (d32[margin] == d16[margin]).all()


def test_resolve_compute_dtype():
    from deepsignal_plant_tpu.utils.jaxinit import resolve_compute_dtype

    # explicit choices pass through untouched
    assert resolve_compute_dtype("float32") == "float32"
    assert resolve_compute_dtype("bfloat16") == "bfloat16"
    # auto on the CPU test backend resolves to f32 (bf16 is emulated
    # there); on tpu/axon backends it resolves to bfloat16
    assert resolve_compute_dtype("auto") == (
        "bfloat16" if jax.default_backend() in ("tpu", "axon")
        else "float32")


def test_config_rejects_unresolved_auto():
    import pytest

    with pytest.raises(ValueError, match="compute_dtype"):
        ModelConfig(compute_dtype="auto")


def test_cli_compute_dtype_defaults():
    """All three model subcommands default to auto: bf16 mixed precision
    on TPU (f32 master params, f32 gate math in the kernels; convergence
    and grad parity tested), float32 elsewhere. --compute_dtype float32
    restores exact f32 math."""
    from deepsignal_plant_tpu.cli import build_parser

    parser = build_parser()
    call = parser.parse_args(
        ["call_mods", "--input_path", "x", "--model_path", "m",
         "--result_file", "r"])
    assert call.compute_dtype == "auto"
    train = parser.parse_args(
        ["train", "--train_file", "t", "--valid_file", "v",
         "--model_dir", "d"])
    assert train.compute_dtype == "auto"
    denoise = parser.parse_args(["denoise", "--train_file", "t"])
    assert denoise.compute_dtype == "auto"
