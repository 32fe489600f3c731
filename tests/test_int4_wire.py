"""EXPERIMENTAL int4 signal wire (--transfer_dtype int4): native/numpy
pack parity, device unpack round-trip, and engine-level agreement vs the
f16 wire. VERDICT r2 #5."""
import numpy as np
import pytest

from deepsignal_plant_tpu.pipeline.call_mods import (_quantize_field_int4,
                                                     unpack_int4_jnp)


def _numpy_pack(a):
    a32 = np.asarray(a, np.float32)
    amax = float(np.max(np.abs(a32))) if a32.size else 0.0
    sd = amax / 7.0
    scale = float(np.float32(sd)) if sd != 0.0 else 1.0
    with np.errstate(invalid="ignore"):
        q = np.clip(np.rint(a32 / np.float32(scale)), -7, 7)
    q = np.nan_to_num(q, nan=0.0).astype(np.int8).reshape(-1)
    packed = ((q[0::2] & 0xF) | ((q[1::2] & 0xF) << 4)).astype(np.uint8)
    return packed.reshape(a32.shape[:-1] + (a32.shape[-1] // 2,)), scale


@pytest.mark.parametrize("dtype", [np.float16, np.float32])
def test_native_matches_numpy_pack(dtype):
    from deepsignal_plant_tpu.utils.fastparse import quantize_int4
    rng = np.random.default_rng(0)
    a = rng.normal(size=(64, 13, 16)).astype(dtype)
    native = quantize_int4(a)
    if native is None:
        pytest.skip("native library unavailable")
    qn, sn = native
    qp, sp = _numpy_pack(a)
    assert sn == sp
    np.testing.assert_array_equal(qn, qp)
    assert qn.dtype == np.uint8 and qn.shape == (64, 13, 8)


def test_unpack_round_trips_quantized_values():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(32, 16)).astype(np.float32)
    packed, scale = _quantize_field_int4(a)
    vals = np.asarray(unpack_int4_jnp(packed))
    assert vals.shape == a.shape
    assert vals.min() >= -7 and vals.max() <= 7
    # dequantized error bounded by half a quantization step
    np.testing.assert_allclose(vals * scale, a, atol=scale / 2 + 1e-7)


def test_constant_and_zero_inputs():
    z = np.zeros((4, 16), np.float32)
    packed, scale = _quantize_field_int4(z)
    assert scale == 1.0
    assert not packed.any()
    c = np.full((4, 16), -3.0, np.float32)
    packed, scale = _quantize_field_int4(c)
    vals = np.asarray(unpack_int4_jnp(packed)) * scale
    np.testing.assert_allclose(vals, c, atol=1e-6)


def test_engine_int4_wire_agreement(tmp_path):
    """Engine f16 vs int4 on the same features: identical info columns,
    100% call agreement expected at this fixture's margins, probs within
    the int4 noise bound."""
    import jax

    from make_synthetic import synth_feature_rows, write_feature_file

    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine

    rng = np.random.default_rng(3)
    feat = str(tmp_path / "f.tsv")
    write_feature_file(feat, synth_feature_rows(rng, 10, 20))

    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(5), cfg), cfg)

    outs = {}
    for td in ("float16", "int4"):
        eng = CallModsEngine(ckpt, cfg,
                             CallConfig(device_batch=64,
                                        transfer_dtype=td))
        out = str(tmp_path / f"{td}.tsv")
        st = eng.run_features_file(feat, out)
        assert st.sites == 200
        outs[td] = sorted(open(out).read().splitlines())

    agree = 0
    for la, lb in zip(outs["float16"], outs["int4"]):
        wa, wb = la.split("\t"), lb.split("\t")
        assert wa[:6] == wb[:6] and wa[9] == wb[9]
        assert abs(float(wa[6]) - float(wb[6])) < 5e-2
        agree += (float(wa[7]) > float(wa[6])) == \
            (float(wb[7]) > float(wb[6]))
    assert agree / len(outs["float16"]) >= 0.99


def test_int4_rejects_odd_signal_len(tmp_path):
    """int4 + odd signal_len must fail at engine construction with a
    clear message, not mid-run with a numpy broadcast error (ADVICE r3)."""
    import jax
    import pytest

    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine

    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0, signal_len=15)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(5), cfg), cfg)
    with pytest.raises(ValueError, match="even --signal_len"):
        CallModsEngine(ckpt, cfg, CallConfig(device_batch=64,
                                             transfer_dtype="int4"))


def test_int4_halves_signal_bytes():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(512, 13, 16)).astype(np.float16)
    packed, _ = _quantize_field_int4(a)
    assert packed.nbytes * 2 == a.size  # 0.5 B/value vs f16's 2 B
