"""int8 transfer wire: quantized means/stds/signals with on-device
dequant (pipeline/call_mods.quantize_for_wire + the quantized step).

The int8 wire trades ~1.8x transfer bytes for bounded input noise
(amax/254 per float field); with random-weight models probs sit near the
0.5 decision boundary (worst case for call flips), so the agreement
threshold here is deliberately conservative.
"""
import os

import numpy as np

from make_synthetic import synth_feature_rows, write_feature_file


def _mk_ckpt(tmp_path):
    import jax

    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    cfg = ModelConfig(dropout_rate=0.0)
    params = init_params(jax.random.PRNGKey(3), cfg)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, jax.device_get(params), cfg)
    return ckpt, cfg


def test_quantize_roundtrip_bounds():
    from deepsignal_plant_tpu.models.bilstm import Batch
    from deepsignal_plant_tpu.pipeline.call_mods import quantize_for_wire
    rng = np.random.default_rng(0)
    n = 64
    b = Batch(kmer=rng.integers(0, 4, (n, 13)).astype(np.int8),
              base_means=rng.normal(size=(n, 13)).astype(np.float16),
              base_stds=np.abs(rng.normal(size=(n, 13))).astype(np.float16),
              base_signal_lens=rng.integers(1, 300, (n, 13)).astype(
                  np.float16),
              signals=rng.normal(size=(n, 13, 16)).astype(np.float16))
    qb, scales = quantize_for_wire(b)
    assert qb.base_means.dtype == np.int8
    assert qb.signals.dtype == np.int8
    assert qb.base_signal_lens.dtype == np.float16   # not quantized
    assert scales.shape == (3,) and scales.dtype == np.float32
    for q, s, orig in ((qb.base_means, scales[0], b.base_means),
                       (qb.base_stds, scales[1], b.base_stds),
                       (qb.signals, scales[2], b.signals)):
        deq = q.astype(np.float32) * s
        err = np.abs(deq - np.asarray(orig, np.float32)).max()
        # symmetric quant: error bounded by scale/2 (+ f16 input rounding)
        assert err <= s / 2 + 1e-3
    # wire shrink: ~1.8x fewer bytes than the f16 layout
    f16_bytes = sum(np.asarray(a).nbytes for a in b)
    q_bytes = sum(np.asarray(a).nbytes for a in qb) + scales.nbytes
    assert q_bytes < 0.62 * f16_bytes


def test_native_quantizer_bit_exact_vs_numpy():
    """The native (SIMD, GIL-released) quantizer must match the numpy
    reference path bit-for-bit — same int8 codes, same f32 scale — across
    dtypes, shapes (incl. non-multiple-of-16 tails), and the all-zero /
    empty edge cases."""
    import pytest

    from deepsignal_plant_tpu.utils.fastparse import (native_available,
                                                      quantize_int8)
    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    cases = [(np.float16, (0,)), (np.float16, (7,)), (np.float16, (17,)),
             (np.float16, (513, 13)), (np.float16, (300, 13, 16)),
             (np.float32, (513, 13)), (np.float32, (300, 13, 16))]
    for dtype, shape in cases:
        a = (rng.standard_normal(shape) * 3).astype(dtype)
        out, s = quantize_int8(a)
        a32 = np.asarray(a, np.float32)
        amax = float(np.max(np.abs(a32))) if a32.size else 0.0
        scale = (amax / 127.0) or 1.0
        ref = np.clip(np.rint(a32 / np.float32(scale)), -127,
                      127).astype(np.int8)
        assert np.array_equal(out, ref), (dtype, shape)
        assert np.float32(s) == np.float32(scale), (dtype, shape)
    z = np.zeros((33,), np.float16)
    out, s = quantize_int8(z)
    assert np.all(out == 0) and s == 1.0
    assert quantize_int8(np.arange(5, dtype=np.int32)) is None
    # non-finite inputs (outside the feature domain, but the native and
    # numpy paths must still agree): NaN poisons the scale like np.max,
    # quantized codes become astype-of-NaN (0); inf makes finite
    # elements quantize to 0 and inf/inf (NaN) to 0
    with np.errstate(invalid="ignore"):
        for dtype in (np.float16, np.float32):
            for special in (np.nan, np.inf):
                a = (np.random.default_rng(3).standard_normal(40) * 2
                     ).astype(dtype)
                a[7] = special
                out, s = quantize_int8(a)
                a32 = np.asarray(a, np.float32)
                scale = np.float32(float(np.max(np.abs(a32))) / 127.0)
                ref = np.clip(np.rint(a32 / scale), -127,
                              127).astype(np.int8)
                assert np.array_equal(out, ref), (dtype, special, out, ref)
                if special is np.inf:
                    assert np.float32(s) == scale
                else:
                    assert np.isnan(s)
                # the 16-wide AVX lanes (first 32 elements) and the
                # scalar tail (last 8) must agree on the same input
                a64 = np.concatenate([a, a[:24]]).astype(dtype)
                out64, _ = quantize_int8(a64)
                ref64 = np.clip(np.rint(np.asarray(a64, np.float32)
                                        / scale), -127, 127).astype(np.int8)
                assert np.array_equal(out64, ref64)


def test_transfer_dtype_auto_resolution():
    """auto -> float16 on directly-attached backends (this CPU mesh),
    int8 when the backend's platform_version marks the axon tunnel."""
    from deepsignal_plant_tpu.config import CallConfig
    from deepsignal_plant_tpu.parallel.mesh import make_mesh
    from deepsignal_plant_tpu.pipeline.call_mods import \
        resolve_transfer_dtype
    mesh = make_mesh()
    assert CallConfig().transfer_dtype == "auto"
    assert resolve_transfer_dtype("auto", mesh) == "float16"
    assert resolve_transfer_dtype("int8", mesh) == "int8"
    assert resolve_transfer_dtype("float32", mesh) == "float32"

    class _Client:
        platform_version = "PJRT C API\naxon 0.1.0; compile-cache v14"

    class _Dev:
        client = _Client()

    class _Mesh:
        devices = np.array([_Dev()], dtype=object)

    assert resolve_transfer_dtype("auto", _Mesh()) == "int8"

    # without the native quantizer, auto must NOT pick int8 even on a
    # remote-attached mesh: the numpy quantize fallback is slower than
    # the f16 wire (GIL-bound, negative thread scaling — docs/BENCH.md)
    import deepsignal_plant_tpu.utils.fastparse as fp
    orig = fp.native_available
    fp.native_available = lambda: False
    try:
        assert resolve_transfer_dtype("auto", _Mesh()) == "float16"
    finally:
        fp.native_available = orig


def test_quantize_zero_field():
    from deepsignal_plant_tpu.models.bilstm import Batch
    from deepsignal_plant_tpu.pipeline.call_mods import quantize_for_wire
    n = 8
    z = np.zeros((n, 13), np.float16)
    b = Batch(kmer=np.zeros((n, 13), np.int8), base_means=z, base_stds=z,
              base_signal_lens=z, signals=np.zeros((n, 13, 16), np.float16))
    qb, scales = quantize_for_wire(b)
    assert np.all(qb.signals == 0) and np.all(scales > 0)


def test_int8_engine_agreement_vs_f32(tmp_path):
    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    ckpt, _ = _mk_ckpt(tmp_path)
    rng = np.random.default_rng(5)
    feat = str(tmp_path / "f.tsv")
    write_feature_file(feat, synth_feature_rows(rng, 40, 64))

    outs = {}
    probs = {}
    for dt in ("float32", "int8"):
        eng = CallModsEngine(ckpt, ModelConfig(dropout_rate=0.0),
                             CallConfig(device_batch=1024,
                                        transfer_dtype=dt))
        out = str(tmp_path / f"o_{dt}.tsv")
        st = eng.run_features_file(feat, out)
        assert st.sites == 2560
        rows = [ln.split("\t") for ln in open(out).read().splitlines()]
        outs[dt] = {tuple(r[:5]): (r[8] == "1") for r in rows}
        probs[dt] = {tuple(r[:5]): float(r[7]) for r in rows}
    keys = sorted(outs["float32"])
    assert keys == sorted(outs["int8"])
    agree = np.mean([outs["float32"][k] == outs["int8"][k] for k in keys])
    mae = np.mean([abs(probs["float32"][k] - probs["int8"][k])
                   for k in keys])
    # random weights put probs near 0.5 — the boundary-heavy worst case
    assert mae < 5e-3, mae
    assert agree >= 0.97, agree


def test_int8_cli(tmp_path):
    from deepsignal_plant_tpu.cli import main as cli_main
    ckpt, _ = _mk_ckpt(tmp_path)
    rng = np.random.default_rng(6)
    feat = str(tmp_path / "f.tsv")
    write_feature_file(feat, synth_feature_rows(rng, 8, 32))
    out = str(tmp_path / "calls.tsv")
    cli_main(["call_mods", "-i", feat, "-m", ckpt, "-o", out,
              "--transfer_dtype", "int8", "--device_batch", "512"])
    lines = open(out).read().splitlines()
    assert len(lines) == 256
    assert all(len(ln.split("\t")) == 10 for ln in lines)
    assert os.path.getsize(out) > 0
