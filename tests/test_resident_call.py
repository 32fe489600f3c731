"""Device-resident inference plane: outputs byte-identical to the
streaming engine across input planes, segments, and the 8-device mesh."""
import os

import numpy as np
import pytest

from make_synthetic import synth_feature_rows, write_feature_file

from deepsignal_plant_tpu.cli import main as cli_main
from deepsignal_plant_tpu.config import CallConfig, ModelConfig
from deepsignal_plant_tpu.models.bilstm import init_params
from deepsignal_plant_tpu.models.convert import save_checkpoint
from deepsignal_plant_tpu.utils.fastparse import native_available

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native featparse not built")


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    rng = np.random.default_rng(41)
    d = tmp_path_factory.mktemp("resident")
    feat = write_feature_file(str(d / "f.tsv"),
                              synth_feature_rows(rng, 12, 40))
    import jax
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(d / "m.ckpt.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(3), cfg), cfg)
    return feat, ckpt, d


def _cli(feat, ckpt, out, *extra):
    cli_main(["call_mods", "-i", feat, "-m", ckpt, "-o", out,
              "--hid_rnn", "32", "--device_batch", "64", *extra])
    return open(out, "rb").read()


@needs_native
def test_resident_byte_identical_tsv(env):
    feat, ckpt, d = env
    stream = _cli(feat, ckpt, str(d / "stream.tsv"))
    resident = _cli(feat, ckpt, str(d / "res.tsv"),
                    "--device_resident", "always")
    assert resident == stream
    assert len(resident.splitlines()) == 480


@needs_native
def test_resident_multi_segment(env):
    """device_batch 32 with 480 rows forces K=RESIDENT_MAX_CHUNKS-capped
    multi-segment execution; outputs still byte-identical and the profile
    reports every segment."""
    from deepsignal_plant_tpu.models.convert import load_checkpoint
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    feat, ckpt, d = env
    _params, cfg = load_checkpoint(ckpt)
    eng = CallModsEngine(
        ckpt, cfg.with_(dropout_rate=0.0),
        CallConfig(device_batch=32, device_resident="always",
                   transfer_dtype="float16"))
    # force tiny segments: K chunks resolved from est_rows vs target
    eng.RESIDENT_MAX_CHUNKS = 4
    out = str(d / "seg.tsv")
    stats = eng.run_features_file(feat, out)
    assert stats.sites == 480
    prof = eng.last_resident_profile
    assert prof["rows"] == 480
    assert prof["k_chunks"] == 4
    assert prof["segments"] == 480 // (4 * 32) + 1
    assert prof["compute_s"] > 0
    stream = _cli(feat, ckpt, str(d / "stream32.tsv"),
                  "--device_batch", "32")
    assert open(out, "rb").read() == stream


@needs_native
def test_resident_wire_npz_planes(env, tmp_path):
    """Resident serves wire v2 and packed v3 .npz inputs byte-identically
    to the streaming engine on the same inputs."""
    feat, ckpt, d = env
    from deepsignal_plant_tpu.utils.formats import parse_feature_lines
    from deepsignal_plant_tpu.utils.fastparse import (pack_raw_block,
                                                      parse_raw_feature_block)
    from deepsignal_plant_tpu.utils.formats import (save_packed_npz,
                                                    save_wire_npz)
    for fmt in ("npz_wire", "npz_packed"):
        wdir = str(tmp_path / fmt)
        os.makedirs(wdir, exist_ok=True)
        if fmt == "npz_wire":
            fb = parse_feature_lines(open(feat).readlines())
            save_wire_npz(os.path.join(wdir, "batch_0.npz"), fb)
        else:
            rb = parse_raw_feature_block(open(feat, "rb").read(), 13, 16)
            save_packed_npz(os.path.join(wdir, "batch_0.npz"),
                            pack_raw_block(rb))
        stream = _cli(wdir, ckpt, str(d / f"stream_{fmt}.tsv"))
        res = _cli(wdir, ckpt, str(d / f"res_{fmt}.tsv"),
                   "--device_resident", "always")
        assert res == stream, fmt


@needs_native
def test_resident_rejects_v1_npz(env, tmp_path):
    feat, ckpt, d = env
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    from deepsignal_plant_tpu.models.convert import load_checkpoint
    _p, cfg = load_checkpoint(ckpt)
    eng = CallModsEngine(ckpt, cfg.with_(dropout_rate=0.0),
                         CallConfig(device_resident="always"))
    # v1 plain npz: parse then save via the v1 writer
    from deepsignal_plant_tpu.io.batching import batches_from_features_file
    from deepsignal_plant_tpu.utils.formats import save_feature_npz
    d1 = tmp_path / "v1"
    d1.mkdir()
    for i, pb in enumerate(batches_from_features_file(feat, 512, 13, 16,
                                                      None)):
        save_feature_npz(str(d1 / f"batch_{i}.npz"), pb.features)
        break
    with pytest.raises(ValueError, match="v1"):
        eng.run_features_file(str(d1), str(tmp_path / "x.tsv"))
