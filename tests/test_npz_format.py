"""Binary .npz feature-batch format: roundtrip, extract output, call_mods
input, dataset loading."""
import os

import numpy as np
import pytest

from make_synthetic import (synth_fast5_dir, synth_feature_rows,
                            synth_genome, write_fasta, write_feature_file)

from deepsignal_plant_tpu.utils.formats import (feature_npz_paths,
                                                load_feature_npz,
                                                parse_feature_lines,
                                                save_feature_npz)


def test_npz_roundtrip(tmp_path, rng):
    rows = synth_feature_rows(rng, 3, 10)
    fb = parse_feature_lines([r + "\n" for r in rows])
    p = str(tmp_path / "b.npz")
    save_feature_npz(p, fb)
    fb2 = load_feature_npz(p)
    assert fb2.sampleinfo == fb.sampleinfo
    assert fb2.read_ids[0] == fb.sampleinfo[0].split("\t")[4]
    np.testing.assert_array_equal(fb2.kmer, fb.kmer)
    np.testing.assert_array_equal(fb2.labels, fb.labels)
    np.testing.assert_array_equal(fb2.base_means, fb.base_means)
    np.testing.assert_array_equal(fb2.signals, fb.signals)
    # lens were integral -> exact through the int32 container
    np.testing.assert_array_equal(fb2.base_signal_lens,
                                  fb.base_signal_lens)


def test_feature_npz_paths(tmp_path, rng):
    assert feature_npz_paths(str(tmp_path / "nope.tsv")) is None
    assert feature_npz_paths(str(tmp_path)) is None
    rows = synth_feature_rows(rng, 1, 4)
    fb = parse_feature_lines([r + "\n" for r in rows])
    save_feature_npz(str(tmp_path / "00.npz"), fb)
    save_feature_npz(str(tmp_path / "01.npz"), fb)
    files = feature_npz_paths(str(tmp_path))
    assert len(files) == 2 and files[0].endswith("00.npz")


def test_extract_npz_output_matches_tsv(tmp_path, rng):
    from deepsignal_plant_tpu.io.dataset import FeatureDataset
    from deepsignal_plant_tpu.pipeline.extract import (ExtractContext,
                                                       ExtractOptions,
                                                       extract_features)
    genome = synth_genome(rng, {"chr1": 2000})
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    f5dir = str(tmp_path / "f5")
    synth_fast5_dir(f5dir, genome, rng, n_reads=4, read_len=120)
    ctx = ExtractContext.build(ExtractOptions(motifs="CG",
                                              reference_path=fasta))

    tsv_out = str(tmp_path / "f.tsv")
    extract_features(f5dir, True, ctx, tsv_out, nproc=1)
    npz_out = str(tmp_path / "npzdir")
    extract_features(f5dir, True, ctx, npz_out, nproc=1, out_format="npz")

    ds_tsv = FeatureDataset.from_file(tsv_out)
    ds_npz = FeatureDataset.from_file(npz_out)
    assert len(ds_tsv) == len(ds_npz) > 0
    # same multiset of rows (worker completion order may differ)
    key_t = np.lexsort((ds_tsv.kmer[:, 0], ds_tsv.base_means[:, 0]))
    key_n = np.lexsort((ds_npz.kmer[:, 0], ds_npz.base_means[:, 0]))
    np.testing.assert_allclose(ds_tsv.base_means[key_t],
                               ds_npz.base_means[key_n], atol=1e-6)
    np.testing.assert_array_equal(ds_tsv.kmer[key_t], ds_npz.kmer[key_n])


def test_call_mods_from_npz_dir(tmp_path, rng):
    import jax

    from deepsignal_plant_tpu.cli import main as cli_main
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint

    rows = synth_feature_rows(rng, 4, 16)
    fb = parse_feature_lines([r + "\n" for r in rows])
    npz_dir = tmp_path / "feats"
    npz_dir.mkdir()
    save_feature_npz(str(npz_dir / "0.npz"), fb)

    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(tmp_path / "m.ckpt.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(0), cfg), cfg)
    out = str(tmp_path / "calls.tsv")
    cli_main(["call_mods", "-i", str(npz_dir), "-m", ckpt, "-o", out,
              "--hid_rnn", "32", "--device_batch", "32"])
    lines = open(out).read().splitlines()
    assert len(lines) == len(rows)
    assert all(len(l.split("\t")) == 10 for l in lines)


def test_wire_npz_roundtrip(tmp_path, rng):
    import pytest
    from deepsignal_plant_tpu.utils.formats import (is_wire_npz,
                                                    load_wire_npz,
                                                    save_wire_npz)
    rows = synth_feature_rows(rng, 3, 10)
    fb = parse_feature_lines([r + "\n" for r in rows])
    wp = str(tmp_path / "w.npz")
    save_wire_npz(wp, fb)
    vp = str(tmp_path / "v1.npz")
    save_feature_npz(vp, fb)
    assert is_wire_npz(wp) and not is_wire_npz(vp)

    rb = load_wire_npz(wp)
    assert rb.n == len(fb)
    for i, s in enumerate(fb.sampleinfo):
        assert rb.raw[rb.row_starts[i]:rb.info_ends[i]].decode() == s
    np.testing.assert_array_equal(rb.kmer, fb.kmer.astype(np.int8))
    np.testing.assert_array_equal(rb.labels, fb.labels)
    np.testing.assert_array_equal(
        rb.signals, fb.signals.astype(np.float16))
    # the v1 loader refuses wire files with an actionable message
    with pytest.raises(ValueError, match="wire-format"):
        load_feature_npz(wp)


def test_engine_wire_npz_path(tmp_path, rng):
    """Engine over a wire-npz dir == engine over the source TSV (info
    columns byte-equal; probs within f16 double-rounding tolerance)."""
    import jax
    import pytest
    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.io.batching import batches_from_features_file
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    from deepsignal_plant_tpu.utils.fastparse import native_available
    from deepsignal_plant_tpu.utils.formats import save_wire_npz
    if not native_available():
        pytest.skip("native library unavailable")

    rows = synth_feature_rows(rng, 6, 20)
    feat = str(tmp_path / "f.tsv")
    with open(feat, "w") as f:
        f.write("\n".join(rows) + "\n")
    wire_dir = tmp_path / "wire"
    wire_dir.mkdir()
    for i, pb in enumerate(batches_from_features_file(feat, 48)):
        from deepsignal_plant_tpu.io.batching import _split
        fb = pb.features
        if pb.n_valid < len(fb.labels):
            fb, _ = _split(fb, pb.n_valid)
        save_wire_npz(str(wire_dir / f"{i:03d}.npz"), fb)

    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    params = init_params(jax.random.PRNGKey(5), cfg)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, params, cfg)
    eng = CallModsEngine(ckpt, cfg, CallConfig(device_batch=64))

    out_tsv = str(tmp_path / "calls_tsv.tsv")
    eng.run_features_file(feat, out_tsv)
    out_wire = str(tmp_path / "calls_wire.tsv")
    st = eng.run_features_file(str(wire_dir), out_wire)
    assert st.sites == len(rows)

    a = open(out_tsv).read().splitlines()
    b = open(out_wire).read().splitlines()
    assert len(a) == len(b)
    for la, lb in zip(a, b):
        wa, wb = la.split("\t"), lb.split("\t")
        assert wa[:6] == wb[:6] and wa[9] == wb[9]
        assert abs(float(wa[6]) - float(wb[6])) < 3e-4

    # --transfer_dtype float32 used to fall through to the v1 loader
    # and crash on wire input; the container is inherently f16, so the
    # fast path serves every transfer_dtype with identical output
    eng32 = CallModsEngine(ckpt, cfg,
                           CallConfig(device_batch=64,
                                      transfer_dtype="float32"))
    out32 = str(tmp_path / "calls_wire32.tsv")
    st32 = eng32.run_features_file(str(wire_dir), out32)
    assert st32.sites == len(rows)
    assert open(out32).read() == open(out_wire).read()
