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
