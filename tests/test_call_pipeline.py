"""End-to-end tests of call_mods and call_freq on synthetic data, with the
reference call_freq implementation as an oracle."""
import os
import sys

import numpy as np
import pytest

from make_synthetic import synth_feature_rows, write_feature_file

from deepsignal_plant_tpu.cli import main as cli_main
from deepsignal_plant_tpu.config import CallConfig, ModelConfig
from deepsignal_plant_tpu.models.bilstm import init_params
from deepsignal_plant_tpu.models.convert import save_checkpoint

SMALL = dict(hidden_size=32, dropout_rate=0.0)


@pytest.fixture(scope="module")
def small_ckpt(tmp_path_factory):
    import jax
    cfg = ModelConfig(**SMALL)
    params = init_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path_factory.mktemp("ckpt") / "small.ckpt.npz")
    save_checkpoint(path, params, cfg)
    return path, cfg


@pytest.fixture(scope="module")
def features_file(tmp_path_factory):
    rng = np.random.default_rng(11)
    rows = synth_feature_rows(rng, n_reads=8, sites_per_read=25)
    path = str(tmp_path_factory.mktemp("feat") / "features.tsv")
    return write_feature_file(path, rows), len(rows)


def _run_call_mods(small_ckpt, features_file, tmp_path, extra=()):
    ckpt_path, _cfg = small_ckpt
    feat_path, n_rows = features_file
    out = str(tmp_path / "call_mods.tsv")
    cli_main(["call_mods", "-i", feat_path, "-m", ckpt_path, "-o", out,
              "--hid_rnn", "32", "--device_batch", "64", *extra])
    return out, n_rows


def test_call_mods_features_file(small_ckpt, features_file, tmp_path):
    out, n_rows = _run_call_mods(small_ckpt, features_file, tmp_path)
    lines = open(out).read().splitlines()
    assert len(lines) == n_rows
    for ln in lines:
        w = ln.split("\t")
        assert len(w) == 10
        p0, p1 = float(w[6]), float(w[7])
        assert 0.0 <= p0 <= 1.0 and 0.0 <= p1 <= 1.0
        assert abs(p0 + p1 - 1.0) < 2e-6
        assert int(w[8]) == (0 if p0 >= p1 else 1)
        assert len(w[9]) == 5 and w[9][2] == "C"  # center 5-mer, C centered
    # input order is preserved (sampleinfo passthrough)
    feat_lines = open(features_file[0]).read().splitlines()
    for fl, cl in zip(feat_lines, lines):
        assert fl.split("\t")[:6] == cl.split("\t")[:6]


def test_call_mods_deterministic(small_ckpt, features_file, tmp_path):
    out1, _ = _run_call_mods(small_ckpt, features_file, tmp_path / "a"
                             if (tmp_path / "a").mkdir() or True else None)
    out2, _ = _run_call_mods(small_ckpt, features_file, tmp_path / "b"
                             if (tmp_path / "b").mkdir() or True else None)
    assert open(out1).read() == open(out2).read()


def test_call_mods_row_parses_as_reference_modrecord(
        reference_importable, small_ckpt, features_file, tmp_path):
    out, _ = _run_call_mods(small_ckpt, features_file, tmp_path)
    from deepsignal_plant.utils.txt_formater import ModRecord
    for ln in open(out).read().splitlines():
        rec = ModRecord(ln.split("\t"))
        assert rec._prob_0 + rec._prob_1 == pytest.approx(1.0, abs=2e-6)


def test_call_freq_matches_reference(reference_importable, small_ckpt,
                                     features_file, tmp_path):
    """Our call_freq output == reference calculate_mods_frequency +
    write_sitekey2stats, byte for byte (sorted, tsv and bed)."""
    out, _ = _run_call_mods(small_ckpt, features_file, tmp_path)

    for is_bed in (False, True):
        ours = str(tmp_path / ("ours.bed" if is_bed else "ours.tsv"))
        argv = ["call_freq", "-i", out, "-o", ours, "--sort",
                "--prob_cf", "0.3"]
        if is_bed:
            argv.append("--bed")
        cli_main(argv)

        from deepsignal_plant.call_mods_freq import (
            calculate_mods_frequency, write_sitekey2stats)
        stats = calculate_mods_frequency([out], 0.3)
        theirs = str(tmp_path / ("ref.bed" if is_bed else "ref.tsv"))
        write_sitekey2stats(stats, theirs, True, is_bed, False)
        assert open(ours).read() == open(theirs).read()


def test_call_freq_contig_parallel(reference_importable, small_ckpt,
                                   features_file, tmp_path):
    out, _ = _run_call_mods(small_ckpt, features_file, tmp_path)
    ours = str(tmp_path / "contig.tsv")
    cli_main(["call_freq", "-i", out, "-o", ours, "--sort",
              "--contigs", "chr1", "--nproc", "2"])
    plain = str(tmp_path / "plain.tsv")
    cli_main(["call_freq", "-i", out, "-o", plain, "--sort"])
    assert open(ours).read() == open(plain).read()


def test_tools_split_and_freq2bed(small_ckpt, features_file, tmp_path):
    out, n_rows = _run_call_mods(small_ckpt, features_file, tmp_path)
    cli_main(["tools", "split_call_mods_by_motif", "--callmods_file", out])
    base, ext = os.path.splitext(out)
    split_total = 0
    for tag in ("CG", "CHG", "CHH"):
        p = base + "." + tag + ext
        assert os.path.exists(p)
        split_total += len(open(p).read().splitlines())
    assert split_total <= n_rows  # some center contexts may be unknown

    freq = str(tmp_path / "freq.tsv")
    cli_main(["call_freq", "-i", out, "-o", freq, "--sort"])
    cli_main(["tools", "freq2bed", "--freqfile", freq, "--sort"])
    bed = os.path.splitext(freq)[0] + ".bed"
    assert os.path.exists(bed)
    for ln in open(bed).read().splitlines():
        w = ln.split("\t")
        assert len(w) == 11
        assert int(w[1]) + 1 == int(w[2])
