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


def _synth_call_rows(rng, n_rows):
    """Synthetic call_mods rows: several contigs, both strands, repeated
    sites (coverage), -1 pos_in_strand, 6dp probs like the real emitter."""
    chroms = ["chr1", "chr10", "chr2", "scaffold_9"]
    rows = []
    for i in range(n_rows):
        c = chroms[int(rng.integers(len(chroms)))]
        pos = int(rng.integers(0, 500))
        strand = "+" if rng.random() < 0.5 else "-"
        pis = -1 if rng.random() < 0.1 else pos
        p1 = round(float(rng.random()), 6)
        p0 = round(1.0 - p1, 6)
        label = 0 if p0 >= p1 else 1
        rows.append("\t".join([c, str(pos), strand, str(pis),
                               f"read{i % 37}", "t", str(p0), str(p1),
                               str(label), "ACGTACCGTACGT"]))
    return rows


@pytest.mark.parametrize("native", [True, False])
def test_call_freq_accumulator_vs_reference_multiblock(
        reference_importable, tmp_path, monkeypatch, native):
    """Vectorized accumulator == reference oracle byte-for-byte on a file
    spanning several parse blocks, in every output mode, through both the
    native and the Python-fallback row parsers."""
    from deepsignal_plant_tpu.pipeline import call_freq as cf

    if not native:
        monkeypatch.setattr(
            "deepsignal_plant_tpu.utils.fastparse.parse_call_bytes",
            lambda raw: None)

    rng = np.random.default_rng(7)
    calls = str(tmp_path / "calls.tsv")
    with open(calls, "w") as f:
        f.write("\n".join(_synth_call_rows(rng, 4000)) + "\n")

    from deepsignal_plant.call_mods_freq import (calculate_mods_frequency,
                                                 write_sitekey2stats)
    for is_sort in (False, True):
        for is_bed in (False, True):
            acc = cf.FreqAccumulator(prob_cf=0.2)
            # tiny blocks force multi-block accumulation + cross-block
            # site merging
            acc.add_file(calls, block_bytes=1 << 12)
            ours = str(tmp_path / "ours.out")
            cf.write_freq(acc, ours, is_sort, is_bed, False)

            stats = calculate_mods_frequency([calls], 0.2)
            theirs = str(tmp_path / "ref.out")
            write_sitekey2stats(stats, theirs, is_sort, is_bed, False)
            assert open(ours).read() == open(theirs).read(), \
                (is_sort, is_bed)


def test_call_freq_accumulator_contig_counts(reference_importable,
                                             tmp_path):
    """Contig mode counts only on-contig rows (call_mods_freq.py:52-57)."""
    from deepsignal_plant_tpu.pipeline import call_freq as cf
    rng = np.random.default_rng(3)
    calls = str(tmp_path / "calls.tsv")
    with open(calls, "w") as f:
        f.write("\n".join(_synth_call_rows(rng, 1000)) + "\n")
    acc = cf.FreqAccumulator(prob_cf=0.2, contig="chr2")
    acc.add_file(calls, block_bytes=1 << 12)
    n_chr2 = sum(1 for ln in open(calls) if ln.split("\t")[0] == "chr2")
    assert acc.count == n_chr2
    assert 0 < acc.used <= n_chr2

    from deepsignal_plant.call_mods_freq import (calculate_mods_frequency,
                                                 write_sitekey2stats)
    ours = str(tmp_path / "ours.tsv")
    cf.write_freq(acc, ours, True, False, False)
    stats = calculate_mods_frequency([calls], 0.2, "chr2")
    theirs = str(tmp_path / "ref.tsv")
    write_sitekey2stats(stats, theirs, True, False, False)
    assert open(ours).read() == open(theirs).read()


def test_fast_tsv_path_matches_classic(small_ckpt, features_file,
                                       tmp_path):
    """The zero-Python-strings fast path (native span emit) produces
    byte-identical output to the classic FeatureBatch path at the same
    f16 wire format, including across multi-segment batches and the
    padded final batch."""
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    ckpt_path, cfg = small_ckpt
    feat_path, n_rows = features_file
    eng = CallModsEngine(ckpt_path, cfg,
                         CallConfig(device_batch=64, dispatch_workers=2))
    fast = str(tmp_path / "fast.tsv")
    st_fast = eng.run_features_file(feat_path, fast)
    classic = str(tmp_path / "classic.tsv")
    st_classic = eng.run_features_file(feat_path, classic,
                                       use_fast_path=False)
    assert open(fast).read() == open(classic).read()
    assert st_fast.sites == st_classic.sites == n_rows
    assert st_fast.label_correct == st_classic.label_correct


def test_fast_tsv_path_gzip_roundtrip(small_ckpt, features_file, tmp_path):
    import gzip as gz
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    ckpt_path, cfg = small_ckpt
    feat_path, n_rows = features_file
    eng = CallModsEngine(ckpt_path, cfg, CallConfig(device_batch=64))
    out = str(tmp_path / "calls.tsv")
    eng.run_features_file(feat_path, out, is_gzip=True)
    with gz.open(out + ".gz", "rt") as fh:
        lines = fh.read().splitlines()
    assert len(lines) == n_rows
    assert all(len(ln.split("\t")) == 10 for ln in lines)
