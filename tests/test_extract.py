"""Feature-extraction tests: unit-level (normalization, signal rect,
segment stats) and a golden end-to-end comparison against the reference
extractor on synthetic fast5s (with a stub statsmodels so the reference
module imports in this environment)."""
import os
import random
import sys
import types

import numpy as np
import pytest

from make_synthetic import synth_fast5_dir, synth_genome, write_fasta

from deepsignal_plant_tpu.io.fast5 import read_tombo_fast5, write_tombo_fast5
from deepsignal_plant_tpu.pipeline.extract import (
    ExtractContext, ExtractOptions, build_signal_rect, extract_features,
    extract_read_features, features_to_rows, normalize_signals,
    segment_stats)


@pytest.fixture(scope="module")
def fast5_env(tmp_path_factory):
    rng = np.random.default_rng(5)
    genome = synth_genome(rng, {"chr1": 3000, "chr2": 2000})
    d = tmp_path_factory.mktemp("f5")
    fasta = write_fasta(str(d / "ref.fa"), genome)
    f5dir = str(d / "fast5s")
    n = synth_fast5_dir(f5dir, genome, rng, n_reads=6, read_len=150)
    return f5dir, fasta, genome, n


def _stub_statsmodels():
    """statsmodels.robust.mad replacement (Gaussian c) for importing the
    reference extractor as an oracle."""
    if "statsmodels" in sys.modules:
        return
    sm = types.ModuleType("statsmodels")
    robust = types.ModuleType("statsmodels.robust")

    def mad(a, c=0.6744897501960817, axis=0):
        a = np.asarray(a)
        med = np.median(a, axis=axis)
        return np.median(np.abs(a - med), axis=axis) / c

    robust.mad = mad
    sm.robust = robust
    sys.modules["statsmodels"] = sm
    sys.modules["statsmodels.robust"] = robust


def test_normalize_matches_reference_mad():
    _stub_statsmodels()
    rng = np.random.default_rng(0)
    x = rng.normal(100, 15, size=500)
    norm = normalize_signals(x, "mad")
    med = np.median(x)
    mad = np.median(np.abs(x - med)) / 0.6744897501960817
    expected = np.around((x - med) / mad, 6)
    np.testing.assert_array_equal(norm, expected)
    # zscore
    norm_z = normalize_signals(x, "zscore")
    expected_z = np.around((x - np.mean(x)) / np.std(x), 6)
    np.testing.assert_array_equal(norm_z, expected_z)
    # constant signal: unchanged
    const = np.full(10, 5.0)
    np.testing.assert_array_equal(normalize_signals(const, "mad"), const)


def test_segment_stats_matches_per_segment_numpy():
    rng = np.random.default_rng(1)
    norm = np.around(rng.normal(size=300), 6)
    lengths = rng.integers(1, 20, size=25)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    means, stds = segment_stats(norm, starts, lengths)
    for i in range(len(starts)):
        seg = norm[starts[i]:starts[i] + lengths[i]]
        assert means[i] == pytest.approx(np.mean(seg), abs=1e-9)
        assert stds[i] == pytest.approx(np.std(seg), abs=1e-9)


def test_signal_rect_padding_and_downsample():
    norm = np.arange(100, dtype=float)
    # short base: center zero-pad (reference extract_features.py:243-246)
    starts = np.array([10])
    lengths = np.array([5])
    rect = build_signal_rect(norm, starts, lengths, 16)
    pad_left = (16 - 5) // 2
    assert (rect[0][:pad_left] == 0).all()
    np.testing.assert_array_equal(rect[0][pad_left:pad_left + 5],
                                  norm[10:15])
    assert (rect[0][pad_left + 5:] == 0).all()
    # exact fit
    rect = build_signal_rect(norm, np.array([20]), np.array([16]), 16)
    np.testing.assert_array_equal(rect[0], norm[20:36])
    # long base, even mode: order-preserving strictly increasing picks
    rect = build_signal_rect(norm, np.array([0]), np.array([40]), 16)
    assert (np.diff(rect[0]) > 0).all()
    assert rect[0][0] == 0.0 and rect[0][-1] <= 39
    # compat mode: sorted random picks from the segment
    rng = random.Random(3)
    rect = build_signal_rect(norm, np.array([50]), np.array([40]), 16,
                             downsample="compat", rng=rng)
    assert (np.diff(rect[0]) > 0).all()
    assert rect[0].min() >= 50 and rect[0].max() < 90


def test_fast5_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    raw = rng.integers(300, 700, size=100).astype(np.int16)
    lens = np.array([10] * 10)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    p = str(tmp_path / "x.fast5")
    write_tombo_fast5(p, "readX", raw, "ACGTACGTAC", starts, lens, "chr1",
                      42, "+")
    read = read_tombo_fast5(p)
    assert read.readname == "readX"
    assert read.chrom == "chr1" and read.chrom_start == 42
    assert read.seq == "ACGTACGTAC"
    assert read.alignstrand == "+" and read.read_strand == "t"
    scaling = 1465.0 / 8192.0
    np.testing.assert_allclose(read.raw_signal,
                               scaling * (raw.astype(float) + 10.0))


def test_extract_golden_vs_reference(reference_importable, fast5_env,
                                     tmp_path):
    """Byte-identical feature rows vs the reference extractor on fast5s with
    no long bases (no random downsampling => both deterministic)."""
    _stub_statsmodels()
    f5dir, fasta, genome, _n = fast5_env
    from deepsignal_plant.extract_features import _extract_features
    from deepsignal_plant.extract_features import _features_to_str
    from deepsignal_plant.utils.process_utils import get_motif_seqs
    from deepsignal_plant.utils.ref_reader import get_contig2len as ref_c2l

    fast5s = sorted(os.path.join(f5dir, f) for f in os.listdir(f5dir))
    motifs = get_motif_seqs("C", True)  # C = CG+CHG+CHH superset
    chrom2len = ref_c2l(fasta)
    ref_feats, ref_err = _extract_features(
        fast5s, "RawGenomeCorrected_000", "BaseCalled_template", "mad",
        motifs, 0, chrom2len, 13, 16, 1, None, (None, None, None))
    ref_rows = [_features_to_str(f) for f in ref_feats]
    assert ref_err == 0 and len(ref_rows) > 0

    # compat mode: byte-identical rows (exact np.mean/np.std numerics)
    opts = ExtractOptions(motifs="C", kmer_len=13, signal_len=16,
                          reference_path=fasta, downsample="compat")
    ctx = ExtractContext.build(opts)
    our_rows = []
    for p in fast5s:
        read = read_tombo_fast5(p)
        feats = extract_read_features(read, ctx)
        if feats is not None:
            our_rows.extend(features_to_rows(feats))
    assert our_rows == ref_rows

    # fast (vectorized-stats) mode: numerically equal within 6dp rounding
    ctx_fast = ExtractContext.build(
        ExtractOptions(motifs="C", reference_path=fasta))
    fast_rows = []
    for p in fast5s:
        feats = extract_read_features(read_tombo_fast5(p), ctx_fast)
        if feats is not None:
            fast_rows.extend(features_to_rows(feats))
    assert len(fast_rows) == len(ref_rows)
    for ours, ref in zip(fast_rows, ref_rows):
        wo, wr = ours.split("\t"), ref.split("\t")
        assert wo[:7] == wr[:7] and wo[9] == wr[9] and wo[11] == wr[11]
        for col in (7, 8, 10):
            a = np.array(wo[col].replace(";", ",").split(","), float)
            b = np.array(wr[col].replace(";", ",").split(","), float)
            np.testing.assert_allclose(a, b, atol=1.1e-6)


def test_extract_pipeline_to_file(fast5_env, tmp_path):
    f5dir, fasta, _g, n = fast5_env
    opts = ExtractOptions(motifs="CG", reference_path=fasta)
    ctx = ExtractContext.build(opts)
    out = str(tmp_path / "features.tsv")
    total, errors = extract_features(f5dir, True, ctx, out, nproc=2,
                                     f5_batch_size=2)
    assert total == n and errors == 0
    lines = open(out).read().splitlines()
    assert len(lines) > 0
    for ln in lines:
        w = ln.split("\t")
        assert len(w) == 12
        assert w[6][6] == "C"  # CG motif centered
        assert len(w[7].split(",")) == 13
        assert len(w[10].split(";")) == 13


def test_extract_region_and_positions_filters(fast5_env, tmp_path):
    f5dir, fasta, _g, _n = fast5_env
    base_opts = dict(motifs="CG", reference_path=fasta)
    ctx_all = ExtractContext.build(ExtractOptions(**base_opts))
    rows_all = []
    fast5s = sorted(os.path.join(f5dir, f) for f in os.listdir(f5dir))
    for p in fast5s:
        read = read_tombo_fast5(p)
        f = extract_read_features(read, ctx_all)
        if f is not None:
            rows_all.extend(features_to_rows(f))

    # region filter: chr1 only
    ctx_r = ExtractContext.build(ExtractOptions(region="chr1", **base_opts))
    rows_r = []
    for p in fast5s:
        read = read_tombo_fast5(p)
        f = extract_read_features(read, ctx_r)
        if f is not None:
            rows_r.extend(features_to_rows(f))
    assert 0 < len(rows_r) < len(rows_all)
    assert all(r.split("\t")[0] == "chr1" for r in rows_r)

    # positions filter: keep only first two sites
    first = [rows_all[0].split("\t"), rows_all[1].split("\t")]
    posfile = str(tmp_path / "pos.tsv")
    with open(posfile, "w") as wf:
        for w in first:
            wf.write("\t".join([w[0], w[1], w[2]]) + "\n")
    ctx_p = ExtractContext.build(ExtractOptions(positions=posfile,
                                                **base_opts))
    rows_p = []
    for p in fast5s:
        read = read_tombo_fast5(p)
        f = extract_read_features(read, ctx_p)
        if f is not None:
            rows_p.extend(features_to_rows(f))
    keys = {(w[0], w[1], w[2]) for w in
            (r.split("\t") for r in rows_p)}
    want = {(w[0], w[1], w[2]) for w in first}
    assert keys == want


def test_position_index_matches_key_set(tmp_path):
    """PositionIndex.mask == per-site string-key membership (the reference
    filter, extract_features.py:352-355) on random queries."""
    import numpy as np
    from deepsignal_plant_tpu.utils.motifs import (KEY_SEP, PositionIndex,
                                                   read_position_file)
    rng = np.random.default_rng(5)
    pf = str(tmp_path / "pos.tsv")
    with open(pf, "w") as f:
        for _ in range(500):
            chrom = f"chr{rng.integers(1, 4)}"
            strand = "+" if rng.random() < 0.5 else "-"
            f.write(f"{chrom}\t{int(rng.integers(0, 1000))}\t{strand}\n")
    idx = PositionIndex(pf)
    keys = read_position_file(pf)
    for chrom in ("chr1", "chr2", "chr3", "chrX"):
        for strand in ("+", "-"):
            q = rng.integers(0, 1100, size=300)
            got = idx.mask(chrom, strand, q)
            want = np.array([KEY_SEP.join([chrom, str(int(p)), strand])
                             in keys for p in q])
            assert (got == want).all()
