"""Tests for tools/GFF/fileio parity with the reference scripts."""
import os
import sys

import numpy as np
import pytest

from make_synthetic import synth_genome, write_fasta

from deepsignal_plant_tpu.tools.combiners import (combine_freq_files,
                                                  combine_strands_freq)
from deepsignal_plant_tpu.tools.evaluate import auroc
from deepsignal_plant_tpu.utils.gff import GFF3


def test_auroc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score
    y = rng.integers(0, 2, 500)
    s = rng.random(500)
    assert auroc(y, s) == pytest.approx(roc_auc_score(y, s), abs=1e-9)
    # with ties
    s_t = np.round(s, 1)
    assert auroc(y, s_t) == pytest.approx(roc_auc_score(y, s_t), abs=1e-9)
    assert auroc(np.ones(5), s[:5]) == 0.0  # single-class -> 0


def _freq_row(chrom, pos, strand, p0, p1, met, unmet, kmer="ACGCGTACGCGTA"):
    cov = met + unmet
    rmet = met / cov if cov else 0.0
    return "%s\t%d\t%s\t%d\t%.3f\t%.3f\t%d\t%d\t%d\t%.4f\t%s" % (
        chrom, pos, strand, pos, p0, p1, met, unmet, cov, rmet, kmer)


def test_combine_freq_files_sums(tmp_path):
    f1 = tmp_path / "a.freq.txt"
    f2 = tmp_path / "b.freq.txt"
    f1.write_text(_freq_row("c1", 10, "+", 1.2, 0.8, 1, 1) + "\n")
    f2.write_text(_freq_row("c1", 10, "+", 0.5, 1.5, 2, 0) + "\n")
    out = str(tmp_path / "comb.txt")
    combine_freq_files([str(f1), str(f2)], out, True, False)
    w = open(out).read().strip().split("\t")
    assert w[0] == "c1" and int(w[1]) == 10
    assert float(w[4]) == pytest.approx(1.7)   # prob0 sum
    assert int(w[6]) == 3 and int(w[7]) == 1 and int(w[8]) == 4
    assert float(w[9]) == pytest.approx(0.75)


def test_combine_strands_freq(tmp_path):
    # genome with one CpG at a known position
    genome = {"c1": "AATTCGAATT"}   # CG at pos 4 (fwd); rev C at pos 5
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    freq = tmp_path / "x.freq.txt"
    rows = [
        _freq_row("c1", 4, "+", 1.0, 1.0, 2, 0),   # fwd CpG: rmet 1.0
        _freq_row("c1", 5, "-", 1.0, 1.0, 1, 1),   # rev strand of same CpG
    ]
    freq.write_text("\n".join(rows) + "\n")
    out = combine_strands_freq(str(freq), fasta)
    w = open(out).read().strip().split("\t")
    # combined onto fwd pos 4: met 3, unmet 1, cov 4, rmet .75
    assert w[0] == "c1" and int(w[1]) == 4 and w[2] == "+"
    assert int(w[8]) == 4
    assert float(w[9]) == pytest.approx(0.75)


def test_gff3_transcript_mapping(tmp_path):
    gff = tmp_path / "x.gff3"
    gff.write_text("\n".join([
        "##gff-version 3",
        "c1\tsrc\tgene\t1\t100\t.\t+\t.\tID=gene:G1",
        "c1\tsrc\tmRNA\t1\t100\t.\t+\t.\tID=transcript:T1;Parent=gene:G1",
        "c1\tsrc\texon\t1\t10\t.\t+\t.\tParent=transcript:T1;rank=1",
        "c1\tsrc\texon\t21\t30\t.\t+\t.\tParent=transcript:T1;rank=2",
        "c1\tsrc\tmRNA\t1\t50\t.\t-\t.\tID=transcript:T2;Parent=gene:G1",
        "c1\tsrc\texon\t1\t10\t.\t-\t.\tParent=transcript:T2;rank=1",
    ]) + "\n")
    g = GFF3(str(gff))
    assert g.features == {"gene", "mRNA", "exon"}
    eid, tlen, chrom, strand, locs = \
        g.map_coordinates_transcript2genome("transcript:T1")
    assert eid == "T1" and tlen == 20 and chrom == "c1" and strand == "+"
    assert locs[:3] == [0, 1, 2] and locs[10:13] == [20, 21, 22]
    # minus strand: positions reversed
    _, _, _, strand2, locs2 = \
        g.map_coordinates_transcript2genome("transcript:T2")
    assert strand2 == "-" and locs2[0] == 9 and locs2[-1] == 0
    mapping = g.save_coordinates_mapping(str(tmp_path / "m.pkl"))
    assert set(mapping) == {"transcript:T1", "transcript:T2"}


def test_evaluate_calls_tool(tmp_path):
    from deepsignal_plant_tpu.tools.evaluate import evaluate_mods_call

    def call_row(chrom, pos, p1, label):
        return "\t".join([chrom, str(pos), "+", str(pos), "r1", "t",
                          str(round(1 - p1, 6)), str(round(p1, 6)),
                          str(label), "ACGCG"])

    rng = np.random.default_rng(0)
    meth = tmp_path / "meth.tsv"
    unmeth = tmp_path / "unmeth.tsv"
    meth.write_text("\n".join(
        call_row("c1", i, float(p), int(p > 0.5))
        for i, p in enumerate(rng.beta(5, 2, 200))) + "\n")
    unmeth.write_text("\n".join(
        call_row("c1", i, float(p), int(p > 0.5))
        for i, p in enumerate(rng.beta(2, 5, 200))) + "\n")
    out = str(tmp_path / "eval.tsv")
    evaluate_mods_call(str(meth), str(unmeth), out, seed=1)
    lines = open(out).read().splitlines()
    assert lines[0].startswith("tested_type\tprob_cf")
    assert len(lines) == 1 + 28 + 1   # header + prob_cf sweep + all_sites
    last = lines[-1].split("\t")
    assert last[0] == "all_sites"
    auc = float(last[14])
    assert 0.7 < auc <= 1.0
