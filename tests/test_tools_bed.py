"""Tools coverage: bed-format freq splitting (genome lookup path), gzip
freq output, file_uid filtering."""
import gzip
import os

import numpy as np

from make_synthetic import write_fasta

from deepsignal_plant_tpu.cli import main as cli_main
from deepsignal_plant_tpu.tools.splitters import split_freq_file


def test_split_freq_bed_by_genome_lookup(tmp_path):
    # genome with a CG at 10(+), CHG at 20(+), CHH at 30(+)
    seq = list("A" * 50)
    seq[10:12] = "CG"
    seq[20:23] = "CAG"
    seq[30:33] = "CTT"
    genome = {"c1": "".join(seq)}
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)

    bed = tmp_path / "x.freq.bed"
    rows = []
    for pos in (10, 20, 30):
        rows.append("\t".join(["c1", str(pos), str(pos + 1), ".", "5", "+",
                               str(pos), str(pos + 1), "0,0,0", "5", "60"]))
    # reverse-strand CG partner of pos 10 is the C at pos 11 on '-'
    rows.append("\t".join(["c1", "11", "12", ".", "3", "-", "11", "12",
                           "0,0,0", "3", "40"]))
    bed.write_text("\n".join(rows) + "\n")

    total, fails = split_freq_file(str(bed), fasta)
    assert (total, fails) == (4, 0)
    base = str(tmp_path / "x")   # name scheme: x.<ctx>.freq.bed
    cg = open(base + ".CG.freq.bed").read().splitlines()
    chg = open(base + ".CHG.freq.bed").read().splitlines()
    chh = open(base + ".CHH.freq.bed").read().splitlines()
    assert len(cg) == 2 and len(chg) == 1 and len(chh) == 1
    assert {l.split("\t")[1] for l in cg} == {"10", "11"}
    assert chg[0].split("\t")[1] == "20"
    assert chh[0].split("\t")[1] == "30"


def _call_row(chrom, pos, p1, kmer="ACGCG"):
    return "\t".join([chrom, str(pos), "+", str(pos), "r1", "t",
                      str(round(1 - p1, 6)), str(round(p1, 6)),
                      str(int(p1 > 0.5)), kmer])


def test_call_freq_gzip_output_and_file_uid(tmp_path):
    d = tmp_path / "calls"
    d.mkdir()
    (d / "a.call_mods.tsv").write_text(
        "\n".join(_call_row("c1", i, 0.9) for i in range(5)) + "\n")
    (d / "b.call_mods.tsv").write_text(
        "\n".join(_call_row("c1", i, 0.9) for i in range(5)) + "\n")
    (d / "ignore.other.txt").write_text(_call_row("c2", 1, 0.9) + "\n")

    out = str(tmp_path / "freq.tsv")
    cli_main(["call_freq", "-i", str(d), "--file_uid", "call_mods",
              "-o", out, "--sort", "--gzip"])
    gz = out + ".gz"
    assert os.path.exists(gz)
    lines = gzip.open(gz, "rt").read().splitlines()
    assert len(lines) == 5               # c2 row filtered by file_uid
    w = lines[0].split("\t")
    assert w[0] == "c1" and int(w[8]) == 2   # coverage from both files


def test_gzip_features_input_to_call_mods(tmp_path, rng):
    import jax

    from make_synthetic import synth_feature_rows
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint

    rows = synth_feature_rows(rng, 2, 15)
    gz_feat = str(tmp_path / "f.tsv.gz")
    with gzip.open(gz_feat, "wt") as wf:
        wf.write("\n".join(rows) + "\n")
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(tmp_path / "m.ckpt.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(0), cfg), cfg)
    out = str(tmp_path / "calls.tsv")
    cli_main(["call_mods", "-i", gz_feat, "-m", ckpt, "-o", out,
              "--hid_rnn", "32", "--device_batch", "32"])
    assert len(open(out).read().splitlines()) == 30
