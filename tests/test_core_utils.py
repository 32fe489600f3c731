"""Unit tests for the L0 core: codecs, motifs, fasta, region parsing."""
import numpy as np
import pytest

from deepsignal_plant_tpu.utils.bases import (
    BASE2CODE_DNA, complement_seq, decode_kmer, encode_kmer, seq_to_codes,
    str2bool)
from deepsignal_plant_tpu.utils.fasta import (
    DNAContig, DNAReference, get_contig2len, get_contig_names,
    is_genome_fasta)
from deepsignal_plant_tpu.utils.motifs import (
    expand_iupac_motif, expand_motifs, motif_locs_in_seq, parse_region)


def test_str2bool():
    for v in ("yes", "true", "t", "1", "Yes", "TRUE"):
        assert str2bool(v)
    for v in ("no", "false", "f", "0", "maybe"):
        assert not str2bool(v)


def test_complement_seq():
    assert complement_seq("ACGT") == "ACGT"
    assert complement_seq("AACG") == "CGTT"
    assert complement_seq("ACGN") == "NCGT"
    assert complement_seq("ACGU", "RNA") == "ACGU"


def test_encode_decode_kmer():
    km = "ACGTNWSMKRYBVDHZ"
    codes = encode_kmer(km)
    assert codes == list(range(16))
    assert decode_kmer(codes) == km
    np.testing.assert_array_equal(seq_to_codes(km), np.arange(16))


def test_expand_motifs_chg_chh():
    # CHG: H = A/C/T -> 3 seqs with G fixed
    chg = set(expand_motifs("CHG"))
    assert chg == {"CAG", "CCG", "CTG"}
    chh = set(expand_motifs("CHH"))
    assert len(chh) == 9
    assert all(m[0] == "C" and m[1] in "ACT" and m[2] in "ACT" for m in chh)
    # multi-motif comma string
    both = expand_motifs("CG,CHG")
    assert set(both) == {"CG", "CAG", "CCG", "CTG"}


def test_expand_motifs_matches_reference(reference_importable):
    from deepsignal_plant.utils.process_utils import get_motif_seqs
    for motifs in ("CG", "CHG", "CHH", "C", "CG,CHG,CHH", "GATC"):
        assert set(expand_motifs(motifs)) == set(get_motif_seqs(motifs))


def test_motif_scan():
    seq = "ACGCGTTACG"
    assert motif_locs_in_seq(seq, ["CG"], 0) == [1, 3, 8]
    assert motif_locs_in_seq(seq, ["CG"], 1) == [2, 4, 9]
    # multiple motifs of same length
    assert motif_locs_in_seq("CAGCCGCTG", ["CAG", "CCG", "CTG"], 0) == [0, 3, 6]
    assert motif_locs_in_seq("AC", ["CG"], 0) == []
    assert motif_locs_in_seq("", ["CG"], 0) == []


def test_motif_scan_matches_reference(reference_importable, rng):
    from deepsignal_plant.utils.process_utils import (
        get_refloc_of_methysite_in_motif)
    seq = "".join(rng.choice(list("ACGT"), size=2000))
    for motifs in ({"CG"}, {"CAG", "CCG", "CTG"},
                   set(expand_motifs("CHH"))):
        ours = motif_locs_in_seq(seq, motifs, 0)
        theirs = get_refloc_of_methysite_in_motif(seq, motifs, 0)
        assert ours == theirs


def test_parse_region():
    assert parse_region(None) == (None, None, None)
    assert parse_region("chr1") == ("chr1", None, None)
    assert parse_region("chr1:100") == ("chr1", 100, None)
    assert parse_region("chr1:0-10000") == ("chr1", 0, 10000)
    with pytest.raises(ValueError):
        parse_region("chr1:a-b")


def test_fasta_roundtrip(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1 some desc\nACGTacgt\nCCGG\n>chr2\nTTTT\n")
    ref = DNAReference(str(fa))
    assert ref.getcontignames() == ["chr1", "chr2"]
    assert ref.getcontigs()["chr1"] == "ACGTACGTCCGG"
    assert get_contig2len(str(fa)) == {"chr1": 12, "chr2": 4}
    assert get_contig_names(str(fa)) == ["chr1", "chr2"]
    assert is_genome_fasta(str(fa))

    contig = DNAContig("chr1", ref.getcontigs()["chr1"])
    assert contig.getlen() == 12
    assert contig.getcomplementseq() == complement_seq("ACGTACGTCCGG")
    assert contig.get_seq_CpG_sites() == motif_locs_in_seq("ACGTACGTCCGG",
                                                           ["CG"], 0)


def test_fasta_matches_reference(reference_importable, tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">c1 x\nACGT\nGGCC\n>c2\nTATA\n")
    from deepsignal_plant.utils.ref_reader import DNAReference as RefDNARef
    theirs = RefDNARef(str(fa))
    ours = DNAReference(str(fa))
    assert ours.getcontigs() == theirs.getcontigs()
    assert ours.getcontignames() == theirs.getcontignames()
