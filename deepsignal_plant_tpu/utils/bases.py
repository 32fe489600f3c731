"""Base/IUPAC alphabets and codecs.

Compatibility contract with the reference tables in
deepsignal_plant/utils/process_utils.py:16-47 (base pairing, base<->code
integer maps, IUPAC degenerate alphabets). The integer codes are part of the
on-disk feature format (k-mer column is re-encoded through them), so they must
match the reference exactly.
"""
from __future__ import annotations

import numpy as np

# Watson-Crick pairing plus IUPAC degenerate codes (DNA / RNA).
DNA_PAIRS = {
    "A": "T", "C": "G", "G": "C", "T": "A", "N": "N",
    "W": "W", "S": "S", "M": "K", "K": "M", "R": "Y",
    "Y": "R", "B": "V", "V": "B", "D": "H", "H": "D",
    "Z": "Z",
}
RNA_PAIRS = {
    "A": "U", "C": "G", "G": "C", "U": "A", "N": "N",
    "W": "W", "S": "S", "M": "K", "K": "M", "R": "Y",
    "Y": "R", "B": "V", "V": "B", "D": "H", "H": "D",
    "Z": "Z",
}

# base -> integer code (the model's embedding vocabulary; vocab_size 16).
BASE2CODE_DNA = {
    "A": 0, "C": 1, "G": 2, "T": 3, "N": 4,
    "W": 5, "S": 6, "M": 7, "K": 8, "R": 9,
    "Y": 10, "B": 11, "V": 12, "D": 13, "H": 14,
    "Z": 15,
}
CODE2BASE_DNA = {v: k for k, v in BASE2CODE_DNA.items()}
BASE2CODE_RNA = {
    "A": 0, "C": 1, "G": 2, "U": 3, "N": 4,
    "W": 5, "S": 6, "M": 7, "K": 8, "R": 9,
    "Y": 10, "B": 11, "V": 12, "D": 13, "H": 14,
    "Z": 15,
}
CODE2BASE_RNA = {v: k for k, v in BASE2CODE_RNA.items()}

# IUPAC degenerate letter -> concrete bases.
IUPAC_DNA = {
    "A": ["A"], "T": ["T"], "C": ["C"], "G": ["G"],
    "R": ["A", "G"], "M": ["A", "C"], "S": ["C", "G"],
    "Y": ["C", "T"], "K": ["G", "T"], "W": ["A", "T"],
    "B": ["C", "G", "T"], "D": ["A", "G", "T"],
    "H": ["A", "C", "T"], "V": ["A", "C", "G"],
    "N": ["A", "C", "G", "T"],
}
IUPAC_RNA = {
    "A": ["A"], "C": ["C"], "G": ["G"], "U": ["U"],
    "R": ["A", "G"], "M": ["A", "C"], "S": ["C", "G"],
    "Y": ["C", "U"], "K": ["G", "U"], "W": ["A", "U"],
    "B": ["C", "G", "U"], "D": ["A", "G", "U"],
    "H": ["A", "C", "U"], "V": ["A", "C", "G"],
    "N": ["A", "C", "G", "U"],
}

# Vectorized codec tables: ASCII byte -> code, for numpy batch encoding.
_ENCODE_LUT_DNA = np.full(256, BASE2CODE_DNA["N"], dtype=np.int32)
for _b, _c in BASE2CODE_DNA.items():
    _ENCODE_LUT_DNA[ord(_b)] = _c
_COMPLEMENT_LUT_DNA = np.arange(256, dtype=np.uint8)
for _b, _c in DNA_PAIRS.items():
    _COMPLEMENT_LUT_DNA[ord(_b)] = ord(_c)


def str2bool(v: str) -> bool:
    """Flag-string convention shared with the reference CLI
    (process_utils.py:54): yes/true/t/1 => True."""
    return str(v).lower() in ("yes", "true", "t", "1")


def complement_seq(seq: str, seq_type: str = "DNA") -> str:
    """Reverse-complement of ``seq``; unknown letters map to N.

    Parity: deepsignal_plant/utils/process_utils.py:65.
    """
    if seq_type == "DNA":
        pairs = DNA_PAIRS
    elif seq_type == "RNA":
        pairs = RNA_PAIRS
    else:
        raise ValueError("seq_type must be DNA or RNA")
    return "".join(pairs.get(ch, "N") for ch in reversed(seq))


def encode_kmer(kmer: str) -> list[int]:
    """Encode a k-mer string into integer codes (DNA alphabet)."""
    return [BASE2CODE_DNA[b] for b in kmer]


def decode_kmer(codes) -> str:
    """Decode integer codes back to a base string (DNA alphabet)."""
    return "".join(CODE2BASE_DNA[int(c)] for c in codes)


def seq_to_codes(seq: str) -> np.ndarray:
    """Vectorized encode: str -> int32 array using the DNA alphabet.

    Letters outside the alphabet encode as N's code, matching the
    embedding-vocabulary contract.
    """
    raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    return _ENCODE_LUT_DNA[raw]


def complement_codes_inplaceless(seq_bytes: np.ndarray) -> np.ndarray:
    """Vectorized complement over an ASCII uint8 array (no reversal)."""
    return _COMPLEMENT_LUT_DNA[seq_bytes]
