"""Robustness fuzzing of the native C++ features parser: malformed input
must raise ValueError (or parse), never crash the process."""
import numpy as np
import pytest

from make_synthetic import synth_feature_rows

from deepsignal_plant_tpu.native import build_native
from deepsignal_plant_tpu.utils.fastparse import parse_feature_bytes


@pytest.fixture(scope="module", autouse=True)
def native():
    assert build_native()


def _try(block: bytes):
    try:
        fb = parse_feature_bytes(block)
        assert fb is not None
        return "ok", len(fb)
    except ValueError:
        return "rejected", 0


def test_truncations_never_crash(rng):
    rows = synth_feature_rows(rng, 2, 5)
    good = ("\n".join(rows) + "\n").encode()
    for cut in range(0, len(good), 97):
        _try(good[:cut])                      # every prefix
    # truncation without trailing newline
    _try(good[:-1])
    _try(good[: len(good) // 2])


def test_mutations_never_crash(rng):
    rows = synth_feature_rows(rng, 2, 5)
    good = ("\n".join(rows) + "\n").encode()
    r = np.random.default_rng(0)
    for _ in range(300):
        buf = bytearray(good)
        for _k in range(int(r.integers(1, 6))):
            pos = int(r.integers(0, len(buf)))
            buf[pos] = int(r.integers(0, 256))
        _try(bytes(buf))


def test_structured_garbage_never_crash():
    cases = [
        b"\n\n\n",
        b"\t\t\t\t\t\t\t\t\t\t\t\n",
        b"a\tb\tc\td\te\tf\tACGTACGTACGTA\t1\t1\t1\t1\t1\n",
        b"x" * 10_000 + b"\n",
        b"c\t1\t+\t1\tr\tt\t" + b"A" * 1000 + b"\t1,2\t3\t4\t5\t6\n",
        b"c\t1\t+\t1\tr\tt\tACGTACGTACGTA\t" + b"1," * 500 + b"1\t"
        + b"1," * 12 + b"1\t" + b"1," * 12 + b"1\t"
        + (b";".join([b",".join([b"1"] * 16)] * 13)) + b"\t1\n",
        "ü\t1\t+\t1\tr\tt\tACGTACGTACGTA\tx\n".encode(),
    ]
    for c in cases:
        _try(c)


def test_formatter_extreme_values():
    from deepsignal_plant_tpu.utils.fastparse import (format_call_block,
                                                      format_feature_cols)
    si = ["c\t1\t+\t1\tr\tt"] * 4
    probs = np.array([[np.float32(1e-30), 1.0], [1.0, np.float32(1e-30)],
                      [np.float32(3e38), np.float32(3e38)],
                      [0.5, 0.5]], np.float32)
    kmer = np.tile(np.arange(13, dtype=np.int32), (4, 1))
    block = format_call_block(si, probs, kmer)
    assert block.count("\n") == 4
    # huge / non-finite magnitudes in feature cols don't crash or overflow
    # the output buffer (values out of domain; %g fallback path)
    means = np.array([[1e300, -1e300, np.inf, -np.inf, np.nan, 1e10]
                      + [0.0] * 7], np.float64)
    rect = np.full((1, 13, 16), 1e300, np.float64)
    out = format_feature_cols(means, np.abs(means),
                              np.ones((1, 13), np.int32), rect)
    assert out is not None and len(out) == 1
    assert "inf" in out[0] and "nan" in out[0]


def _try_pack(block: bytes):
    """parse -> repack -> verify window equality; malformed input must be
    rejected by the parser, never crash the packer."""
    from deepsignal_plant_tpu.utils.fastparse import (pack_raw_block,
                                                      parse_raw_feature_block)
    try:
        rb = parse_raw_feature_block(block)
    except ValueError:
        return "rejected"
    pb = pack_raw_block(rb)
    assert pb.n == rb.n
    if pb.n:
        win = pb.window_index()
        np.testing.assert_array_equal(pb.codes[win], rb.kmer)
        np.testing.assert_array_equal(pb.means[win], rb.means)
        np.testing.assert_array_equal(pb.stds[win], rb.stds)
        np.testing.assert_array_equal(pb.lens[win], rb.slens)
        np.testing.assert_array_equal(pb.rect[win], rb.signals)
        assert np.all(np.diff(pb.centers) >= 0)
    return "ok"


def test_pack_rows_fuzz_mutations():
    """Random byte mutations of valid read-structured rows: dsp_pack_rows
    must never crash, and every surviving parse must repack to EXACTLY
    the same windows (the byte-verified dedup guarantee)."""
    from deepsignal_plant_tpu.pipeline.extract import features_to_rows
    # read-structured rows (real overlap) so mutations hit live dedup
    # comparisons, not just fresh segments
    base = "ACGT"
    r = np.random.default_rng(11)
    L = 200
    locs = np.flatnonzero(r.random(L) < 0.3)
    locs = locs[(locs >= 6) & (locs < L - 6)]
    feats = {
        "chrom": "chr1", "strand": "+", "readname": "rd0",
        "read_strand": "t", "pos": locs + 50, "pos_in_strand": locs + 50,
        "locs": locs, "kmer_len": 13,
        "seq": "".join(base[i] for i in r.integers(0, 4, L)),
        "r_means": np.around(r.normal(size=L), 6),
        "r_stds": np.around(np.abs(r.normal(size=L)), 6),
        "r_lens": r.integers(1, 30, L).astype(np.int32),
        "r_rect": r.normal(size=(L, 16)).astype(np.float32),
        "label": 0,
    }
    good = ("\n".join(features_to_rows(feats)) + "\n").encode()
    assert _try_pack(good) == "ok"
    for _ in range(200):
        buf = bytearray(good)
        for _k in range(int(r.integers(1, 6))):
            buf[int(r.integers(0, len(buf)))] = int(r.integers(0, 256))
        _try_pack(bytes(buf))
    for cut in range(0, len(good), 311):      # truncations
        _try_pack(good[:cut])
