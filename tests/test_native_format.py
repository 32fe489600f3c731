"""Native call-row formatter parity with the Python formatter."""
import numpy as np
import pytest

from deepsignal_plant_tpu.native import build_native
from deepsignal_plant_tpu.utils.bases import CODE2BASE_DNA
from deepsignal_plant_tpu.utils.fastparse import format_call_block
from deepsignal_plant_tpu.utils.formats import format_call_rows


@pytest.fixture(scope="module", autouse=True)
def native():
    assert build_native(force=True)


def _cases(rng, n):
    kmer = rng.integers(0, 16, size=(n, 13)).astype(np.int32)
    p1 = rng.random(n).astype(np.float32)
    probs = np.stack([1 - p1, p1], axis=1)
    sampleinfo = [f"chr1\t{i}\t+\t{i}\tr{i}\tt" for i in range(n)]
    return sampleinfo, probs, kmer


def test_native_format_matches_python(rng):
    sampleinfo, probs, kmer = _cases(rng, 500)
    kmer_strs = ["".join(CODE2BASE_DNA[int(c)] for c in row) for row in kmer]
    py_rows = format_call_rows(sampleinfo, kmer, probs[:, 0], probs[:, 1],
                               kmer_strs)
    block = format_call_block(sampleinfo, probs, kmer)
    assert block is not None
    native_rows = block.splitlines()
    assert len(native_rows) == len(py_rows)
    mismatches = [i for i, (a, b) in enumerate(zip(native_rows, py_rows))
                  if a != b]
    # sub-ulp .5e-6 rounding boundaries may differ; must be essentially none
    assert len(mismatches) == 0, \
        f"{len(mismatches)} mismatches, first: " \
        f"{native_rows[mismatches[0]]!r} vs {py_rows[mismatches[0]]!r}"


def test_native_feature_cols_match_python(rng):
    """Feature-column formatter == np.around+str, incl. -0.0 and the
    scientific-notation switch below 1e-4."""
    from deepsignal_plant_tpu.utils.fastparse import format_feature_cols
    n, L, S = 2000, 13, 16
    means = rng.normal(0, 2, (n, L))
    means[1] = rng.uniform(-1e-4, 1e-4, L)
    means[2] = [0.0, -0.0, 4.1e-5, -4.1e-5, 1e-6, -1e-6, 9.9e-5, 5e-6,
                0.0001, -0.0001, 99e-6, 2.0, -2.0]
    stds = np.abs(rng.normal(0, 1, (n, L)))
    stds[3] = np.abs(np.asarray(means[2]))
    lens = rng.integers(1, 100, (n, L)).astype(np.int32)
    rect = np.around(rng.normal(0, 3, (n, L, S)), 6)
    rect[4, 0, :13] = means[2]
    cols = format_feature_cols(means, stds, lens, rect)
    assert cols is not None

    def py_cols(i):
        m = ",".join(str(x) for x in np.around(means[i], 6).tolist())
        s = ",".join(str(x) for x in np.around(stds[i], 6).tolist())
        l = ",".join(str(int(x)) for x in lens[i])
        r = ";".join(",".join(str(y) for y in row)
                     for row in np.around(rect[i], 6).tolist())
        return "\t".join([m, s, l, r])

    assert sum(cols[i] != py_cols(i) for i in range(n)) == 0


def test_native_format_tiny_probs(rng):
    """Probabilities below 1e-4 print in Python's scientific notation."""
    from deepsignal_plant_tpu.utils.fastparse import format_call_block
    si = ["c\t1\t+\t1\tr\tt"] * 8
    p1 = np.array([0.9999995, 0.999999, 1 - 4.1e-5, 1 - 1e-6, 0.5,
                   4.1e-5, 1e-6, 0.9999], np.float32)
    probs = np.stack([1 - p1, p1], axis=1)
    kmer = np.tile(np.arange(13, dtype=np.int32), (8, 1))
    ks = ["".join(CODE2BASE_DNA[int(c)] for c in row) for row in kmer]
    py_rows = format_call_rows(si, kmer, probs[:, 0], probs[:, 1], ks)
    nat_rows = format_call_block(si, probs, kmer).splitlines()
    assert nat_rows == py_rows


def test_native_format_edge_probs():
    sampleinfo = ["c\t1\t+\t1\tr\tt"] * 6
    probs = np.array([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5],
                      [0.25, 0.75], [1e-7, 1 - 1e-7],
                      [0.9999995, 0.0000005]], np.float32)
    kmer = np.tile(np.arange(13, dtype=np.int32), (6, 1))
    block = format_call_block(sampleinfo, probs, kmer)
    rows = [r.split("\t") for r in block.splitlines()]
    assert rows[0][6] == "1.0" and rows[0][7] == "0.0" and rows[0][8] == "0"
    assert rows[1][6] == "0.0" and rows[1][7] == "1.0" and rows[1][8] == "1"
    assert rows[2][6] == "0.5" and rows[2][8] == "0"   # tie -> label 0
    assert rows[3][6] == "0.25" and rows[3][7] == "0.75"
    # center 5-mer of codes 0..12 -> indices 4..8 -> N W S M K
    assert rows[0][9] == "NWSMK"


def test_native_info_rows_match_python(rng):
    from deepsignal_plant_tpu.utils.fastparse import format_info_rows

    pos = np.concatenate([rng.integers(0, 2**40, 200),
                          np.array([0, 1, 10, 99, 2**62])]).astype(np.int64)
    pis = np.concatenate([rng.integers(-1, 2**31, 200),
                          np.array([-1, 0, 7, 123456789, 2**40])]
                         ).astype(np.int64)
    out = format_info_rows("scaffold_12|x", "-", "read/with:chars", "c",
                           pos, pis)
    assert out is not None, "native library must be present in CI"
    blob, lens = out
    rows, off = [], 0
    for L in lens:
        rows.append(blob[off:off + int(L)])
        off += int(L)
    expect = ["\t".join(["scaffold_12|x", str(int(pos[i])), "-",
                         str(int(pis[i])), "read/with:chars", "c"]).encode()
              for i in range(len(pos))]
    assert rows == expect


def test_native_rect_f16_matches_numpy(rng):
    from deepsignal_plant_tpu.pipeline.extract import build_signal_rect
    from deepsignal_plant_tpu.utils.fastparse import build_rect_f16

    norm = np.around(rng.normal(size=20000), 6)
    # lengths spanning every regime: 0 (empty), short (pad), == S, long
    lengths = np.concatenate([[0, 1, 2, 15, 16, 17, 40],
                              rng.integers(0, 60, 300)]).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths[:-1])]).astype(np.int64)
    assert starts[-1] + lengths[-1] <= len(norm)

    native = build_rect_f16(norm, starts, lengths, 16)
    assert native is not None, "native library must be present in CI"
    ref = build_signal_rect(norm, starts, lengths, 16,
                            "even").astype(np.float16)
    assert native.dtype == np.float16
    np.testing.assert_array_equal(native.view(np.uint16),
                                  ref.view(np.uint16))


def test_native_rect_f16_rejects_corrupt_event_tables(rng):
    """Corrupt event tables (negative lengths, segments past the signal)
    must return None — falling back to the clipping numpy path — never
    read/write out of bounds."""
    from deepsignal_plant_tpu.utils.fastparse import build_rect_f16

    norm = np.around(rng.normal(size=100), 6)
    # segment runs past the signal end
    assert build_rect_f16(norm, np.array([90], np.int64),
                          np.array([20], np.int64), 16) is None
    # negative length (would make pad exceed S and corrupt the heap)
    assert build_rect_f16(norm, np.array([10], np.int64),
                          np.array([-4], np.int64), 16) is None
    # negative start
    assert build_rect_f16(norm, np.array([-1], np.int64),
                          np.array([4], np.int64), 16) is None
    # boundary case exactly at the end stays native
    out = build_rect_f16(norm, np.array([84], np.int64),
                         np.array([16], np.int64), 16)
    assert out is not None and out.shape == (1, 16)
