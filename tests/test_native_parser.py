"""Native C++ features parser: build, parity with the Python codec, errors."""
import numpy as np
import pytest

from make_synthetic import synth_feature_rows

from deepsignal_plant_tpu.native import build_native, get_native_lib
from deepsignal_plant_tpu.utils.fastparse import parse_feature_bytes
from deepsignal_plant_tpu.utils.formats import parse_feature_lines


@pytest.fixture(scope="module")
def native_lib():
    assert build_native(), "g++ build of featparse.cpp failed"
    lib = get_native_lib()
    assert lib is not None
    return lib


def test_native_matches_python_codec(native_lib):
    rng = np.random.default_rng(8)
    rows = synth_feature_rows(rng, n_reads=4, sites_per_read=10)
    block = ("\n".join(rows) + "\n").encode()
    fb_native = parse_feature_bytes(block, with_read_ids=True)
    fb_py = parse_feature_lines([r + "\n" for r in rows])
    assert fb_native.sampleinfo == fb_py.sampleinfo
    assert fb_native.read_ids == fb_py.read_ids
    np.testing.assert_array_equal(fb_native.kmer, fb_py.kmer)
    np.testing.assert_array_equal(fb_native.labels, fb_py.labels)
    for field in ("base_means", "base_stds", "base_signal_lens", "signals"):
        np.testing.assert_allclose(getattr(fb_native, field),
                                   getattr(fb_py, field), rtol=0, atol=0)


def test_native_handles_negative_and_sci_floats(native_lib):
    row = "\t".join([
        "chr1", "5", "+", "5", "r1", "t", "ACGTACGTACGTA",
        ",".join(["-1.5e-3"] * 13), ",".join(["0.125"] * 13),
        ",".join(["7"] * 13),
        ";".join([",".join(["-0.5"] * 16)] * 13), "0"]) + "\n"
    fb = parse_feature_bytes(row.encode())
    assert len(fb) == 1
    np.testing.assert_allclose(fb.base_means[0], -1.5e-3, rtol=1e-7)
    np.testing.assert_allclose(fb.signals[0], -0.5)
    assert fb.labels[0] == 0


def test_native_malformed_row_raises(native_lib):
    with pytest.raises(ValueError, match="line 0"):
        parse_feature_bytes(b"chr1\tbadrow\n")


def test_native_empty_block(native_lib):
    fb = parse_feature_bytes(b"")
    assert len(fb) == 0
