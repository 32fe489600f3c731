"""Bit-exactness of the fused native per-read extraction kernel
(dsp_read_norm_stats) vs the numpy chain it replaces: normalize_signals
-> segment_stats -> build_signal_rect("even") + the packed wire's
round6+f16 casts (pipeline/extract.py:40-130; reference semantics
extract_features.py:179-190,232-251)."""
import numpy as np
import pytest

from deepsignal_plant_tpu.pipeline.extract import (
    build_signal_rect, normalize_signals, segment_stats)
from deepsignal_plant_tpu.utils.fastparse import (extract_norm_stats,
                                                  native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")


def _events(rng, ns, max_len=30):
    nb = int(rng.integers(1, max(2, ns // 8)))
    lens = rng.integers(1, max_len, nb).astype(np.int64)
    while lens.sum() > ns:
        nb = max(nb // 2, 1)
        lens = lens[:nb]
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    return starts, lens


def _assert_bitexact(sig, starts, lens, S=16):
    res = extract_norm_stats(sig, starts, lens, S)
    assert res is not None
    norm = normalize_signals(sig, "mad")
    means, stds = segment_stats(norm, starts, lens)
    rect = build_signal_rect(norm, starts, lens, S, "even")
    assert np.array_equal(res["norm"], norm)
    assert np.array_equal(res["means"], means)
    assert np.array_equal(res["stds"], stds)
    m16 = np.around(means, 6).astype(np.float16)
    s16 = np.around(stds, 6).astype(np.float16)
    assert np.array_equal(res["means16"].view(np.uint16),
                          m16.view(np.uint16))
    assert np.array_equal(res["stds16"].view(np.uint16),
                          s16.view(np.uint16))
    assert np.array_equal(res["lens16"].view(np.uint16),
                          lens.astype(np.float16).view(np.uint16))
    assert np.array_equal(res["rect16"].view(np.uint16),
                          rect.astype(np.float16).view(np.uint16))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_reads_bitexact(seed):
    rng = np.random.default_rng(seed)
    for _ in range(6):
        ns = int(rng.integers(50, 80000))
        sig = rng.normal(80, 12, ns) * float(rng.uniform(0.5, 2.0))
        starts, lens = _events(rng, ns)
        _assert_bitexact(sig, starts, lens)


def test_even_and_odd_signal_lengths():
    rng = np.random.default_rng(9)
    for ns in (100, 101, 4096, 4097):
        sig = rng.normal(0, 1, ns)
        starts, lens = _events(rng, ns, max_len=20)
        _assert_bitexact(sig, starts, lens)


def test_constant_signal_zero_scale():
    """MAD 0 -> the reference leaves the signal unscaled; still rounded."""
    sig = np.full(500, 3.2500001)
    starts = np.arange(0, 480, 12, dtype=np.int64)
    lens = np.full(len(starts), 12, dtype=np.int64)
    _assert_bitexact(sig, starts, lens)


def test_tie_heavy_signal():
    """Integer-valued signals stress median tie-breaking."""
    rng = np.random.default_rng(5)
    sig = np.round(rng.normal(100, 3, 30001))
    starts, lens = _events(rng, len(sig))
    _assert_bitexact(sig, starts, lens)


def test_long_events_downsampled():
    rng = np.random.default_rng(6)
    sig = rng.normal(0, 1, 20000)
    starts, lens = _events(rng, len(sig), max_len=120)
    _assert_bitexact(sig, starts, lens)


def test_corrupt_event_table_falls_back():
    rng = np.random.default_rng(7)
    sig = rng.normal(0, 1, 1000)
    starts = np.array([0, 500], dtype=np.int64)
    lens = np.array([100, 900], dtype=np.int64)     # overflows signal
    assert extract_norm_stats(sig, starts, lens, 16) is None
    lens = np.array([-5, 10], dtype=np.int64)       # negative length
    assert extract_norm_stats(sig, starts, lens, 16) is None
