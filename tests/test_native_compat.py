"""Native compat-mode extraction (VERDICT r3 item 6): the C kernels must
be BYTE/BIT-identical to the Python reference-numerics chain —
pairwise-sum per-event mean/std (np.mean/np.std order), CPython-
compatible MT19937 sampling (random.Random.sample), and the compat
signal rect — so real-data byte-parity validation no longer crawls
through per-event Python."""
import random

import numpy as np
import pytest

from deepsignal_plant_tpu.pipeline.extract import (build_signal_rect,
                                                   normalize_signals,
                                                   segment_stats_exact)
from deepsignal_plant_tpu.utils.fastparse import (build_rect_compat,
                                                  compat_sampler,
                                                  native_available,
                                                  normalize_mad_native,
                                                  segment_stats_exact_native)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")


def _random_events(rng, n_events, max_len=40, long_frac=0.4):
    lens = np.where(rng.random(n_events) < long_frac,
                    rng.integers(17, max_len, n_events),
                    rng.integers(1, 17, n_events)).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    total = int(lens.sum())
    return starts, lens, total


def test_pairwise_stats_bitexact_fuzz():
    """dsp_segment_stats_exact == per-event np.mean/np.std for every
    segment length 1..3000 (numpy's pairwise-summation order, incl. the
    8-unrolled block and the >128 halving recursion)."""
    rng = np.random.default_rng(7)
    lens = np.array(list(range(1, 260)) + [300, 511, 512, 513, 1000,
                                           2048, 3000], np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    norm = np.around(rng.standard_normal(int(lens.sum())) * 3, 6)
    got = segment_stats_exact_native(norm, starts, lens)
    assert got is not None
    means, stds = got
    ref_m, ref_s = segment_stats_exact(norm, starts, lens)
    # segment_stats_exact is itself the loop of np.mean/np.std — assert
    # both against numpy directly for a few rows too
    for i in (0, 5, 100, len(lens) - 1):
        seg = norm[starts[i]:starts[i] + lens[i]]
        assert means[i] == np.mean(seg)
        assert stds[i] == np.std(seg)
    np.testing.assert_array_equal(means, ref_m)
    np.testing.assert_array_equal(stds, ref_s)


def test_normalize_mad_native_bitexact():
    rng = np.random.default_rng(11)
    for ns in (1, 2, 7, 100, 5001):
        sig = rng.normal(500, 40, ns)
        got = normalize_mad_native(sig)
        np.testing.assert_array_equal(got, normalize_signals(sig, "mad"))
    # zero-MAD signal (constant): the scale==0 branch
    sig = np.full(64, 3.25)
    np.testing.assert_array_equal(normalize_mad_native(sig),
                                  normalize_signals(sig, "mad"))


def test_mt_sampler_matches_cpython_fuzz():
    """CompatSampler consumes the SAME MT19937 stream as random.Random:
    same seeds -> same sample() picks, across both CPython sample
    algorithms (pool-swap n<=setsize, rejection set n>setsize), k edge
    cases, and long interleaved sequences."""
    for seed in (0, 1, 1234, 2**31 - 1, 2**40 + 7, 2**96 + 12345,
                 1234 * 1_000_003 + 17):
        s = compat_sampler(seed)
        r = random.Random(seed)
        seq = np.random.default_rng(abs(seed) % 2**32)
        for _ in range(200):
            n = int(seq.integers(1, 400))
            k = int(seq.integers(1, min(n, 20) + 1))
            assert s.sample(range(n), k) == sorted(r.sample(range(n), k)), \
                (seed, n, k)


def test_rect_compat_bitexact_fuzz():
    """dsp_rect_compat == build_signal_rect("compat", random.Random) for
    the same seed — short-row center padding AND long-row sorted picks,
    with the stream consumed in ascending row order."""
    rng = np.random.default_rng(23)
    for trial in range(10):
        starts, lens, total = _random_events(rng, 200)
        norm = np.around(rng.standard_normal(total), 6)
        seed = int(rng.integers(0, 2**62))
        want = build_signal_rect(norm, starts, lens, 16, "compat",
                                 random.Random(seed))
        got = build_rect_compat(norm, starts, lens, 16,
                                compat_sampler(seed))
        np.testing.assert_array_equal(got, want)
        assert got.dtype == want.dtype == np.float64
    # zero-length events: all-zero rows (np.where pads with +0.0)
    starts = np.array([0, 0, 0], np.int64)
    lens = np.array([0, 3, 0], np.int64)
    norm = np.array([1.0, -2.0, 3.0])
    got = build_rect_compat(norm, starts, lens, 16, compat_sampler(5))
    want = build_signal_rect(norm, starts, lens, 16, "compat",
                             random.Random(5))
    np.testing.assert_array_equal(got, want)
    assert not np.signbit(got[0]).any()


def test_rect_compat_python_native_one_stream(monkeypatch):
    """The native rect kernel and the Python loop can interleave on ONE
    CompatSampler stream (per-read fallback safety): read A native, read
    B python, read C native == all-python under the same seed."""
    import deepsignal_plant_tpu.pipeline.extract as ex
    rng = np.random.default_rng(31)
    reads = []
    for _ in range(3):
        starts, lens, total = _random_events(rng, 60)
        reads.append((starts, lens,
                      np.around(rng.standard_normal(total), 6)))
    seed = 987654321
    # ONE python rng stream across all three reads
    r_py = random.Random(seed)
    all_py = [build_signal_rect(n, s, le, 16, "compat", r_py)
              for (s, le, n) in reads]
    import deepsignal_plant_tpu.utils.fastparse as fp
    samp = compat_sampler(seed)
    mixed = [build_rect_compat(reads[0][2], reads[0][0], reads[0][1], 16,
                               samp)]
    # force the PYTHON loop for read B, drawing from the same native
    # MT state via samp.sample
    monkeypatch.setattr(fp, "build_rect_compat", lambda *a, **k: None)
    mixed.append(build_signal_rect(reads[1][2], reads[1][0], reads[1][1],
                                   16, "compat", samp))
    monkeypatch.undo()
    mixed.append(build_rect_compat(reads[2][2], reads[2][0], reads[2][1],
                                   16, samp))
    for got, want in zip(mixed, all_py):
        np.testing.assert_array_equal(got, want)


def test_extract_read_features_compat_native_matches_python(monkeypatch):
    """End-to-end: extract_read_features in compat mode (native chain)
    produces byte-identical rows to the pure-Python chain under the same
    per-batch seed."""
    from make_synthetic import synth_fast5_dir, synth_genome, write_fasta

    import deepsignal_plant_tpu.utils.fastparse as fp
    from deepsignal_plant_tpu.io.fast5 import read_tombo_fast5
    from deepsignal_plant_tpu.pipeline.extract import (ExtractContext,
                                                       ExtractOptions,
                                                       extract_read_features,
                                                       features_to_rows)
    from deepsignal_plant_tpu.utils.fileio import get_fast5s

    rng = np.random.default_rng(41)
    genome = synth_genome(rng, {"chr1": 2500})
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        fasta = write_fasta(tmp + "/ref.fa", genome)
        f5dir = tmp + "/f5"
        # max_event_len > signal_len: long events FORCE random
        # downsampling (the whole point of compat mode)
        synth_fast5_dir(f5dir, genome, rng, n_reads=4, read_len=200,
                        max_event_len=40)
        ctx = ExtractContext.build(ExtractOptions(
            motifs="C", reference_path=fasta, downsample="compat"))
        seed = 424242

        def run(native: bool):
            rows = []
            if native:
                rng_c = compat_sampler(seed)
            else:
                rng_c = random.Random(seed)
                # force every native compat helper off
                monkeypatch.setattr(fp, "normalize_mad_native",
                                    lambda *a, **k: None)
                monkeypatch.setattr(fp, "segment_stats_exact_native",
                                    lambda *a, **k: None)
            for p in sorted(get_fast5s(f5dir, True)):
                f = extract_read_features(read_tombo_fast5(p), ctx, rng_c)
                if f is not None:
                    rows.extend(features_to_rows(f))
            if not native:
                monkeypatch.undo()
            return rows

        native_rows = run(True)
        python_rows = run(False)
        assert native_rows and native_rows == python_rows
