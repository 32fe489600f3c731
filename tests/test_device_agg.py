"""Device-side call_freq aggregation (ops/segment_agg, SURVEY.md §7.5).

The device path must be byte-identical to the host path (and hence the
reference oracle) in every output mode — the jitted kernel only replaces
the site-key sort and integer segment sums; float64 prob sums stay on
the host, driven in the same association order.
"""
import numpy as np
import pytest

from test_call_pipeline import _synth_call_rows


def test_sort_segment_reduce_unit():
    from deepsignal_plant_tpu.ops.segment_agg import sort_segment_reduce
    hi = np.array([1, 0, 1, 0, 0], np.int32)
    lo = np.array([5, 9, 5, 9, 2], np.int32)
    met = np.array([1, 0, 1, 1, 0], np.int32)
    order, seg, cov, met_sum, n_seg = sort_segment_reduce(hi, lo, met)
    # keys sorted: (0,2) < (0,9) < (0,9) < (1,5) < (1,5)
    assert n_seg == 3
    assert order.tolist() == [4, 1, 3, 0, 2]   # stable: file order kept
    assert seg.tolist() == [0, 1, 1, 2, 2]
    assert cov.tolist() == [1, 2, 2]
    assert met_sum.tolist() == [0, 1, 2]


def test_sort_segment_reduce_empty_and_padded():
    from deepsignal_plant_tpu.ops.segment_agg import (_MIN_BLOCK,
                                                      sort_segment_reduce)
    order, seg, cov, met_sum, n_seg = sort_segment_reduce(
        np.empty(0, np.int32), np.empty(0, np.int32),
        np.empty(0, np.int32))
    assert n_seg == 0 and len(order) == 0
    # n far below the block size: sentinel pads must not leak into the
    # real segments
    rng = np.random.default_rng(0)
    n = 37
    assert n < _MIN_BLOCK
    hi = rng.integers(0, 3, n).astype(np.int32)
    lo = rng.integers(0, 9, n).astype(np.int32)
    met = rng.integers(0, 2, n).astype(np.int32)
    order, seg, cov, met_sum, n_seg = sort_segment_reduce(hi, lo, met)
    assert len(order) == n and len(seg) == n
    assert cov.sum() == n
    keys = [(int(hi[i]), int(lo[i])) for i in order]
    assert keys == sorted(keys)
    assert n_seg == len(set(keys))
    assert int(met_sum.sum()) == int(met.sum())


@pytest.mark.parametrize("is_sort,is_bed",
                         [(False, False), (True, False),
                          (False, True), (True, True)])
def test_device_agg_byte_identical_to_host(tmp_path, is_sort, is_bed):
    from deepsignal_plant_tpu.pipeline import call_freq as cf
    rng = np.random.default_rng(11)
    calls = str(tmp_path / "calls.tsv")
    with open(calls, "w") as f:
        f.write("\n".join(_synth_call_rows(rng, 4000)) + "\n")
    host = cf.FreqAccumulator(prob_cf=0.2)
    host.add_file(calls, block_bytes=1 << 12)
    dev = cf.FreqAccumulator(prob_cf=0.2, device_agg=True)
    dev.add_file(calls, block_bytes=1 << 12)
    assert (dev.count, dev.used, dev.n_sites) == \
        (host.count, host.used, host.n_sites)
    a = str(tmp_path / "host.out")
    b = str(tmp_path / "dev.out")
    cf.write_freq(host, a, is_sort, is_bed, False)
    cf.write_freq(dev, b, is_sort, is_bed, False)
    assert open(a).read() == open(b).read()


def test_device_agg_huge_positions_take_host_path(tmp_path):
    """Positions past int32 can't ride the device kernel's int32 keys;
    such blocks fall back to the host path with identical output."""
    from deepsignal_plant_tpu.pipeline import call_freq as cf
    base = 2**31 + 7
    calls = str(tmp_path / "calls.tsv")
    with open(calls, "w") as f:
        for j in range(200):
            pos = base + (j * 13 % 50)
            p1 = round((j * 41 % 100) / 100, 6)
            p0 = round(1 - p1, 6)
            f.write(f"chrG\t{pos}\t+\t{pos}\tr{j}\tt\t{p0}\t{p1}\t"
                    f"{int(p1 > 0.5)}\tACGTACCGTACGT\n")
    host = cf.FreqAccumulator(prob_cf=0.0)
    host.add_file(calls)
    dev = cf.FreqAccumulator(prob_cf=0.0, device_agg=True)
    dev.add_file(calls)
    assert dev.n_sites == host.n_sites == 50
    assert int(dev._pos[:dev.n_sites].min()) >= base
    a, b = str(tmp_path / "host.out"), str(tmp_path / "dev.out")
    cf.write_freq(host, a, True, False, False)
    cf.write_freq(dev, b, True, False, False)
    assert open(a).read() == open(b).read()


def test_device_agg_vs_reference_oracle(reference_importable, tmp_path):
    from deepsignal_plant.call_mods_freq import (calculate_mods_frequency,
                                                 write_sitekey2stats)

    from deepsignal_plant_tpu.pipeline import call_freq as cf
    rng = np.random.default_rng(23)
    calls = str(tmp_path / "calls.tsv")
    with open(calls, "w") as f:
        f.write("\n".join(_synth_call_rows(rng, 3000)) + "\n")
    acc = cf.FreqAccumulator(prob_cf=0.2, device_agg=True)
    acc.add_file(calls, block_bytes=1 << 12)
    ours = str(tmp_path / "ours.tsv")
    cf.write_freq(acc, ours, False, False, False)
    stats = calculate_mods_frequency([calls], 0.2)
    theirs = str(tmp_path / "ref.tsv")
    write_sitekey2stats(stats, theirs, False, False, False)
    assert open(ours).read() == open(theirs).read()


def test_device_agg_contig_mode(tmp_path):
    from deepsignal_plant_tpu.pipeline import call_freq as cf
    rng = np.random.default_rng(5)
    calls = str(tmp_path / "calls.tsv")
    with open(calls, "w") as f:
        f.write("\n".join(_synth_call_rows(rng, 1500)) + "\n")
    host = cf.FreqAccumulator(prob_cf=0.2, contig="chr10")
    host.add_file(calls, block_bytes=1 << 12)
    dev = cf.FreqAccumulator(prob_cf=0.2, contig="chr10",
                             device_agg=True)
    dev.add_file(calls, block_bytes=1 << 12)
    assert (dev.count, dev.used) == (host.count, host.used)
    a = str(tmp_path / "host.tsv")
    b = str(tmp_path / "dev.tsv")
    cf.write_freq(host, a, True, False, False)
    cf.write_freq(dev, b, True, False, False)
    assert open(a).read() == open(b).read()


def test_device_agg_cli_flag(tmp_path):
    from deepsignal_plant_tpu.cli import main as cli_main
    rng = np.random.default_rng(9)
    calls = str(tmp_path / "calls.tsv")
    with open(calls, "w") as f:
        f.write("\n".join(_synth_call_rows(rng, 800)) + "\n")
    out_host = str(tmp_path / "freq_host.tsv")
    out_dev = str(tmp_path / "freq_dev.tsv")
    cli_main(["call_freq", "-i", calls, "-o", out_host, "--sort"])
    cli_main(["call_freq", "-i", calls, "-o", out_dev, "--sort",
              "--device_agg"])
    assert open(out_host).read() == open(out_dev).read()
