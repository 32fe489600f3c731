"""Read-packed wire (.npz v3): dedup math, container roundtrip, engine
parity with the per-site paths, batch splitting, sparse fallback."""
import numpy as np
import pytest

from make_synthetic import synth_fast5_dir, synth_genome, write_fasta

from deepsignal_plant_tpu.io.fast5 import read_tombo_fast5
from deepsignal_plant_tpu.pipeline.extract import (
    ExtractContext, ExtractOptions, extract_read_features,
    features_to_batch, features_to_packed, features_to_rows)
from deepsignal_plant_tpu.utils.fileio import get_fast5s
from deepsignal_plant_tpu.utils.formats import (load_packed_npz,
                                                save_packed_npz,
                                                wire_npz_version)


@pytest.fixture(scope="module")
def feats_fixture(tmp_path_factory):
    """A dense-motif (C) extraction: per-read feature dicts + their TSV
    rows, from a synthetic resquiggled fast5 dir."""
    rng = np.random.default_rng(1234)
    tmp = tmp_path_factory.mktemp("packed")
    genome = synth_genome(rng, {"chr1": 3000})
    fasta = write_fasta(str(tmp / "ref.fa"), genome)
    f5dir = str(tmp / "f5")
    synth_fast5_dir(f5dir, genome, rng, n_reads=6, read_len=150)
    ctx = ExtractContext.build(ExtractOptions(motifs="C",
                                              reference_path=fasta))
    feats_list = []
    for p in sorted(get_fast5s(f5dir, True)):
        f = extract_read_features(read_tombo_fast5(p), ctx)
        if f is not None:
            feats_list.append(f)
    assert len(feats_list) >= 4
    rows = []
    for f in feats_list:
        rows.extend(features_to_rows(f))
    return feats_list, rows


def test_packed_matches_windowed_batch(feats_fixture):
    """to_raw_block() (host window gather from the packed arrays) must
    reproduce the per-site windowed arrays exactly."""
    feats_list, _ = feats_fixture
    pb = features_to_packed(feats_list)
    fb = features_to_batch(feats_list, 13, 16)
    assert pb.n == len(fb)
    # dense motif: the dedup must actually pay
    assert pb.n_bases / pb.n < 8.0
    rb = pb.to_raw_block()
    np.testing.assert_array_equal(rb.kmer, fb.kmer.astype(np.int8))
    np.testing.assert_array_equal(rb.means,
                                  fb.base_means.astype(np.float16))
    np.testing.assert_array_equal(rb.stds, fb.base_stds.astype(np.float16))
    np.testing.assert_array_equal(rb.slens,
                                  fb.base_signal_lens.astype(np.float16))
    np.testing.assert_array_equal(rb.signals,
                                  fb.signals.astype(np.float16))
    np.testing.assert_array_equal(rb.labels, fb.labels)
    for i, s in enumerate(fb.sampleinfo):
        assert pb.raw[pb.row_starts[i]:pb.info_ends[i]].decode() == s
    # centers must be non-decreasing (the engine's batch splitter relies
    # on slicing the covering base range)
    assert np.all(np.diff(pb.centers) >= 0)


def test_packed_npz_roundtrip(tmp_path, feats_fixture):
    feats_list, _ = feats_fixture
    pb = features_to_packed(feats_list)
    p = str(tmp_path / "p.npz")
    save_packed_npz(p, pb)
    assert wire_npz_version(p) == 3
    pb2 = load_packed_npz(p)
    assert pb2.kmer_len == pb.kmer_len
    assert pb2.raw == pb.raw
    for attr in ("row_starts", "info_ends", "centers", "codes", "means",
                 "stds", "lens", "rect", "labels"):
        np.testing.assert_array_equal(getattr(pb2, attr),
                                      getattr(pb, attr))


def test_mixed_wire_versions_rejected(tmp_path, feats_fixture):
    """The v2/v3 loaders refuse the other version with an actionable
    message (a dir must not mix wire formats)."""
    from deepsignal_plant_tpu.utils.formats import (load_wire_npz,
                                                    parse_feature_lines,
                                                    save_wire_npz)
    feats_list, rows = feats_fixture
    p3 = str(tmp_path / "v3.npz")
    save_packed_npz(p3, features_to_packed(feats_list))
    with pytest.raises(ValueError, match="wire-format v3"):
        load_wire_npz(p3)
    fb = parse_feature_lines([r + "\n" for r in rows[:4]])
    p2 = str(tmp_path / "v2.npz")
    save_wire_npz(p2, fb)
    with pytest.raises(ValueError, match="wire-format v2"):
        load_packed_npz(p2)


def test_packed_bounds_validation(tmp_path, feats_fixture):
    """Corrupt/truncated packed containers (centers outside the base
    axis) are rejected at load."""
    feats_list, _ = feats_fixture
    pb = features_to_packed(feats_list)
    p = str(tmp_path / "t.npz")
    truncated = type(pb)(pb.raw, pb.row_starts, pb.info_ends, pb.centers,
                         pb.codes[:int(pb.centers[-1])], pb.means,
                         pb.stds, pb.lens, pb.rect, pb.labels, pb.kmer_len)
    save_packed_npz(p, truncated)
    with pytest.raises(ValueError, match="out of bounds"):
        load_packed_npz(p)


def test_packed_kmer_len_mismatch_rejected(tmp_path, feats_fixture):
    """Every block's kmer_len is validated — a later block from a
    different --seq_len extract run must fail loudly, not gather wrong
    windows."""
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    feats_list, _ = feats_fixture
    pdir = tmp_path / "packed"
    pdir.mkdir()
    save_packed_npz(str(pdir / "000.npz"), features_to_packed(feats_list))
    bad = features_to_packed(feats_list)
    bad.kmer_len = 11   # 11 keeps load-time bounds valid (nb shrinks)
    save_packed_npz(str(pdir / "001.npz"), bad)
    eng = _make_engine(tmp_path)
    with pytest.raises(ValueError, match="kmer_len"):
        eng.run_features_file(str(pdir), str(tmp_path / "out.tsv"))


def _make_engine(tmp_path, device_batch=64, transfer_dtype="float16",
                 name="m.npz", packed_wire="force"):
    """packed_wire defaults to "force" here: these tests exercise the
    on-device window gather, which "auto" would route to host windows on
    the 8-device test mesh (threshold seq_len/8; see
    test_packed_auto_selection_multi_device for the auto behavior)."""
    import jax

    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(tmp_path / name)
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(5), cfg), cfg)
    return CallModsEngine(ckpt, cfg,
                          CallConfig(device_batch=device_batch,
                                     transfer_dtype=transfer_dtype,
                                     packed_wire=packed_wire))


def test_engine_packed_vs_tsv(tmp_path, feats_fixture):
    """Engine over a packed-wire dir == engine over the source TSV (info
    columns byte-equal; probs within f16 double-rounding tolerance)."""
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    feats_list, rows = feats_fixture
    feat = str(tmp_path / "f.tsv")
    with open(feat, "w") as f:
        f.write("\n".join(rows) + "\n")
    pdir = tmp_path / "packed"
    pdir.mkdir()
    # two blocks: the engine batcher must merge across block boundaries
    mid = len(feats_list) // 2
    save_packed_npz(str(pdir / "000.npz"),
                    features_to_packed(feats_list[:mid]))
    save_packed_npz(str(pdir / "001.npz"),
                    features_to_packed(feats_list[mid:]))

    eng = _make_engine(tmp_path)
    out_tsv = str(tmp_path / "calls_tsv.tsv")
    eng.run_features_file(feat, out_tsv)
    out_packed = str(tmp_path / "calls_packed.tsv")
    st = eng.run_features_file(str(pdir), out_packed)
    assert st.sites == len(rows)

    a = open(out_tsv).read().splitlines()
    b = open(out_packed).read().splitlines()
    assert len(a) == len(b)
    for la, lb in zip(a, b):
        wa, wb = la.split("\t"), lb.split("\t")
        assert wa[:6] == wb[:6] and wa[9] == wb[9]
        assert abs(float(wa[6]) - float(wb[6])) < 3e-4


def test_engine_packed_splitting_invariance(tmp_path, feats_fixture):
    """Tiny device_batch (splits mid-block, multiple dispatches) must give
    byte-identical output to one big batch."""
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    feats_list, rows = feats_fixture
    pdir = tmp_path / "packed"
    pdir.mkdir()
    for i, f in enumerate(feats_list):
        save_packed_npz(str(pdir / f"{i:03d}.npz"),
                        features_to_packed([f]))

    big = _make_engine(tmp_path, device_batch=2048, name="a.npz")
    small = _make_engine(tmp_path, device_batch=16, name="b.npz")
    out_big = str(tmp_path / "big.tsv")
    out_small = str(tmp_path / "small.tsv")
    st_big = big.run_features_file(str(pdir), out_big)
    st_small = small.run_features_file(str(pdir), out_small)
    assert st_big.sites == st_small.sites == len(rows)
    assert open(out_big).read() == open(out_small).read()


def test_engine_packed_sparse_fallback(tmp_path, feats_fixture):
    """With the density threshold forced to 0 the engine must windowize on
    host (per-site fast loop) and still produce identical output."""
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    feats_list, rows = feats_fixture
    pdir = tmp_path / "packed"
    pdir.mkdir()
    save_packed_npz(str(pdir / "000.npz"), features_to_packed(feats_list))

    eng = _make_engine(tmp_path, name="a.npz")
    out_packed = str(tmp_path / "p.tsv")
    eng.run_features_file(str(pdir), out_packed)

    eng2 = _make_engine(tmp_path, name="b.npz", packed_wire="off")
    out_win = str(tmp_path / "w.tsv")
    st = eng2.run_features_file(str(pdir), out_win)
    assert st.sites == len(rows)
    assert open(out_packed).read() == open(out_win).read()


def test_packed_auto_selection_multi_device(tmp_path, feats_fixture,
                                            monkeypatch):
    """VERDICT r2 #4 (+ r3 refinement, + r4 review fix): on a
    multi-device mesh behind a REMOTE-attached link, "auto" must NOT
    trust the staged packed format — the packed step replicates base
    arrays per device (n*seq_len rows/site even if windows were
    materialized), so the whole stream routes to the per-site plane
    (P(axis)-sharded). On a DIRECT-attached multi-device mesh (this
    8-device CPU mesh) the wire is ~free and the deduplicated base axis
    is KEPT: its win there is skipping the host-side 13x window
    materialization. Assert both routings and output identity with the
    forced device-gather plane."""
    import jax

    from deepsignal_plant_tpu.pipeline import call_mods as cm
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    feats_list, rows = feats_fixture
    pdir = tmp_path / "packed"
    pdir.mkdir()
    pb = features_to_packed(feats_list)
    save_packed_npz(str(pdir / "000.npz"), pb)

    auto = _make_engine(tmp_path, name="a.npz", packed_wire="auto")
    forced = _make_engine(tmp_path, name="b.npz", packed_wire="force")
    assert auto.mesh.devices.size == 8
    density = pb.n_bases / pb.n
    assert forced.packed_density_threshold() == float("inf")

    # direct-attached (the CPU test mesh): threshold stays 12 and auto
    # keeps the packed device-gather plane at this density
    assert not cm.mesh_is_remote(auto.mesh)
    assert auto.packed_density_threshold() == pytest.approx(12.0)
    assert density <= auto.packed_density_threshold()
    calls = {"packed": 0}
    orig_packed = auto._predict_packed
    auto._predict_packed = lambda *a, **k: (
        calls.__setitem__("packed", calls["packed"] + 1)
        or orig_packed(*a, **k))
    out_auto = str(tmp_path / "auto.tsv")
    st = auto.run_features_file(str(pdir), out_auto)
    assert st.sites == len(rows)
    assert calls["packed"] > 0     # packed plane kept on direct attach

    # remote-attached multi-device: the threshold tightens below the
    # single-device bound — the packed step would replicate base arrays
    # per device (n*seq_len rows/site even materialized), so the WHOLE
    # stream takes the per-site plane (P(axis)-sharded, seq_len
    # rows/site). Mesh-determined, never data-determined.
    monkeypatch.setattr(cm, "mesh_is_remote", lambda mesh: True)
    remote = _make_engine(tmp_path, name="c.npz", packed_wire="auto")
    thresh = remote.packed_density_threshold()
    assert thresh == pytest.approx(13 / 8)
    assert density > thresh
    rcalls = {"packed": 0}
    orig_r = remote._predict_packed
    remote._predict_packed = lambda *a, **k: (
        rcalls.__setitem__("packed", rcalls["packed"] + 1)
        or orig_r(*a, **k))
    out_remote = str(tmp_path / "remote.tsv")
    st = remote.run_features_file(str(pdir), out_remote)
    assert st.sites == len(rows)
    assert rcalls["packed"] == 0   # whole stream on the per-site plane
    monkeypatch.undo()

    out_forced = str(tmp_path / "forced.tsv")
    forced.run_features_file(str(pdir), out_forced)
    assert open(out_auto).read() == open(out_forced).read()
    assert open(out_remote).read() == open(out_forced).read()

    # single-device mesh keeps the packed plane at this density
    single = CallModsEngine_single(tmp_path, feats_fixture)
    assert single.packed_density_threshold() == pytest.approx(12.0)
    assert density <= single.packed_density_threshold()


def CallModsEngine_single(tmp_path, feats_fixture):
    import jax

    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.parallel.mesh import make_mesh
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(tmp_path / "single.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(5), cfg), cfg)
    return CallModsEngine(ckpt, cfg, CallConfig(device_batch=64),
                          mesh=make_mesh(jax.devices()[:1]))


def test_engine_packed_int8_wire(tmp_path, feats_fixture):
    """int8 transfer over the packed wire: same calls, probs within the
    quantization tolerance."""
    from deepsignal_plant_tpu.utils.fastparse import (native_available,
                                                      quantize_int8)
    if not native_available() or \
            quantize_int8(np.ones(4, np.float16)) is None:
        pytest.skip("native quantizer unavailable")
    feats_list, rows = feats_fixture
    pdir = tmp_path / "packed"
    pdir.mkdir()
    save_packed_npz(str(pdir / "000.npz"), features_to_packed(feats_list))

    f16 = _make_engine(tmp_path, name="a.npz", transfer_dtype="float16")
    i8 = _make_engine(tmp_path, name="b.npz", transfer_dtype="int8")
    out_f16 = str(tmp_path / "f16.tsv")
    out_i8 = str(tmp_path / "i8.tsv")
    f16.run_features_file(str(pdir), out_f16)
    st = i8.run_features_file(str(pdir), out_i8)
    assert st.sites == len(rows)
    a = open(out_f16).read().splitlines()
    b = open(out_i8).read().splitlines()
    for la, lb in zip(a, b):
        wa, wb = la.split("\t"), lb.split("\t")
        assert wa[:6] == wb[:6]
        assert abs(float(wa[6]) - float(wb[6])) < 2e-3


def test_pack_raw_block_roundtrip(feats_fixture):
    """dsp_pack_rows rebuilds the packed wire from parsed per-site rows;
    re-windowing it must reproduce the rows exactly, and the dedup must
    match the direct features_to_packed packing."""
    from deepsignal_plant_tpu.utils.fastparse import (
        native_available, pack_raw_block, parse_raw_feature_block)
    if not native_available():
        pytest.skip("native library unavailable")
    feats_list, rows = feats_fixture
    raw = ("\n".join(rows) + "\n").encode()
    rb = parse_raw_feature_block(raw)
    pb = pack_raw_block(rb)
    assert pb.n == len(rows)
    # extraction-ordered rows must dedup at least as well as the direct
    # packing (the repacker also skips read bases outside any window)
    direct = features_to_packed(feats_list)
    assert pb.n_bases <= direct.n_bases
    # src fallback returns the original block untouched
    assert pb.to_raw_block() is rb
    # windows gathered from the packed axis == the parsed rows
    win = pb.window_index()
    np.testing.assert_array_equal(pb.codes[win], rb.kmer)
    np.testing.assert_array_equal(pb.means[win], rb.means)
    np.testing.assert_array_equal(pb.rect[win], rb.signals)


def test_pack_raw_block_any_row_order(feats_fixture, tmp_path):
    """Shuffled rows (no exploitable adjacency) must still produce
    byte-identical engine output — dedup is correctness-conservative."""
    from deepsignal_plant_tpu.utils.fastparse import (
        native_available, pack_raw_block, parse_raw_feature_block)
    if not native_available():
        pytest.skip("native library unavailable")
    _, rows = feats_fixture
    rng = np.random.default_rng(3)
    shuffled = [rows[i] for i in rng.permutation(len(rows))]
    raw = ("\n".join(shuffled) + "\n").encode()
    rb = parse_raw_feature_block(raw)
    pb = pack_raw_block(rb)
    # shuffling destroys adjacency: nearly every row is a fresh segment
    assert pb.n_bases > 0.9 * pb.n * 13
    win = pb.window_index()
    np.testing.assert_array_equal(pb.codes[win], rb.kmer)
    np.testing.assert_array_equal(pb.rect[win], rb.signals)

    feat = str(tmp_path / "shuf.tsv")
    with open(feat, "w") as f:
        f.write("\n".join(shuffled) + "\n")
    eng = _make_engine(tmp_path, name="a.npz")
    out_a = str(tmp_path / "a.tsv")
    eng.run_features_file(feat, out_a)
    # force the per-site route for the oracle
    eng2 = _make_engine(tmp_path, name="b.npz")
    eng2.PACKED_MAX_BASES_PER_SITE = 0.0
    out_b = str(tmp_path / "b.tsv")
    eng2.run_features_file(feat, out_b)
    assert open(out_a).read() == open(out_b).read()


def test_engine_tsv_packed_route_byte_identical(tmp_path, feats_fixture):
    """The TSV fast path's packed route output must be byte-identical to
    the per-site route on extraction-ordered rows."""
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    _, rows = feats_fixture
    feat = str(tmp_path / "f.tsv")
    with open(feat, "w") as f:
        f.write("\n".join(rows) + "\n")
    packed = _make_engine(tmp_path, name="a.npz")
    persite = _make_engine(tmp_path, name="b.npz")
    persite.PACKED_MAX_BASES_PER_SITE = 0.0
    out_a = str(tmp_path / "a.tsv")
    out_b = str(tmp_path / "b.tsv")
    sa = packed.run_features_file(feat, out_a)
    sb = persite.run_features_file(feat, out_b)
    assert sa.sites == sb.sites == len(rows)
    assert open(out_a).read() == open(out_b).read()


def test_engine_empty_inputs(tmp_path, feats_fixture):
    """Empty TSV / empty packed blocks: the engine writes an empty output
    and reports zero sites instead of crashing."""
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    feats_list, _ = feats_fixture
    eng = _make_engine(tmp_path)
    empty = str(tmp_path / "empty.tsv")
    open(empty, "w").close()
    out = str(tmp_path / "out.tsv")
    st = eng.run_features_file(empty, out)
    assert st.sites == 0 and open(out).read() == ""
    # a packed dir whose first block is empty but later blocks are not
    pdir = tmp_path / "p"
    pdir.mkdir()
    pb = features_to_packed(feats_list[:1])
    empty_pb = type(pb)(b"", pb.row_starts[:0], pb.info_ends[:0],
                        pb.centers[:0], pb.codes[:0], pb.means[:0],
                        pb.stds[:0], pb.lens[:0], pb.rect[:0],
                        pb.labels[:0], pb.kmer_len)
    save_packed_npz(str(pdir / "000.npz"), empty_pb)
    save_packed_npz(str(pdir / "001.npz"), pb)
    st = eng.run_features_file(str(pdir), out)
    assert st.sites == pb.n
    assert len(open(out).read().splitlines()) == pb.n


def test_extract_packed_cli_to_call_mods(tmp_path):
    """extract --w_format npz_packed -> call_mods over the directory."""
    import jax

    from deepsignal_plant_tpu.cli import main as cli_main
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    genome = synth_genome(rng, {"chr1": 2000})
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    f5dir = str(tmp_path / "f5")
    synth_fast5_dir(f5dir, genome, rng, n_reads=4, read_len=120)

    pdir = str(tmp_path / "packed")
    cli_main(["extract", "--fast5_dir", f5dir, "--write_path", pdir,
              "--reference_path", fasta, "--motifs", "C", "--nproc", "2",
              "--w_format", "npz_packed"])
    files = sorted(__import__("os").listdir(pdir))
    assert files and all(f.endswith(".npz") for f in files)
    assert wire_npz_version(str(tmp_path / "packed" / files[0])) == 3

    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(tmp_path / "m.ckpt.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(0), cfg), cfg)
    out = str(tmp_path / "calls.tsv")
    cli_main(["call_mods", "-i", pdir, "-m", ckpt, "-o", out,
              "--hid_rnn", "32", "--device_batch", "32"])
    lines = open(out).read().splitlines()
    assert lines and all(len(l.split("\t")) == 10 for l in lines)


def test_sparse_first_block_does_not_flip_run(tmp_path, feats_fixture,
                                              monkeypatch):
    """VERDICT r3 item 7: routing is per BLOCK, not per run. A sparse
    first block (density > threshold) used to flip the ENTIRE run to the
    host-window plane and size the static base cap from block 0; now it
    alone rides the per-site step (host window gather, batch sharded)
    while the dense rest of the stream keeps the deduplicated base axis
    on the packed step, dispatches interleaved in one loop — and the
    output is byte-identical to the all-dedup (force) and per-site
    (off) planes either way."""
    import deepsignal_plant_tpu.utils.fastparse as fp
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    feats_list, rows = feats_fixture
    pb = features_to_packed(feats_list)
    dense_density = pb.n_bases / pb.n
    # sparse block: every 15th site of the same extraction — all base
    # arrays ride along, so density jumps ~15x past the threshold (12)
    idx = np.arange(0, pb.n, 15)
    sparse = fp.PackedFeatureBlock(
        pb.raw, pb.row_starts[idx], pb.info_ends[idx], pb.centers[idx],
        pb.codes, pb.means, pb.stds, pb.lens, pb.rect, pb.labels[idx],
        pb.kmer_len)
    assert sparse.n_bases / sparse.n > 12.0 > dense_density

    pdir = tmp_path / "mixed"
    pdir.mkdir()
    save_packed_npz(str(pdir / "000.npz"), sparse)   # sparse is FIRST
    save_packed_npz(str(pdir / "001.npz"), pb)
    save_packed_npz(str(pdir / "002.npz"), pb)

    auto = _make_engine(tmp_path, name="a.npz", packed_wire="auto")
    assert auto.packed_density_threshold() == pytest.approx(12.0)
    counts = {"persite": 0, "packed": 0}
    orig_p = auto._predict_packed
    auto._predict_packed = lambda *a, **k: (
        counts.__setitem__("packed", counts["packed"] + 1)
        or orig_p(*a, **k))
    orig_s = auto._predict
    auto._predict = lambda *a, **k: (
        counts.__setitem__("persite", counts["persite"] + 1)
        or orig_s(*a, **k))
    out_auto = str(tmp_path / "mixed_auto.tsv")
    st = auto.run_features_file(str(pdir), out_auto)
    assert st.sites == len(idx) + 2 * len(rows)
    assert counts["persite"] > 0   # the sparse block: per-site step
    assert counts["packed"] > 0    # dense stream stayed on-device gather

    forced = _make_engine(tmp_path, name="b.npz", packed_wire="force")
    out_forced = str(tmp_path / "mixed_forced.tsv")
    forced.run_features_file(str(pdir), out_forced)
    off = _make_engine(tmp_path, name="c.npz", packed_wire="off")
    out_off = str(tmp_path / "mixed_off.tsv")
    off.run_features_file(str(pdir), out_off)
    assert open(out_auto).read() == open(out_forced).read()
    assert open(out_auto).read() == open(out_off).read()


def test_mixed_routing_int8_band(tmp_path, feats_fixture):
    """int8 arm of the route-identity contract (ADVICE r4): under
    --wire_dtype int8 the packed route quantizes the deduplicated base
    slice (per-batch amax over bases incl. gap bases) while the per-site
    route quantizes gathered windows, and batch boundaries differ per
    route — so auto/force/off are NOT byte-identical. The pinned
    contract: identical site keys in identical order, probs within the
    int8 quantization band, prob columns self-consistent."""
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    feats_list, rows = feats_fixture
    pb = features_to_packed(feats_list)
    idx = np.arange(0, pb.n, 15)
    sparse = __import__("deepsignal_plant_tpu.utils.fastparse",
                        fromlist=["PackedFeatureBlock"]).PackedFeatureBlock(
        pb.raw, pb.row_starts[idx], pb.info_ends[idx], pb.centers[idx],
        pb.codes, pb.means, pb.stds, pb.lens, pb.rect, pb.labels[idx],
        pb.kmer_len)
    pdir = tmp_path / "mixed8"
    pdir.mkdir()
    save_packed_npz(str(pdir / "000.npz"), sparse)
    save_packed_npz(str(pdir / "001.npz"), pb)

    outs = {}
    for wire in ("auto", "force", "off"):
        eng = _make_engine(tmp_path, name=f"i8_{wire}.npz",
                           transfer_dtype="int8", packed_wire=wire)
        out = str(tmp_path / f"mixed_i8_{wire}.tsv")
        eng.run_features_file(str(pdir), out)
        lines = open(out).read().splitlines()
        keys = [l.split("\t")[:6] for l in lines]
        probs = np.array([[float(l.split("\t")[6]), float(l.split("\t")[7])]
                          for l in lines])
        outs[wire] = (keys, probs)
        assert np.all(probs >= 0.0) and np.all(probs <= 1.0)
        assert np.allclose(probs.sum(axis=1), 1.0, atol=2e-3)

    k_auto, p_auto = outs["auto"]
    for wire in ("force", "off"):
        k, p = outs[wire]
        assert k == k_auto                       # same sites, same order
        # probs differ only within the int8 per-batch-scale band
        assert float(np.abs(p - p_auto).max()) < 0.05


def test_remote_small_mesh_keeps_packed_for_dense(tmp_path, feats_fixture,
                                                  monkeypatch):
    """r4 second-review fix: on a REMOTE 2-device mesh the threshold is
    seq_len/2 = 6.5, which this dense fixture (~3-4 bases/site) does NOT
    exceed — per-block routing must KEEP the deduplicated packed wire
    (density*n = ~7 base-rows/site still beats the per-site step's 13),
    where the earlier whole-stream reroute gave the dedup win away."""
    import jax

    from deepsignal_plant_tpu.parallel.mesh import make_mesh
    from deepsignal_plant_tpu.pipeline import call_mods as cm
    from deepsignal_plant_tpu.utils.fastparse import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    feats_list, rows = feats_fixture
    pdir = tmp_path / "packed"
    pdir.mkdir()
    pb = features_to_packed(feats_list)
    save_packed_npz(str(pdir / "000.npz"), pb)
    density = pb.n_bases / pb.n

    monkeypatch.setattr(cm, "mesh_is_remote", lambda mesh: True)
    import deepsignal_plant_tpu.models.convert  # noqa: F401 (ckpt deps)
    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(tmp_path / "m2.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(5), cfg), cfg)
    eng = CallModsEngine(ckpt, cfg,
                         CallConfig(device_batch=64,
                                    transfer_dtype="float16",
                                    packed_wire="auto"),
                         mesh=make_mesh(jax.devices()[:2]))
    thresh = eng.packed_density_threshold()
    assert thresh == pytest.approx(6.5)
    assert density < thresh
    calls = {"packed": 0, "persite": 0}
    orig_p = eng._predict_packed
    eng._predict_packed = lambda *a, **k: (
        calls.__setitem__("packed", calls["packed"] + 1)
        or orig_p(*a, **k))
    orig_s = eng._predict
    eng._predict = lambda *a, **k: (
        calls.__setitem__("persite", calls["persite"] + 1)
        or orig_s(*a, **k))
    out = str(tmp_path / "r2.tsv")
    st = eng.run_features_file(str(pdir), out)
    assert st.sites == len(rows)
    assert calls["packed"] > 0     # dedup kept on the small remote mesh
    assert calls["persite"] == 0
