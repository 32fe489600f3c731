"""Packed-resident inference plane: the resident engine fed by the
read-packed wire (deduplicated base slabs + on-device window gather
inside the scan; call_mods._run_resident_packed). Dense inputs must ride
the packed slab route byte-identically to every other plane; sparse
blocks fall back to per-site resident chunks; mixed streams preserve
row order; int8 slabs stay inside the documented quantization band."""
import os

import numpy as np
import pytest

from make_synthetic import (synth_fast5_dir, synth_feature_rows,
                            synth_genome, write_fasta, write_feature_file)

from deepsignal_plant_tpu.config import CallConfig, ModelConfig
from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
from deepsignal_plant_tpu.utils.fastparse import native_available

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native featparse not built")


@pytest.fixture(scope="module")
def dense_env(tmp_path_factory):
    """Dense-motif (C) extraction rows — read-grouped, adjacent sites, so
    pack_raw_block actually dedups (density well under the threshold) —
    plus a checkpoint."""
    import jax

    from deepsignal_plant_tpu.io.fast5 import read_tombo_fast5
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.pipeline.extract import (
        ExtractContext, ExtractOptions, extract_read_features,
        features_to_packed, features_to_rows)
    from deepsignal_plant_tpu.utils.fileio import get_fast5s
    rng = np.random.default_rng(77)
    d = tmp_path_factory.mktemp("resident_packed")
    genome = synth_genome(rng, {"chr1": 3000})
    fasta = write_fasta(str(d / "ref.fa"), genome)
    f5dir = str(d / "f5")
    synth_fast5_dir(f5dir, genome, rng, n_reads=8, read_len=200)
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
    feat = write_feature_file(str(d / "dense.tsv"), rows)
    pb = features_to_packed(feats_list)
    assert pb.n_bases / pb.n < 8.0     # the fixture really is dense
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(d / "m.ckpt.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(9), cfg), cfg)
    return feat, rows, feats_list, ckpt, d


def _engine(ckpt, **kw):
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    kw.setdefault("device_batch", 64)
    kw.setdefault("transfer_dtype", "float16")
    kw.setdefault("packed_wire", "force")
    return CallModsEngine(ckpt, cfg, CallConfig(**kw))


@needs_native
def test_dense_tsv_resident_packed_byte_identical(dense_env):
    """Dense TSV through the packed-resident plane == the streaming
    engine, byte for byte; the profile proves the packed route ran."""
    feat, rows, _, ckpt, d = dense_env
    stream = _engine(ckpt)
    res = _engine(ckpt, device_resident="always")
    out_s = str(d / "s.tsv")
    out_r = str(d / "r.tsv")
    stream.run_features_file(feat, out_s)
    st = res.run_features_file(feat, out_r)
    assert st.sites == len(rows)
    assert open(out_r, "rb").read() == open(out_s, "rb").read()
    prof = res.last_resident_profile
    assert prof["plane"] == "packed"
    assert prof["rows"] == len(rows)
    # the slab width sits at its 4096 floor for this tiny batch — far
    # below the all-windows-distinct worst case next_pow2(64 * 13)
    assert prof["nb_width"] == 4096


@needs_native
def test_packed_npz_dir_resident(dense_env, tmp_path):
    """v3 packed containers stay packed all the way into HBM (no host
    window materialization) and match the streaming engine."""
    from deepsignal_plant_tpu.pipeline.extract import features_to_packed
    from deepsignal_plant_tpu.utils.formats import save_packed_npz
    feat, rows, feats_list, ckpt, d = dense_env
    pdir = tmp_path / "packed"
    pdir.mkdir()
    mid = len(feats_list) // 2
    save_packed_npz(str(pdir / "000.npz"),
                    features_to_packed(feats_list[:mid]))
    save_packed_npz(str(pdir / "001.npz"),
                    features_to_packed(feats_list[mid:]))
    stream = _engine(ckpt)
    res = _engine(ckpt, device_resident="always")
    out_s = str(tmp_path / "s.tsv")
    out_r = str(tmp_path / "r.tsv")
    stream.run_features_file(str(pdir), out_s)
    st = res.run_features_file(str(pdir), out_r)
    assert st.sites == len(rows)
    assert res.last_resident_profile["plane"] == "packed"
    assert open(out_r, "rb").read() == open(out_s, "rb").read()


@needs_native
def test_mixed_density_stream_order_preserved(dense_env, tmp_path):
    """A stream interleaving dense and sparse blocks flips routes
    per-segment; output row order (and bytes) must still match the
    streaming engine on the same dir."""
    from deepsignal_plant_tpu.pipeline.extract import features_to_packed
    from deepsignal_plant_tpu.utils.fastparse import (
        pack_raw_block, parse_raw_feature_block)
    from deepsignal_plant_tpu.utils.formats import save_packed_npz
    feat, rows, feats_list, ckpt, d = dense_env
    rng = np.random.default_rng(5)
    sparse_rows = synth_feature_rows(rng, 2, 40)
    sparse_pb = pack_raw_block(parse_raw_feature_block(
        ("\n".join(sparse_rows) + "\n").encode(), 13, 16))
    assert sparse_pb.n_bases / sparse_pb.n > 12.0   # really sparse
    pdir = tmp_path / "mixed"
    pdir.mkdir()
    mid = len(feats_list) // 2
    save_packed_npz(str(pdir / "000.npz"),
                    features_to_packed(feats_list[:mid]))
    save_packed_npz(str(pdir / "001.npz"), sparse_pb)
    save_packed_npz(str(pdir / "002.npz"),
                    features_to_packed(feats_list[mid:]))
    # auto routing (per-block density), tiny batch forces many chunks
    stream = _engine(ckpt, packed_wire="auto", device_batch=32)
    res = _engine(ckpt, packed_wire="auto", device_batch=32,
                  device_resident="always")
    res.RESIDENT_MAX_CHUNKS = 4
    out_s = str(tmp_path / "s.tsv")
    out_r = str(tmp_path / "r.tsv")
    stream.run_features_file(str(pdir), out_s)
    st = res.run_features_file(str(pdir), out_r)
    assert st.sites == len(rows) + len(sparse_rows)
    assert open(out_r, "rb").read() == open(out_s, "rb").read()


@needs_native
def test_resident_packed_int8_band(dense_env, tmp_path):
    """int8 slab quantization (per-chunk scales) against the f16 packed-
    resident plane: same rows/order, probs inside the documented band."""
    feat, rows, _, ckpt, d = dense_env
    outs = {}
    for dt in ("float16", "int8"):
        eng = _engine(ckpt, transfer_dtype=dt, device_resident="always")
        eng._quant = dt == "int8"   # resolve_transfer_dtype never picks
        eng._rebuild_steps()        # int8 on the direct-attached CPU mesh
        out = str(tmp_path / f"o_{dt}.tsv")
        st = eng.run_features_file(feat, out)
        assert st.sites == len(rows)
        outs[dt] = [ln.split("\t")
                    for ln in open(out).read().splitlines()]
    a, b = outs["float16"], outs["int8"]
    assert [r[:6] for r in a] == [r[:6] for r in b]
    dp = [abs(float(ra[7]) - float(rb[7])) for ra, rb in zip(a, b)]
    agree = np.mean([ra[8] == rb[8] for ra, rb in zip(a, b)])
    assert np.mean(dp) < 5e-3, np.mean(dp)
    assert agree >= 0.97, agree


@needs_native
def test_resident_packed_multi_segment_padding(dense_env, tmp_path):
    """Small batches + capped K force multiple segments and a padded
    final segment; bytes still match the big-batch streaming engine run
    at the same device_batch."""
    feat, rows, _, ckpt, d = dense_env
    res = _engine(ckpt, device_batch=16, device_resident="always")
    res.RESIDENT_MAX_CHUNKS = 2
    stream = _engine(ckpt, device_batch=16)
    out_s = str(tmp_path / "s.tsv")
    out_r = str(tmp_path / "r.tsv")
    stream.run_features_file(feat, out_s)
    st = res.run_features_file(feat, out_r)
    assert st.sites == len(rows)
    prof = res.last_resident_profile
    assert prof["segments"] >= 2 and prof["k_chunks"] == 2
    assert open(out_r, "rb").read() == open(out_s, "rb").read()


@needs_native
def test_resident_packed_blob_single_device(dense_env, tmp_path):
    """Single-device engines ship each packed segment as ONE uint8 blob
    (static on-device slices + bitcasts unpack it); output must stay
    byte-identical to the multi-array mesh path and to streaming."""
    import jax

    from deepsignal_plant_tpu.models.convert import load_checkpoint
    from deepsignal_plant_tpu.parallel.mesh import make_mesh
    feat, rows, _, ckpt, d = dense_env
    _p, cfg = load_checkpoint(ckpt)
    mesh1 = make_mesh(jax.devices()[:1])
    res = CallModsEngine(
        ckpt, cfg.with_(dropout_rate=0.0),
        CallConfig(device_batch=64, transfer_dtype="float16",
                   packed_wire="force", device_resident="always"),
        mesh=mesh1)
    assert res._single
    stream = CallModsEngine(
        ckpt, cfg.with_(dropout_rate=0.0),
        CallConfig(device_batch=64, transfer_dtype="float16",
                   packed_wire="force"), mesh=mesh1)
    out_r = str(tmp_path / "r.tsv")
    out_s = str(tmp_path / "s.tsv")
    st = res.run_features_file(feat, out_r)
    stream.run_features_file(feat, out_s)
    assert st.sites == len(rows)
    assert res.last_resident_profile["plane"] == "packed"
    assert res._resident_blob_cache, "blob step never built"
    assert open(out_r, "rb").read() == open(out_s, "rb").read()


@needs_native
def test_resident_packed_blob_int8(dense_env, tmp_path):
    """Blob layout under int8 slabs (scales ride the blob tail): calls
    agree with the f16 blob plane within the quantization band."""
    import jax

    from deepsignal_plant_tpu.models.convert import load_checkpoint
    from deepsignal_plant_tpu.parallel.mesh import make_mesh
    feat, rows, _, ckpt, d = dense_env
    _p, cfg = load_checkpoint(ckpt)
    mesh1 = make_mesh(jax.devices()[:1])
    outs = {}
    for dt in ("float16", "int8"):
        eng = CallModsEngine(
            ckpt, cfg.with_(dropout_rate=0.0),
            CallConfig(device_batch=64, transfer_dtype=dt,
                       packed_wire="force", device_resident="always"),
            mesh=mesh1)
        eng._quant = dt == "int8"
        eng._rebuild_steps()
        out = str(tmp_path / f"b_{dt}.tsv")
        st = eng.run_features_file(feat, out)
        assert st.sites == len(rows)
        assert eng._resident_blob_cache
        outs[dt] = [ln.split("\t")
                    for ln in open(out).read().splitlines()]
    a, b = outs["float16"], outs["int8"]
    assert [r[:6] for r in a] == [r[:6] for r in b]
    dp = [abs(float(ra[7]) - float(rb[7])) for ra, rb in zip(a, b)]
    agree = np.mean([ra[8] == rb[8] for ra, rb in zip(a, b)])
    assert np.mean(dp) < 5e-3, np.mean(dp)
    assert agree >= 0.97, agree


@needs_native
def test_streaming_blob_dispatch_byte_identical(dense_env, tmp_path):
    """Single-device streaming engines dispatch each batch as ONE uint8
    blob (per-site and packed routes); outputs must stay byte-identical
    to the multi-array mesh engine on the same inputs."""
    import jax

    from deepsignal_plant_tpu.models.convert import load_checkpoint
    from deepsignal_plant_tpu.parallel.mesh import make_mesh
    feat, rows, _, ckpt, d = dense_env
    rng = np.random.default_rng(3)
    sparse = write_feature_file(str(tmp_path / "sparse.tsv"),
                                synth_feature_rows(rng, 3, 40))
    _p, cfg = load_checkpoint(ckpt)
    mesh1 = make_mesh(jax.devices()[:1])
    for name, src in (("dense", feat), ("sparse", sparse)):
        outs = {}
        for tag in ("blob", "args"):
            eng = CallModsEngine(
                ckpt, cfg.with_(dropout_rate=0.0),
                CallConfig(device_batch=64, transfer_dtype="float16"),
                mesh=mesh1)
            if tag == "args":
                # keep the single-device jitted steps but disable the
                # blob dispatch gate: the classic multi-arg transfers
                eng._single = False
            out = str(tmp_path / f"{name}_{tag}.tsv")
            eng.run_features_file(src, out)
            outs[tag] = open(out, "rb").read()
        assert outs["blob"] == outs["args"], name
    # int8 blob arm stays in the quantization band vs f16 blob
    outs = {}
    for dt in ("float16", "int8"):
        eng = CallModsEngine(
            ckpt, cfg.with_(dropout_rate=0.0),
            CallConfig(device_batch=64, transfer_dtype=dt), mesh=mesh1)
        eng._quant = dt == "int8"
        eng._rebuild_steps()
        out = str(tmp_path / f"i8_{dt}.tsv")
        eng.run_features_file(feat, out)
        outs[dt] = [ln.split("\t")
                    for ln in open(out).read().splitlines()]
    a, b = outs["float16"], outs["int8"]
    assert [r[:6] for r in a] == [r[:6] for r in b]
    dp = [abs(float(ra[7]) - float(rb[7])) for ra, rb in zip(a, b)]
    assert np.mean(dp) < 5e-3, np.mean(dp)


@needs_native
def test_resident_packed_rejects_signal_len_mismatch(dense_env, tmp_path):
    """A v3 dir mixing --signal_len extracts must fail loudly: the blob
    step's static offsets are built from the model's signal width, so a
    mismatched block would otherwise mis-slice into plausible garbage."""
    from deepsignal_plant_tpu.pipeline.extract import features_to_packed
    from deepsignal_plant_tpu.utils.formats import save_packed_npz
    feat, rows, feats_list, ckpt, d = dense_env
    pdir = tmp_path / "mixed_s"
    pdir.mkdir()
    pb = features_to_packed(feats_list)
    save_packed_npz(str(pdir / "000.npz"), pb)
    bad = features_to_packed(feats_list)
    bad.rect = np.concatenate([bad.rect, bad.rect[:, :4]], axis=1)
    save_packed_npz(str(pdir / "001.npz"), bad)
    res = _engine(ckpt, device_resident="always")
    with pytest.raises(ValueError, match="signal_len"):
        res.run_features_file(str(pdir), str(tmp_path / "x.tsv"))


@needs_native
def test_resident_sparse_single_device(dense_env, tmp_path):
    """Sparse inputs on a SINGLE-device resident engine ride per-site
    chunks dispatched as plain numpy args; output matches streaming."""
    import jax

    from deepsignal_plant_tpu.models.convert import load_checkpoint
    from deepsignal_plant_tpu.parallel.mesh import make_mesh
    feat, rows, _, ckpt, d = dense_env
    rng = np.random.default_rng(8)
    sparse = write_feature_file(str(tmp_path / "sp.tsv"),
                                synth_feature_rows(rng, 3, 50))
    _p, cfg = load_checkpoint(ckpt)
    mesh1 = make_mesh(jax.devices()[:1])
    outs = {}
    for mode in ("never", "always"):
        eng = CallModsEngine(
            ckpt, cfg.with_(dropout_rate=0.0),
            CallConfig(device_batch=32, transfer_dtype="float16",
                       packed_wire="auto", device_resident=mode),
            mesh=mesh1)
        eng.RESIDENT_MAX_CHUNKS = 2
        out = str(tmp_path / f"sp_{mode}.tsv")
        st = eng.run_features_file(sparse, out)
        assert st.sites == 150
        outs[mode] = open(out, "rb").read()
    assert outs["never"] == outs["always"]


def test_forward_tiled_ragged_matches_plain(monkeypatch):
    """forward_tiled with a non-multiple width must cover every row
    (scan prefix + narrow tail) and match the per-row plain forward."""
    import jax

    import deepsignal_plant_tpu.pipeline.call_mods as cm
    from deepsignal_plant_tpu.models.bilstm import (Batch, forward,
                                                    init_params)
    cfg = ModelConfig(hidden_size=16, dropout_rate=0.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    n = 21          # tile=8 -> 2 full chunks + ragged 5
    b = Batch(rng.integers(0, 4, (n, 13)).astype(np.int32),
              rng.normal(size=(n, 13)).astype(np.float32),
              np.abs(rng.normal(size=(n, 13))).astype(np.float32),
              rng.integers(1, 30, (n, 13)).astype(np.float32),
              rng.normal(size=(n, 13, 16)).astype(np.float32))
    monkeypatch.setattr(cm, "COMPUTE_TILE", 8)
    tiled = np.asarray(cm.forward_tiled(params, b, cfg))
    plain = np.asarray(forward(params, b, cfg, train=False)[1])
    assert tiled.shape == plain.shape == (n, 2)
    np.testing.assert_allclose(tiled, plain, atol=1e-6)
