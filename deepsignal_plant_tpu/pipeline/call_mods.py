"""call_mods — the flagship inference engine.

Reference behavior (call_modifications.py:532-640): read features (from a
TSV or straight from fast5s), run ModelBiLSTM, emit 10-column call rows.

TPU-native pipeline (one process per host, no mp queues):

    parse thread  ->  bounded prefetch  ->  jit step (batch sharded "dp")
                                              |  (async dispatch: step k+1
                                              v   launches while k computes)
                                          format+write thread

- Every step runs one compiled executable over a static
  ``device_batch``-row batch sharded across all local devices (model
  replicated). The final ragged batch is zero-padded and masked on output.
- Multi-host scaling is file-sharded exactly like the reference's
  multi-node story (SURVEY.md §5.8): each host calls its own shard of the
  input; outputs are merged downstream by call_freq / combine tools.
"""
from __future__ import annotations

import sys
import time
from contextlib import contextmanager
from dataclasses import dataclass

import jax
import numpy as np

from ..config import CallConfig, ModelConfig
from ..io.batching import (AsyncWriter, PrefetchIterator,
                           batches_from_features_file)
from ..models.bilstm import Batch, forward
from ..models.convert import load_any_checkpoint
from ..parallel.mesh import batch_sharding, local_batch_target, make_mesh
from ..utils.bases import CODE2BASE_DNA
from ..utils.formats import format_call_rows


def _quantize_field(a: np.ndarray) -> tuple[np.ndarray, float]:
    """Symmetric int8 quantization of one float array (native SIMD when
    available, numpy fallback)."""
    from ..utils.fastparse import quantize_int8
    native = quantize_int8(np.asarray(a))
    if native is not None:
        return native
    a32 = np.asarray(a, np.float32)
    amax = float(np.max(np.abs(a32))) if a32.size else 0.0
    scale = (amax / 127.0) or 1.0
    return np.clip(np.rint(a32 / scale), -127, 127).astype(np.int8), scale


def quantize_for_wire(batch: Batch):
    """int8 wire: symmetric per-batch-per-field quantization of the float
    features (means, stds, signals); signal_lens stay f16 (integer-valued,
    up to hundreds), kmer is int8 codes already. Returns the int8 Batch
    plus the (3,) f32 dequant scales the device step multiplies back.
    ~1.8x fewer wire bytes than f16 (507 -> 286 B/site) — the lever when
    a remote-attached link's aggregate MB/s, not the chip, bounds
    throughput. Worst-case added input noise is amax/254 per field.

    The hot pass runs in native code when available (SIMD + GIL-released,
    so concurrent dispatch threads actually overlap; the numpy fallback
    holds the GIL ~0.35 s per 32k-row batch and serialized the pool —
    the round-2 engine-level int8 regression)."""
    qm, sm = _quantize_field(batch.base_means)
    qs, ss = _quantize_field(batch.base_stds)
    qg, sg = _quantize_field(batch.signals)
    lens = batch.base_signal_lens
    if lens.dtype != np.float16:
        lens = lens.astype(np.float16)
    return (Batch(kmer=np.asarray(batch.kmer, np.int8), base_means=qm,
                  base_stds=qs, base_signal_lens=lens, signals=qg),
            np.array([sm, ss, sg], np.float32))


def resolve_transfer_dtype(requested: str, mesh) -> str:
    """Resolve transfer_dtype "auto" against the attachment of the mesh's
    devices: remote-attached links (the axon tunnel — detected via the
    backend's platform_version) are aggregate-MB/s-bound, where the int8
    wire measured +37% median end-to-end at 100.000% call agreement
    (docs/BENCH.md); directly-attached TPU/CPU backends get float16 (the
    link is ~free, so skip the bounded quantization noise entirely).
    int8 is only auto-selected when the native quantizer is available —
    the numpy fallback holds the GIL ~0.35 s/batch and is *slower* than
    f16 end-to-end (the regression this resolution exists to avoid)."""
    if requested != "auto":
        return requested
    from ..utils.fastparse import native_available
    if not native_available():
        return "float16"
    return "int8" if mesh_is_remote(mesh) else "float16"


def mesh_is_remote(mesh) -> bool:
    """True when the mesh's devices sit behind a remote-attached link
    (the axon tunnel, detected via the backend's platform_version) —
    i.e. host->device bytes ride a network hop instead of PCIe/ICI."""
    dev = mesh.devices.flat[0]
    try:
        return "axon" in getattr(dev.client, "platform_version", "")
    except Exception:
        return False


#: forward compute tile: batches wider than this run the forward in
#: COMPUTE_TILE-wide chunks inside the jitted step (lax.scan). Two
#: measured reasons (round 5): (1) 4096 is the MXU compute optimum of
#: the fused kernels (resident B-sweep: 997.6k at 4096 vs 944k at
#: 16384); (2) bf16 XLA tiling at 16384-wide forwards diverges enough
#: to flip confident trained-checkpoint calls (4/4493 flips, e.g. P1
#: 0.987 -> 0.039) while 2048/4096-wide forwards flip ZERO — chunking
#: pins the numerics to the 4096-wide program no matter how wide the
#: dispatch/wire unit grows (docs/BENCH.md round-5 "post-blob sweep").
COMPUTE_TILE = 4096


def forward_tiled(params, b: Batch, cfg):
    """Inference forward in <= COMPUTE_TILE-wide chunks: wide dispatch
    units amortize the relay's per-dispatch fees without changing the
    per-row numerics or leaving the MXU tiling optimum. Non-multiple
    widths scan the floor(n/tile) prefix and run the ragged tail as one
    narrow forward — no row ever sees a wider-than-tile program (the
    measured bf16 flip hazard lives in WIDE forwards; review r5)."""
    import jax.numpy as jnp
    n = b.kmer.shape[0]
    if n <= COMPUTE_TILE:
        return forward(params, b, cfg, train=False)[1]
    k, rem = divmod(n, COMPUTE_TILE)

    def body(carry, xs):
        return carry, forward(params, Batch(*xs), cfg, train=False)[1]

    head = n - rem
    _, probs = jax.lax.scan(
        body, None,
        tuple(a[:head].reshape((k, COMPUTE_TILE) + a.shape[1:])
              for a in b))
    probs = probs.reshape(head, probs.shape[-1])
    if rem:
        tail = forward(params, Batch(*(a[head:] for a in b)), cfg,
                       train=False)[1]
        probs = jnp.concatenate([probs, tail])
    return probs


def _blob_cut(blob, off, count, dt, width, shape):
    """Slice `count` elements of `width` bytes each off a uint8 blob at
    static offset `off` and bitcast to `dt` — the single unpack codec
    shared by every blob step (values bit-identical to the source
    arrays; layout must mirror _to_blob's concatenation order)."""
    seg = blob[off:off + count * width]
    if width > 1:
        seg = seg.reshape(count, width)
    arr = jax.lax.bitcast_convert_type(seg, dt)
    return arr.reshape(shape), off + count * width


def _check_packed_block(pb, seq_len: int, sig_len: int):
    """Per-block wire-compat validation shared by the streaming and
    resident packed planes: a dir mixing extract runs of different
    --seq_len/--signal_len must fail loudly, not gather wrong windows
    or mis-slice blobs silently."""
    if pb.kmer_len != seq_len:
        raise ValueError(
            "packed wire kmer_len {} != model seq_len {}".format(
                pb.kmer_len, seq_len))
    if pb.rect.shape[1] != sig_len:
        raise ValueError(
            "packed wire signal_len {} != model signal_len {}".format(
                pb.rect.shape[1], sig_len))
    return pb


def _take_packed_span(fifo, target, base_budget, seq_len, is_dense):
    """Consume dense blocks from `fifo` ([PackedFeatureBlock, consumed]
    deque) into ONE packed unit: up to `target` sites whose covering
    base span fits `base_budget`. Returns ((codes, means, stds, lens,
    rect, centers), segs, labels, ns, nbase) with the base axis
    UNPADDED and centers already rebased to the unit's base axis — the
    streaming and resident planes share this consumption logic and
    differ only in how they pad the result (pow2 menu vs static slab
    width), so the budget/rebase math cannot silently diverge between
    them (review r5)."""
    nb = (seq_len - 1) // 2
    segs = []
    cols = {k: [] for k in ("codes", "means", "stds", "lens",
                            "rect", "centers", "labels")}
    ns = nbase = 0
    while fifo and ns < target and is_dense(fifo[0][0]):
        ent = fifo[0]
        pb, lo = ent
        budget = base_budget - nbase
        if budget < seq_len:
            break
        centers = pb.centers
        b0 = int(centers[lo]) - nb
        hi = min(pb.n, lo + (target - ns))
        cnt = int(np.searchsorted(centers[lo:hi], b0 + budget - nb - 1,
                                  side="right"))
        if cnt == 0:
            break
        hi = lo + cnt
        b1 = int(centers[hi - 1]) + nb + 1
        cols["codes"].append(pb.codes[b0:b1])
        cols["means"].append(pb.means[b0:b1])
        cols["stds"].append(pb.stds[b0:b1])
        cols["lens"].append(pb.lens[b0:b1])
        cols["rect"].append(pb.rect[b0:b1])
        cols["centers"].append(centers[lo:hi].astype(np.int32)
                               + np.int32(nbase - b0))
        cols["labels"].append(pb.labels[lo:hi])
        segs.append((pb, lo, hi))
        nbase += b1 - b0
        ns += hi - lo
        if hi == pb.n:
            fifo.popleft()
        else:
            ent[1] = hi

    def cat(k):
        p = cols[k]
        return p[0] if len(p) == 1 else np.concatenate(p)
    arrays = tuple(cat(k) for k in ("codes", "means", "stds", "lens",
                                    "rect", "centers"))
    return arrays, segs, cat("labels"), ns, nbase


def _take_persite_span(fifo, target, is_dense):
    """Consume sparse blocks from `fifo` into one per-site unit of up to
    `target` rows (host window gather via window_index), row axis padded
    to `target`. Returns ((kmer, means, stds, lens, rect), segs, labels,
    ns). Shared by the streaming and resident planes (review r5)."""
    segs = []
    cols = {k: [] for k in ("kmer", "means", "stds", "lens", "rect",
                            "labels")}
    ns = 0
    while fifo and ns < target and not is_dense(fifo[0][0]):
        ent = fifo[0]
        pb, lo = ent
        hi = min(pb.n, lo + (target - ns))
        win = pb.window_index(lo, hi)
        cols["kmer"].append(pb.codes[win])
        cols["means"].append(pb.means[win])
        cols["stds"].append(pb.stds[win])
        cols["lens"].append(pb.lens[win])
        cols["rect"].append(pb.rect[win])
        cols["labels"].append(pb.labels[lo:hi])
        segs.append((pb, lo, hi))
        ns += hi - lo
        if hi == pb.n:
            fifo.popleft()
        else:
            ent[1] = hi

    def cat(k):
        p = cols[k]
        a = p[0] if len(p) == 1 else np.concatenate(p)
        if ns < target:
            a = np.pad(a, [(0, target - ns)] + [(0, 0)] * (a.ndim - 1))
        return a
    arrays = tuple(cat(k) for k in ("kmer", "means", "stds", "lens",
                                    "rect"))
    labels = (cols["labels"][0] if len(cols["labels"]) == 1
              else np.concatenate(cols["labels"]))
    return arrays, segs, labels, ns


def _start_fetch(arr):
    """Complete the device->host readback inside the dispatch worker
    thread so consecutive round trips overlap each other (and in-flight
    dispatches). Measured on the remote-attached rig: the serialized
    main-thread fetch was ~0.25-0.38 s per batch — the pipeline's binding
    stage; `copy_to_host_async` is a no-op through the tunnel, so the
    worker blocks on the full copy instead."""
    return np.asarray(arr)


@dataclass
class CallStats:
    sites: int = 0
    batches: int = 0
    seconds: float = 0.0
    # accuracy of called labels vs the features' label column — meaningful
    # only on labeled features (reference computes this per batch,
    # call_modifications.py:171-173; its report print is commented out at
    # :257-258, so we report the exact global equivalent instead)
    label_correct: int = 0
    # dispatch-stall annotation (VERDICT r4 item 5): over the tunneled
    # backend a weather storm can freeze one dispatch for minutes and
    # silently poison a whole run's sites/s (BENCH_r04 tsv_passes[6] =
    # 28k in a 280k run). The engine's watchdog counts dispatches whose
    # device round trip exceeded the stall threshold and the total
    # excess seconds, so callers (bench.py) can tell a storm session
    # from a regression instead of absorbing it into a median.
    stall_events: int = 0
    stall_seconds: float = 0.0

    @property
    def sites_per_s(self) -> float:
        return self.sites / self.seconds if self.seconds else 0.0

    @property
    def stalled(self) -> bool:
        return self.stall_events > 0

    @property
    def label_accuracy(self) -> float:
        return self.label_correct / self.sites if self.sites else 0.0


class StallWatchdog:
    """Per-run dispatch timer: flags device round trips that blow past
    max(abs_floor_s, ratio x running median). Thread-safe enough for the
    dispatch pool (GIL-atomic appends; the median is advisory)."""

    def __init__(self, abs_floor_s: float = 5.0, ratio: float = 8.0):
        self.abs_floor_s = abs_floor_s
        self.ratio = ratio
        self.durations: list[float] = []
        self.stall_events = 0
        self.stall_seconds = 0.0

    def threshold(self) -> float:
        d = self.durations
        if len(d) >= 4:
            med = sorted(d)[len(d) // 2]
            return max(self.abs_floor_s, self.ratio * med)
        return max(self.abs_floor_s, 30.0)   # cold: compiles are slow

    @contextmanager
    def track(self):
        thr = self.threshold()
        t0 = time.time()
        yield
        dt = time.time() - t0
        self.durations.append(dt)
        if dt > thr:
            self.stall_events += 1
            self.stall_seconds += dt - thr
            sys.stderr.write(
                "[warn] dispatch stall: one device round trip took "
                "{:.1f}s (threshold {:.1f}s) — tunnel/backend storm, "
                "not a workload property\n".format(dt, thr))

    def fill(self, stats: "CallStats") -> "CallStats":
        stats.stall_events = self.stall_events
        stats.stall_seconds = round(self.stall_seconds, 3)
        return stats


def _estimate_rows(input_path: str) -> int | None:
    """Cheap row-count estimate of a features input (TSV or npz set):
    file size / sampled bytes-per-row. None when not estimable (gzip,
    empty)."""
    import os

    from ..utils.formats import feature_npz_paths
    npz_files = feature_npz_paths(input_path)
    if npz_files is not None:
        try:
            with np.load(npz_files[0]) as z:
                per_file = int(z["labels"].shape[0])
            return per_file * len(npz_files)
        except Exception:
            return None
    if input_path.endswith(".gz") or not os.path.isfile(input_path):
        return None
    size = os.path.getsize(input_path)
    if size == 0:
        return 0
    with open(input_path, "rb") as fh:
        sample = fh.read(1 << 18)
    nl = sample.count(b"\n")
    if nl == 0:
        return 1
    return int(size / (len(sample) / nl)) + 1


class CallModsEngine:
    """Loads a checkpoint once and serves jitted batch inference."""

    #: auto device_batch search space: powers of two keep the jit shape
    #: cache small across runs; 2048 bounds padding waste on tiny inputs.
    #: 16384 is the measured post-blob sweet spot on the REMOTE-attached
    #: rig: single-blob dispatch (round 5) collapsed the per-dispatch
    #: transfer fees that made small units win rounds 3-4 (4096 was the
    #: pre-blob optimum at 318k), so fewer, larger units now amortize
    #: the remaining fixed costs better — interleaved same-session
    #: sweeps (131k rows, blob wire) measured medians 298k at 4096,
    #: 334-341k at 8192, 343-347k (best 374k) at 16384, 314k at 32768;
    #: docs/BENCH.md "post-blob device_batch sweep, round 5".
    #: Direct-attached chips have no round-trip to amortize, so the
    #: auto cap stays at the large-batch 32768 there (mirroring
    #: resolve_transfer_dtype's attachment branch; ADVICE r3).
    AUTO_MAX_BATCH_REMOTE = 16384
    AUTO_MAX_BATCH_DIRECT = 32768
    AUTO_MIN_BATCH = 2048

    def __init__(self, model_path: str, model_cfg: ModelConfig,
                 call_cfg: CallConfig | None = None, mesh=None):
        self.model_cfg = model_cfg.with_(dropout_rate=0.0)
        self.call_cfg = call_cfg or CallConfig()
        self.mesh = mesh if mesh is not None else make_mesh()
        if self.call_cfg.transfer_dtype == "auto":
            from dataclasses import replace
            self.call_cfg = replace(
                self.call_cfg,
                transfer_dtype=resolve_transfer_dtype("auto", self.mesh))
        # device_batch None/0 = auto: sized per input in run_features_file
        self._auto_max_batch = (self.AUTO_MAX_BATCH_REMOTE
                                if mesh_is_remote(self.mesh)
                                else self.AUTO_MAX_BATCH_DIRECT)
        requested = self.call_cfg.device_batch or self._auto_max_batch
        self.device_batch = local_batch_target(requested, self.mesh)
        self._auto_batch = not self.call_cfg.device_batch
        self.params = jax.device_put(
            load_any_checkpoint(model_path, self.model_cfg))
        # single-device meshes take the plain jit path: XLA's SPMD
        # partitioner adds minutes of compile latency for zero benefit
        self._single = self.mesh.devices.size == 1
        self._sharding = None if self._single else batch_sharding(self.mesh)

        import threading
        self._fallback_lock = threading.Lock()
        self._fell_back = False
        self._quant = self.call_cfg.transfer_dtype == "int8"
        self._rebuild_steps()

    def _rebuild_steps(self):
        # jit wrappers are lazy — only the variant actually called compiles
        self._step = self._build_step()
        self._step_q = self._build_step(quantized=True)
        self._step_packed = self._build_packed_step()
        self._step_packed_q = self._build_packed_step(quantized=True)
        self._step_resident = self._build_resident_step()
        self._step_resident_packed = self._build_resident_packed_step()
        self._step_resident_packed_q = self._build_resident_packed_step(
            quantized=True)
        # run-shaped blob steps (single-transfer packed-resident) are
        # cached per (k, nb_width, target, S, quant, wire); cleared here
        # so the pallas->scan fallback rebuilds them too
        self._resident_blob_cache = {}

    def _build_step(self, quantized: bool = False):
        cfg = self.model_cfg

        if quantized:
            import jax.numpy as jnp

            def _step(params, batch: Batch, scales):
                sig = batch.signals.astype(jnp.float32) * scales[2]
                b = Batch(
                    kmer=batch.kmer,
                    base_means=batch.base_means.astype(jnp.float32)
                    * scales[0],
                    base_stds=batch.base_stds.astype(jnp.float32)
                    * scales[1],
                    base_signal_lens=batch.base_signal_lens,
                    signals=sig)
                return forward_tiled(params, b, cfg)
        else:
            def _step(params, batch: Batch):
                return forward_tiled(params, batch, cfg)

        if self._single:
            return jax.jit(_step)
        # multi-device: explicit SPMD via shard_map — each device runs the
        # whole forward (pallas kernels included; GSPMD cannot partition an
        # opaque pallas_call) on its local batch shard. Parity tests:
        # tests/test_pallas_shardmap.py
        from jax.sharding import PartitionSpec as P
        axis = self.mesh.axis_names[0]
        in_specs = (P(), P(axis)) + ((P(),) if quantized else ())
        return jax.jit(jax.shard_map(
            _step, mesh=self.mesh, in_specs=in_specs,
            out_specs=P(axis), check_vma=False))

    def _build_packed_step(self, quantized: bool = False):
        """Step over the read-packed wire: gather each site's kmer window
        from the deduplicated per-base arrays ON DEVICE, then run the
        normal forward — the wire carries each base once instead of up to
        seq_len times (PackedFeatureBlock docstring has the math)."""
        import jax.numpy as jnp
        cfg = self.model_cfg
        nb = (cfg.seq_len - 1) // 2

        def _gather_forward(params, codes, means, stds, lens, rect,
                            centers):
            win = centers[:, None] + jnp.arange(
                -nb, nb + 1, dtype=centers.dtype)[None, :]
            b = Batch(kmer=jnp.take(codes, win, axis=0),
                      base_means=jnp.take(means, win, axis=0),
                      base_stds=jnp.take(stds, win, axis=0),
                      base_signal_lens=jnp.take(lens, win, axis=0),
                      signals=jnp.take(rect, win, axis=0))
            return forward_tiled(params, b, cfg)

        if quantized:
            def _step(params, codes, means, stds, lens, rect, centers,
                      scales):
                # dequantize on the deduplicated base axis — cheaper than
                # after the window gather
                r = rect.astype(jnp.float32) * scales[2]
                return _gather_forward(
                    params, codes, means.astype(jnp.float32) * scales[0],
                    stds.astype(jnp.float32) * scales[1], lens, r,
                    centers)
        else:
            _step = _gather_forward

        if self._single:
            return jax.jit(_step)
        # sites shard over the mesh; the packed base arrays are replicated
        # (each device gathers its site shard's windows from the full base
        # axis). Replication multiplies base bytes by mesh size — on an
        # n-device mesh packed wins the *wire* only when bases-per-site
        # < ~13/n — but multi-device hosts are directly attached (the
        # link is ~free) and the packed step still skips the host-side
        # 13x window materialization, which is what binds there.
        from jax.sharding import PartitionSpec as P
        axis = self.mesh.axis_names[0]
        in_specs = (P(),) * 6 + (P(axis),) + ((P(),) if quantized else ())
        return jax.jit(jax.shard_map(
            _step, mesh=self.mesh, in_specs=in_specs,
            out_specs=P(axis), check_vma=False))

    def predict_probs(self, fb) -> np.ndarray:
        """Run one (already padded) FeatureBatch -> (N, 2) float32 probs."""
        if self.call_cfg.transfer_dtype in ("float16", "int8"):
            # shrink the host->device wire format: int8 base codes + f16
            # floats (values are 6-decimal-rounded, |x| < ~1e3; f16 rel
            # error ~5e-4 is far below call-decision scale). The native
            # parser can emit this layout directly (out_dtype="float16"),
            # in which case the casts below are no-ops skipped entirely.
            if fb.signals.dtype == np.float16:
                batch = Batch(kmer=fb.kmer, base_means=fb.base_means,
                              base_stds=fb.base_stds,
                              base_signal_lens=fb.base_signal_lens,
                              signals=fb.signals)
            else:
                batch = Batch(kmer=fb.kmer.astype(np.int8),
                              base_means=fb.base_means.astype(np.float16),
                              base_stds=fb.base_stds.astype(np.float16),
                              base_signal_lens=fb.base_signal_lens.astype(
                                  np.float16),
                              signals=fb.signals.astype(np.float16))
        else:
            batch = Batch(kmer=fb.kmer, base_means=fb.base_means,
                          base_stds=fb.base_stds,
                          base_signal_lens=fb.base_signal_lens,
                          signals=fb.signals)
        return self._predict(batch)

    def _predict(self, batch: Batch):
        """Dispatch one wire-ready Batch (with the pallas->scan runtime
        fallback). int8 mode quantizes here, in the calling dispatch
        thread, so the host-side passes overlap in-flight transfers."""
        scales = None
        if self._quant:
            batch, scales = quantize_for_wire(batch)
        if self._single and self.call_cfg.transfer_dtype != "float32":
            # one blob = one relay transfer per dispatch (vs 5-6 per-arg
            # transfers); bit-identical values (_persite_blob_step)
            ft = np.int8 if scales is not None else np.float16
            parts = [np.asarray(batch.kmer, np.int8),
                     np.asarray(batch.base_means, ft),
                     np.asarray(batch.base_stds, ft),
                     np.asarray(batch.base_signal_lens, np.float16),
                     np.asarray(batch.signals, ft)]
            if scales is not None:
                parts.append(np.asarray(scales, np.float32))
            blob = self._to_blob(parts)
            b, L = batch.kmer.shape
            key = ("ps", b, L, batch.signals.shape[-1],
                   scales is not None)
            return self._run_with_fallback(
                lambda: self._persite_blob_step(key)(self.params, blob))
        if self._sharding is not None:
            batch = jax.device_put(batch, self._sharding)

        def _run():
            if scales is not None:
                return self._step_q(self.params, batch, scales)
            return self._step(self.params, batch)

        return self._run_with_fallback(_run)

    def _run_with_fallback(self, run):
        """Run a dispatch with the pallas -> scan runtime fallback."""
        try:
            return run()
        except Exception as exc:
            # concurrent dispatch threads may fail together: the first one
            # rebuilds under the lock, the rest just retry the new step.
            # The pre-lock check must consider _fell_back, not only the
            # current recurrence: a thread whose pallas dispatch fails
            # AFTER another thread already flipped the config to scan
            # would otherwise observe recurrence=="scan" and re-raise
            # instead of retrying (TOCTOU).
            if self.model_cfg.recurrence != "pallas" and \
                    not self._fell_back:
                raise
            with self._fallback_lock:
                if self.model_cfg.recurrence == "pallas":
                    print("[warn] pallas recurrence failed ({}: {}); "
                          "falling back to scan".format(
                              type(exc).__name__, exc))
                    self.model_cfg = self.model_cfg.with_(recurrence="scan")
                    self._fell_back = True
                    self._rebuild_steps()
            return run()

    def _predict_packed(self, arrays):
        """Dispatch one read-packed batch (codes, means, stds, lens, rect,
        centers); int8 mode quantizes the deduplicated base arrays here in
        the calling dispatch thread."""
        codes, means, stds, lens, rect, centers = arrays
        if self._quant:
            qm, sm = _quantize_field(means)
            qs, ss = _quantize_field(stds)
            qr, sr = _quantize_field(rect)
            scales = np.array([sm, ss, sr], np.float32)
            if self._single:
                blob = self._to_blob(
                    (np.asarray(codes, np.int8), qm, qs,
                     np.asarray(lens, np.float16), qr,
                     np.asarray(centers, np.int32), scales))
                key = ("pk1", len(codes), len(centers), rect.shape[-1],
                       True)
                return self._run_with_fallback(
                    lambda: self._packed1_blob_step(key)(self.params,
                                                         blob))

            def _run():
                # resolve the step attribute INSIDE the retry: the
                # pallas->scan fallback swaps these via _rebuild_steps,
                # and an early-bound local would retry the stale
                # pallas-compiled step (and fail again)
                return self._step_packed_q(self.params, codes, qm, qs,
                                           lens, qr, centers, scales)

            return self._run_with_fallback(_run)
        if self._single and self.call_cfg.transfer_dtype != "float32":
            blob = self._to_blob(
                (np.asarray(codes, np.int8),
                 np.asarray(means, np.float16),
                 np.asarray(stds, np.float16),
                 np.asarray(lens, np.float16),
                 np.asarray(rect, np.float16),
                 np.asarray(centers, np.int32)))
            key = ("pk1", len(codes), len(centers), rect.shape[-1],
                   False)
            return self._run_with_fallback(
                lambda: self._packed1_blob_step(key)(self.params, blob))
        return self._run_with_fallback(
            lambda: self._step_packed(self.params, codes, means, stds,
                                      lens, rect, centers))

    def _resolve_target(self, input_path: str) -> int:
        """Auto device_batch: next power of two covering the estimated row
        count, clamped to [AUTO_MIN_BATCH, the attachment-aware
        AUTO_MAX_BATCH_REMOTE 16384 / _DIRECT 32768] — tiny inputs
        skip full-width padding, big inputs get the fee-amortizing
        width (the forward itself always runs in COMPUTE_TILE-wide
        chunks — see forward_tiled). Explicit --device_batch wins."""
        if not self._auto_batch:
            return self.device_batch
        est = _estimate_rows(input_path)
        if est is None:
            return self.device_batch
        t = self.AUTO_MIN_BATCH
        while t < est and t < self._auto_max_batch:
            t *= 2
        return local_batch_target(t, self.mesh)

    def _run_fast_tsv(self, input_path: str, result_path: str,
                      is_gzip: bool, target: int) -> CallStats:
        """Zero-Python-strings TSV path: the native parser keeps byte
        spans for cols 0-5, batches are assembled from array views, and
        complete output rows are emitted natively (memcpy'd info prefix +
        computed suffix). No per-row Python objects exist anywhere.

        Parsed rows are repacked into the read-packed wire in the same
        worker pass (dsp_pack_rows): reference TSVs group rows by read,
        so adjacent sites' windows overlap and the dedup cuts wire bytes
        ~3x at dense-motif density. The pack is byte-verified per row —
        any row order stays byte-identical — and _run_fast_packed's
        density check falls back to the original per-site windows (the
        block rides along as ``src``) when the input doesn't pack."""
        from ..io.batching import (bounded_thread_map,
                                   default_parse_workers, iter_byte_blocks)
        from ..utils.fastparse import pack_raw_block, parse_raw_feature_block
        cfg = self.model_cfg

        def parse_and_pack(raw):
            rb = parse_raw_feature_block(raw, cfg.seq_len, cfg.signal_len)
            return pack_raw_block(rb)

        pw = self.call_cfg.num_parse_workers or default_parse_workers()
        blocks = bounded_thread_map(parse_and_pack,
                                    iter_byte_blocks(input_path, 8 << 20),
                                    workers=pw, depth=2 * pw)
        return self._run_fast_packed(blocks, result_path, is_gzip, target)

    def _run_fast_wire_npz(self, npz_files: list, result_path: str,
                           is_gzip: bool, target: int) -> CallStats:
        """Wire-format .npz batches -> calls: zero parsing anywhere (the
        container already holds the f16 transfer layout + info blob)."""
        from ..io.batching import bounded_thread_map, default_parse_workers
        from ..utils.formats import load_wire_npz
        # ONE loader worker, depth-4 prefetch: npz loading is raw zip
        # reads + frombuffer (single-threaded 1.4-4M rows/s, far above
        # the device rate) and COLLAPSES ~4x under a thread pool (GIL
        # thrash, measured in benchmarks/loader_ab.py) — pooling the
        # loader was why the binary planes trailed TSV in rounds 2-3
        blocks = bounded_thread_map(load_wire_npz, npz_files, workers=1,
                                    depth=4)
        return self._run_fast(blocks, result_path, is_gzip, target)

    def _run_fast(self, raw_blocks, result_path: str, is_gzip: bool,
                  target: int) -> CallStats:
        from collections import deque

        from ..io.batching import PrefetchIterator, bounded_thread_map
        from ..utils.fastparse import emit_call_rows
        from ..utils.prof import PROFILER
        stats = CallStats()
        t0 = time.time()
        blocks = PrefetchIterator(raw_blocks, depth=4)
        writer = AsyncWriter(result_path, is_gzip)

        def gen_batches():
            """Yield (Batch, segments, labels, n_valid) with segments =
            [(RawFeatureBlock, lo, hi)] covering the batch rows in
            order."""
            fifo: deque = deque()   # [rb, consumed]
            pending = 0

            def take(nrows: int, pad_to: int | None):
                segs = []
                need = nrows
                while need:
                    ent = fifo[0]
                    rb, lo = ent
                    k = min(need, rb.n - lo)
                    segs.append((rb, lo, lo + k))
                    ent[1] += k
                    if ent[1] == rb.n:
                        fifo.popleft()
                    need -= k
                parts = lambda name: [getattr(rb, name)[a:b]  # noqa: E731
                                      for rb, a, b in segs]
                cat = (lambda name: parts(name)[0]            # noqa: E731
                       if len(segs) == 1 else
                       np.concatenate(parts(name)))
                kmer = cat("kmer")
                means = cat("means")
                stds = cat("stds")
                slens = cat("slens")
                signals = cat("signals")
                labels = cat("labels")
                if pad_to is not None and pad_to > nrows:
                    p = pad_to - nrows

                    def _pad(a):
                        w = [(0, p)] + [(0, 0)] * (a.ndim - 1)
                        return np.pad(a, w)
                    kmer, means, stds, slens, signals = map(
                        _pad, (kmer, means, stds, slens, signals))
                batch = Batch(kmer=kmer, base_means=means, base_stds=stds,
                              base_signal_lens=slens, signals=signals)
                return batch, segs, labels, nrows

            for rb in blocks:
                if rb.n == 0:
                    continue
                fifo.append([rb, 0])
                pending += rb.n
                while pending >= target:
                    pending -= target
                    yield take(target, None)
            if pending:
                yield take(pending, target)

        wd = StallWatchdog()

        def _dispatch(item):
            batch, segs, labels, nv = item
            with PROFILER.stage("dispatch", nv), wd.track():
                return _start_fetch(self._predict(batch)), segs, labels, nv

        for probs, segs, labels, nv in bounded_thread_map(
                _dispatch, gen_batches(),
                workers=self.call_cfg.dispatch_workers,
                depth=2 * self.call_cfg.dispatch_workers):
            with PROFILER.stage("fetch", nv):
                probs = np.asarray(probs)[:nv]
            with PROFILER.stage("format", nv):
                off = 0
                out = []
                for rb, lo, hi in segs:
                    out.append(emit_call_rows(rb, lo, hi,
                                              probs[off:off + hi - lo]))
                    off += hi - lo
                writer.write_bytes(b"".join(out))
            stats.sites += nv
            stats.batches += 1
            called = probs[:, 1] > probs[:, 0]
            stats.label_correct += int((called == (labels == 1)).sum())
        writer.close()
        stats.seconds = time.time() - t0
        wd.fill(stats)
        return stats

    #: beyond this many bases per site the window dedup no longer pays on
    #: the wire (per-site windows re-ship each base ~seq_len/density
    #: times); sparse inputs fall back to host-side windows
    PACKED_MAX_BASES_PER_SITE = 12.0

    def packed_density_threshold(self) -> float:
        """Max bases/site for which the packed plane is kept, per mesh.

        Single device: the wire comparison is 1x base bytes vs seq_len/
        density per-site copies — packed wins up to ~seq_len (threshold
        12). On an n-device mesh the packed step REPLICATES the base
        arrays (each device gathers its site shard's windows from the
        full base axis, _build_packed_step), so packed ships
        density*n base-rows per site vs the per-site plane's seq_len:
        byte parity at density = seq_len/n. A user staging npz_packed
        for an 8-chip host behind a REMOTE-ATTACHED link would otherwise
        silently ship ~8x bases — blocks past the threshold route to
        the per-site step instead (host window gather, batch sharded
        P(axis); _run_fast_packed's take_persite), per BLOCK, so dense
        blocks on a small remote mesh (density < seq_len/n) still get
        the dedup win. On DIRECT-attached multi-device hosts the
        tightening does not apply: PCIe/ICI makes wire bytes ~free
        there, and the packed step's real win on those rigs is skipping
        the host-side 13x window materialization (_build_packed_step's
        comment) — the resource that actually binds."""
        if self.call_cfg.packed_wire == "force":
            return float("inf")
        if self.call_cfg.packed_wire == "off":
            return 0.0
        n = self.mesh.devices.size
        if n == 1 or not mesh_is_remote(self.mesh):
            return self.PACKED_MAX_BASES_PER_SITE
        return min(self.PACKED_MAX_BASES_PER_SITE,
                   self.model_cfg.seq_len / n)

    def _run_fast_packed(self, packed_blocks, result_path: str,
                         is_gzip: bool, target: int) -> CallStats:
        """Read-packed wire -> calls: upload deduplicated per-base arrays
        + int32 site centers and gather the kmer windows on device. For
        dense motifs (plant C/CHH) this ships ~1/3 the bytes of the
        per-site wire — the binding resource on remote-attached links."""
        from collections import deque
        from itertools import chain

        from ..io.batching import bounded_thread_map
        from ..utils.fastparse import emit_call_rows_arrays
        from ..utils.prof import PROFILER

        seq_len = self.model_cfg.seq_len

        # every block, not just the first: a dir mixing extract runs
        # of different --seq_len/--signal_len must fail loudly
        sig_len = self.model_cfg.signal_len
        it = (_check_packed_block(pb, seq_len, sig_len)
              for pb in iter(packed_blocks)
              if pb is not None and pb.n)
        first = next(it, None)
        if first is None:
            AsyncWriter(result_path, is_gzip).close()
            return CallStats()
        thr = self.packed_density_threshold()
        if thr == 0.0:
            # packed wire disabled (--packed_wire off): per-site plane
            return self._run_fast(
                (pb.to_raw_block() for pb in chain([first], it)),
                result_path, is_gzip, target)
        # Per-BLOCK density routing (round-3 verdict: block 0 used to
        # decide the plane for the whole run). Each block picks the
        # cheaper wire for THIS mesh: dense blocks (density <= thr) keep
        # the deduplicated base axis + on-device window gather (ships
        # density — or density*n on replicated multi-device meshes —
        # base-rows per site); sparse blocks gather their windows on
        # host and ride the per-site step (batch sharded P(axis),
        # seq_len rows per site regardless of mesh size). Both steps'
        # dispatches interleave in one loop — batches are just
        # route-homogeneous — so a mixed or unrepresentative stream
        # never flips the run. Under float16/float32 transfer, output
        # bytes are independent of the per-block choice (same window
        # values into the same forward, gathered on device or on host).
        # Under --wire_dtype int8 the routes may differ in the ~1e-3
        # band: the packed route quantizes the deduplicated base slice
        # (per-batch amax over bases, including gap bases no window
        # gathers) while the per-site route quantizes gathered windows,
        # and batch boundaries differ per route — so per-batch scales,
        # and hence probs, can differ between auto/force/off (pinned by
        # the int8 arm of test_sparse_first_block_does_not_flip_run).
        stream = chain([first], it)

        nb = (seq_len - 1) // 2
        # Per-batch base-axis widths from a pow2 menu: each batch pads its
        # base axis up to the smallest power of two >= its bases (floor
        # 4096), bounded by nb_max = next_pow2(target sites, all windows
        # materialized). Replaces round 3's single static cap sized from
        # block 0's density — an unrepresentative first block no longer
        # under/over-sizes every batch, and the jit cache holds at most
        # log2(nb_max/4096)+1 shape variants.
        nb_max = 1 << (target * seq_len - 1).bit_length()

        stats = CallStats()
        t0 = time.time()
        writer = AsyncWriter(result_path, is_gzip)

        def is_dense(pb) -> bool:
            return pb.n_bases <= thr * pb.n

        def gen_batches():
            """Yield route-homogeneous batches:
            ("packed", (codes, means, stds, lens, rect, centers), segs,
            labels, n_valid) or ("persite", Batch, segs, labels,
            n_valid). A batch closes when the site target fills, the
            base cap fills (packed route), or the next block's route
            differs. centers stay valid under padding (pad value nb
            gathers a real — discarded — window)."""
            fifo: deque = deque()     # [pb, consumed_sites]
            pending = 0
            exhausted = False

            def fill():
                nonlocal pending, exhausted
                while not exhausted and pending < target:
                    pb = next(stream, None)
                    if pb is None:
                        exhausted = True
                        return
                    fifo.append([pb, 0])
                    pending += pb.n

            def take_packed():
                nonlocal pending
                # shared consumption core (_take_packed_span); this
                # plane pads the base axis up the pow2 menu per batch
                arrays, segs, labels, ns, nbase = _take_packed_span(
                    fifo, target, nb_max, seq_len, is_dense)
                pending -= ns
                codes, means, stds, lens, rect, centers = arrays
                pad_b = max(4096, 1 << (nbase - 1).bit_length()) - nbase
                if pad_b:
                    codes = np.pad(codes, (0, pad_b))
                    means = np.pad(means, (0, pad_b))
                    stds = np.pad(stds, (0, pad_b))
                    lens = np.pad(lens, (0, pad_b))
                    rect = np.pad(rect, ((0, pad_b), (0, 0)))
                if ns < target:
                    centers = np.pad(centers, (0, target - ns),
                                     constant_values=nb)
                return ("packed",
                        (codes, means, stds, lens, rect, centers), segs,
                        labels, ns)

            def take_persite():
                nonlocal pending
                arrays, segs, labels, ns = _take_persite_span(
                    fifo, target, is_dense)
                pending -= ns
                return ("persite", Batch(*arrays), segs, labels, ns)

            while True:
                fill()
                if not fifo:
                    return
                yield (take_packed() if is_dense(fifo[0][0])
                       else take_persite())

        wd = StallWatchdog()

        def _dispatch(item):
            route, payload, segs, labels, nv = item
            with PROFILER.stage("dispatch", nv), wd.track():
                probs = (self._predict_packed(payload)
                         if route == "packed" else self._predict(payload))
                return _start_fetch(probs), segs, labels, nv

        for probs, segs, labels, nv in bounded_thread_map(
                _dispatch, gen_batches(),
                workers=self.call_cfg.dispatch_workers,
                depth=2 * self.call_cfg.dispatch_workers):
            with PROFILER.stage("fetch", nv):
                probs = np.asarray(probs)[:nv]
            with PROFILER.stage("format", nv):
                off = 0
                out = []
                for pb, lo, hi in segs:
                    kmer = pb.codes[pb.window_index(lo, hi)]
                    out.append(emit_call_rows_arrays(
                        pb.raw, pb.row_starts[lo:hi], pb.info_ends[lo:hi],
                        kmer, probs[off:off + hi - lo]))
                    off += hi - lo
                writer.write_bytes(b"".join(out))
            stats.sites += nv
            stats.batches += 1
            called = probs[:, 1] > probs[:, 0]
            stats.label_correct += int((called == (labels == 1)).sum())
        writer.close()
        stats.seconds = time.time() - t0
        wd.fill(stats)
        return stats

    #: resident-plane scan length cap: one dispatch covers up to
    #: RESIDENT_MAX_CHUNKS * device_batch rows (the jit cache holds one
    #: executable per distinct K; powers of two bound the variants)
    RESIDENT_MAX_CHUNKS = 32

    def _build_resident_step(self):
        """One dispatch over a whole resident segment: (K, B, ...) arrays
        already in HBM, a lax.scan runs the forward K times -> (K, B, 2)
        probs. No host->device traffic inside the timed window — this is
        the plane that measures the CHIP-bound inference ceiling (the
        streaming planes pay a per-dispatch wire that the remote tunnel
        distorts; docs/BENCH.md 'resident inference')."""
        cfg = self.model_cfg

        def _run(params, kmer, means, stds, lens, signals):
            def body(carry, xs):
                b = Batch(*xs)
                return carry, forward_tiled(params, b, cfg)
            _, probs = jax.lax.scan(
                body, None, (kmer, means, stds, lens, signals))
            return probs

        if self._single:
            return jax.jit(_run)
        from jax.sharding import PartitionSpec as P
        axis = self.mesh.axis_names[0]
        in_specs = (P(),) + (P(None, axis),) * 5
        return jax.jit(jax.shard_map(
            _run, mesh=self.mesh, in_specs=in_specs,
            out_specs=P(None, axis), check_vma=False))

    def _build_resident_packed_step(self, quantized: bool = False):
        """Resident segment over the read-packed wire: per scan chunk the
        deduplicated base slab (NB bases) rides HBM instead of the B x
        seq_len per-site windows, and the kmer windows are gathered ON
        DEVICE inside the scan body. Cuts the resident upload to
        ~bases-per-site/seq_len of the per-site bytes — the lever for the
        resident plane's END-TO-END rate, which is upload-bound on
        remote-attached links (docs/BENCH.md round-4: resident e2e 72k vs
        285k streaming; the compute window itself is unchanged ~1M/s).
        Per-chunk arrays: codes (K, NB) int8, means/stds (K, NB) wire,
        lens (K, NB) f16, rect (K, NB, S) wire, centers (K, B) int32
        [, scales (K, 3) f32 when quantized]."""
        import jax.numpy as jnp
        cfg = self.model_cfg
        nb = (cfg.seq_len - 1) // 2

        def _gather_forward(params, codes, means, stds, lens, rect,
                            centers):
            win = centers[:, None] + jnp.arange(
                -nb, nb + 1, dtype=centers.dtype)[None, :]
            b = Batch(kmer=jnp.take(codes, win, axis=0),
                      base_means=jnp.take(means, win, axis=0),
                      base_stds=jnp.take(stds, win, axis=0),
                      base_signal_lens=jnp.take(lens, win, axis=0),
                      signals=jnp.take(rect, win, axis=0))
            return forward_tiled(params, b, cfg)

        if quantized:
            def _run(params, codes, means, stds, lens, rect, centers,
                     scales):
                def body(carry, xs):
                    cod, m, s, ln, r, c, sc = xs
                    # dequantize on the deduplicated base axis, per chunk
                    return carry, _gather_forward(
                        params, cod, m.astype(jnp.float32) * sc[0],
                        s.astype(jnp.float32) * sc[1], ln,
                        r.astype(jnp.float32) * sc[2], c)
                _, probs = jax.lax.scan(
                    body, None,
                    (codes, means, stds, lens, rect, centers, scales))
                return probs
        else:
            def _run(params, codes, means, stds, lens, rect, centers):
                def body(carry, xs):
                    return carry, _gather_forward(params, *xs)
                _, probs = jax.lax.scan(
                    body, None, (codes, means, stds, lens, rect, centers))
                return probs

        if self._single:
            return jax.jit(_run)
        # slabs replicated, site centers sharded (as _build_packed_step;
        # packed_density_threshold already tightens routing on remote
        # multi-device meshes where replication multiplies wire bytes)
        from jax.sharding import PartitionSpec as P
        axis = self.mesh.axis_names[0]
        in_specs = ((P(),) * 6 + (P(None, axis),)
                    + ((P(),) if quantized else ()))
        return jax.jit(jax.shard_map(
            _run, mesh=self.mesh, in_specs=in_specs,
            out_specs=P(None, axis), check_vma=False))

    def _resident_packed_blob_step(self, key):
        """Single-transfer packed-resident dispatch (single-device path):
        the whole K-chunk segment rides ONE uint8 blob; static slices +
        bitcasts unpack it on device inside the jitted step, then the
        same gather+scan as _build_resident_packed_step runs. The remote
        tunnel charges ~0.1-0.2 s latency PER TRANSFER regardless of
        size (measured round 5: a 7-array segment upload cost ~1.1 s for
        ~3.5 MB), so collapsing the 7 per-segment transfers into one is
        the resident-e2e lever after the byte dedup.

        key = (k, nb_width, target, S, quant, wire_code) — all static
        per run; steps cache in _resident_blob_cache, which
        _rebuild_steps clears so the pallas->scan fallback rebuilds
        against the swapped recurrence."""
        step = self._resident_blob_cache.get(key)
        if step is not None:
            return step
        import jax.numpy as jnp
        k, nbw, b, s, quant, wire_code = key
        cfg = self.model_cfg
        nb = (cfg.seq_len - 1) // 2
        wire_t = {"f2": jnp.float16, "f4": jnp.float32,
                  "i1": jnp.int8}[wire_code]
        esz = {"f2": 2, "f4": 4, "i1": 1}[wire_code]

        def _run(params, blob):
            off = 0
            codes, off = _blob_cut(blob, off, k * nbw, jnp.int8, 1, (k, nbw))
            means, off = _blob_cut(blob, off, k * nbw, wire_t, esz, (k, nbw))
            stds, off = _blob_cut(blob, off, k * nbw, wire_t, esz, (k, nbw))
            lens, off = _blob_cut(blob, off, k * nbw, jnp.float16, 2, (k, nbw))
            rect, off = _blob_cut(blob, off, k * nbw * s, wire_t, esz,
                            (k, nbw, s))
            centers, off = _blob_cut(blob, off, k * b, jnp.int32, 4, (k, b))
            xs = [codes, means, stds, lens, rect, centers]
            if quant:
                scales, off = _blob_cut(blob, off, k * 3, jnp.float32, 4,
                                  (k, 3))
                xs.append(scales)

            def gather_fwd(cod, m, st, ln, r, c):
                win = c[:, None] + jnp.arange(
                    -nb, nb + 1, dtype=c.dtype)[None, :]
                bt = Batch(kmer=jnp.take(cod, win, axis=0),
                           base_means=jnp.take(m, win, axis=0),
                           base_stds=jnp.take(st, win, axis=0),
                           base_signal_lens=jnp.take(ln, win, axis=0),
                           signals=jnp.take(r, win, axis=0))
                return forward_tiled(params, bt, cfg)

            if quant:
                def body(carry, x):
                    cod, m, st, ln, r, c, sc = x
                    return carry, gather_fwd(
                        cod, m.astype(jnp.float32) * sc[0],
                        st.astype(jnp.float32) * sc[1], ln,
                        r.astype(jnp.float32) * sc[2], c)
            else:
                def body(carry, x):
                    return carry, gather_fwd(*x)
            _, probs = jax.lax.scan(body, None, tuple(xs))
            return probs

        step = jax.jit(_run)
        self._resident_blob_cache[key] = step
        return step

    def _persite_blob_step(self, key):
        """Single-transfer per-site dispatch (single-device path): the
        whole padded Batch rides ONE uint8 blob, unpacked on device by
        static slices + bitcasts. The streaming planes previously passed
        5-7 numpy args per dispatch — each arg is a separate relay
        transfer with a fixed per-transfer cost; collapsing them into
        one blob removes ~80% of the per-dispatch transfer overhead on
        remote-attached links. Values are bit-identical (bitcast), so
        plane outputs don't change. key = ("ps", B, L, S, quant);
        float32 transfer keeps the multi-array path (its field dtypes
        are heterogeneous legacy f32)."""
        step = self._resident_blob_cache.get(key)
        if step is not None:
            return step
        import jax.numpy as jnp
        _, b, L, s, quant = key
        cfg = self.model_cfg

        def _run(params, blob):
            off = 0
            kmer, off = _blob_cut(blob, off, b * L, jnp.int8, 1, (b, L))
            fw = 1 if quant else 2
            ft = jnp.int8 if quant else jnp.float16
            means, off = _blob_cut(blob, off, b * L, ft, fw, (b, L))
            stds, off = _blob_cut(blob, off, b * L, ft, fw, (b, L))
            lens, off = _blob_cut(blob, off, b * L, jnp.float16, 2, (b, L))
            sig, off = _blob_cut(blob, off, b * L * s, ft, fw, (b, L, s))
            if quant:
                scales, off = _blob_cut(blob, off, 3, jnp.float32, 4, (3,))
                means = means.astype(jnp.float32) * scales[0]
                stds = stds.astype(jnp.float32) * scales[1]
                sig = sig.astype(jnp.float32) * scales[2]
            bt = Batch(kmer=kmer, base_means=means, base_stds=stds,
                       base_signal_lens=lens, signals=sig)
            return forward_tiled(params, bt, cfg)

        step = jax.jit(_run)
        self._resident_blob_cache[key] = step
        return step

    @staticmethod
    def _to_blob(arrays) -> np.ndarray:
        """Concatenate arrays' raw bytes into one contiguous uint8 blob
        (the jitted blob steps undo this with static slices+bitcasts)."""
        return np.concatenate(
            [np.ascontiguousarray(a).view(np.uint8).ravel()
             for a in arrays])

    def _packed1_blob_step(self, key):
        """Single-transfer read-packed dispatch for the STREAMING plane
        (one batch per blob, no scan; returns (B, 2) probs directly).
        Same rationale as _persite_blob_step: 6-7 per-arg transfers per
        dispatch collapse into one. key = ("pk1", NB, B, S, quant);
        NB rides the take_packed pow2 menu, so the cache holds at most
        a handful of variants (as the multi-array packed step does)."""
        step = self._resident_blob_cache.get(key)
        if step is not None:
            return step
        import jax.numpy as jnp
        _, nbw, b, s, quant = key
        cfg = self.model_cfg
        nb = (cfg.seq_len - 1) // 2

        def _run(params, blob):
            off = 0
            fw = 1 if quant else 2
            ft = jnp.int8 if quant else jnp.float16
            codes, off = _blob_cut(blob, off, nbw, jnp.int8, 1, (nbw,))
            means, off = _blob_cut(blob, off, nbw, ft, fw, (nbw,))
            stds, off = _blob_cut(blob, off, nbw, ft, fw, (nbw,))
            lens, off = _blob_cut(blob, off, nbw, jnp.float16, 2, (nbw,))
            rect, off = _blob_cut(blob, off, nbw * s, ft, fw, (nbw, s))
            centers, off = _blob_cut(blob, off, b, jnp.int32, 4, (b,))
            if quant:
                scales, off = _blob_cut(blob, off, 3, jnp.float32, 4, (3,))
                means = means.astype(jnp.float32) * scales[0]
                stds = stds.astype(jnp.float32) * scales[1]
                rect = rect.astype(jnp.float32) * scales[2]
            win = centers[:, None] + jnp.arange(
                -nb, nb + 1, dtype=centers.dtype)[None, :]
            bt = Batch(kmer=jnp.take(codes, win, axis=0),
                       base_means=jnp.take(means, win, axis=0),
                       base_stds=jnp.take(stds, win, axis=0),
                       base_signal_lens=jnp.take(lens, win, axis=0),
                       signals=jnp.take(rect, win, axis=0))
            return forward_tiled(params, bt, cfg)

        step = jax.jit(_run)
        self._resident_blob_cache[key] = step
        return step

    def _resident_k_chunks(self, est_rows: int | None, target: int) -> int:
        k = 1
        est = est_rows or target
        while k * target < est and k < self.RESIDENT_MAX_CHUNKS:
            k *= 2
        return k

    def _run_resident(self, raw_blocks, result_path: str, is_gzip: bool,
                      target: int, est_rows: int | None = None
                      ) -> CallStats:
        """Device-resident inference: upload each K*device_batch-row
        segment to HBM once (f16 wire; the upload is paid once per row,
        so the int8 wire's byte saving buys nothing here), run the whole
        segment in ONE compiled dispatch (scan over K forwards), fetch
        probs once, emit. Outputs are byte-identical to the streaming
        planes at the same device_batch (same per-forward batch shape ->
        same XLA tiling; tests/test_resident_call.py).

        Uploads of segment s+1 ride a prefetch thread while segment s
        computes; the compute window (dispatch -> block_until_ready) is
        timed separately into ``last_resident_profile`` — that number is
        the measured sites/s/chip ceiling the round-3 docs only
        extrapolated."""
        from collections import deque

        from ..io.batching import bounded_thread_map
        from ..utils.fastparse import emit_call_rows
        from ..utils.prof import PROFILER

        k_chunks = self._resident_k_chunks(est_rows, target)
        seg_rows = k_chunks * target
        wire = (np.float32 if self.call_cfg.transfer_dtype == "float32"
                else np.float16)
        if self._sharding is None:
            to_dev = jax.jit(lambda v: v)
        else:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            axis = self.mesh.axis_names[0]
            to_dev = jax.jit(
                lambda v: v,
                out_shardings=NamedSharding(self.mesh, P(None, axis)))

        import threading
        prof_lock = threading.Lock()
        stats = CallStats()
        profile = {"upload_s": 0.0, "compute_s": 0.0, "fetch_s": 0.0,
                   "rows": 0, "k_chunks": k_chunks, "device_batch": target,
                   "segments": 0}
        t0 = time.time()
        writer = AsyncWriter(result_path, is_gzip)

        def gen_segments():
            fifo: deque = deque()
            pending = 0

            def take(nrows: int):
                segs = []
                need = nrows
                while need:
                    ent = fifo[0]
                    rb, lo = ent
                    kk = min(need, rb.n - lo)
                    segs.append((rb, lo, lo + kk))
                    ent[1] += kk
                    if ent[1] == rb.n:
                        fifo.popleft()
                    need -= kk
                parts = lambda name: [getattr(rb, name)[a:b]  # noqa: E731
                                      for rb, a, b in segs]
                cat = (lambda name: parts(name)[0]            # noqa: E731
                       if len(segs) == 1 else
                       np.concatenate(parts(name)))
                arrays = tuple(cat(n) for n in
                               ("kmer", "means", "stds", "slens",
                                "signals"))
                labels = cat("labels")
                return arrays, segs, labels, nrows

            for rb in raw_blocks:
                if rb is None or rb.n == 0:
                    continue
                fifo.append([rb, 0])
                pending += rb.n
                while pending >= seg_rows:
                    pending -= seg_rows
                    yield take(seg_rows)
            if pending:
                yield take(pending)

        def _upload(item):
            arrays, segs, labels, nv = item
            kmer, means, stds, lens, signals = arrays
            pad = seg_rows - nv
            if pad:
                def _pad(a):
                    w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                    return np.pad(a, w)
                kmer, means, stds, lens, signals = map(
                    _pad, (kmer, means, stds, lens, signals))

            def shape(a):
                return a.reshape((k_chunks, target) + a.shape[1:])
            host = (shape(np.asarray(kmer, np.int8)),
                    shape(np.asarray(means, wire)),
                    shape(np.asarray(stds, wire)),
                    shape(np.asarray(lens, wire)),
                    shape(np.asarray(signals, wire)))
            tu = time.time()
            dev = to_dev(host)
            jax.block_until_ready(dev)
            with prof_lock:   # 2 upload workers race the sum
                profile["upload_s"] += time.time() - tu
            return dev, segs, labels, nv

        wd = StallWatchdog()
        for dev, segs, labels, nv in bounded_thread_map(
                _upload, gen_segments(), workers=2, depth=2):
            tc = time.time()
            with PROFILER.stage("dispatch", nv), wd.track():
                # resolve the step attribute inside the retry closure:
                # the pallas->scan fallback swaps it via _rebuild_steps
                probs = self._run_with_fallback(
                    lambda d=dev: self._step_resident(self.params, *d))
                jax.block_until_ready(probs)
            profile["compute_s"] += time.time() - tc
            tf = time.time()
            with PROFILER.stage("fetch", nv):
                probs = np.asarray(probs).reshape(-1, 2)[:nv]
            profile["fetch_s"] += time.time() - tf
            profile["rows"] += nv
            profile["segments"] += 1
            with PROFILER.stage("format", nv):
                off = 0
                out = []
                for rb, lo, hi in segs:
                    out.append(emit_call_rows(rb, lo, hi,
                                              probs[off:off + hi - lo]))
                    off += hi - lo
                writer.write_bytes(b"".join(out))
            stats.sites += nv
            stats.batches += 1
            called = probs[:, 1] > probs[:, 0]
            stats.label_correct += int((called == (labels == 1)).sum())
        writer.close()
        stats.seconds = time.time() - t0
        wd.fill(stats)
        profile["wall_s"] = stats.seconds
        self.last_resident_profile = profile
        return stats

    def _run_resident_packed(self, packed_blocks, result_path: str,
                             is_gzip: bool, target: int,
                             est_rows: int | None = None) -> CallStats:
        """Device-resident inference over the read-packed wire: each scan
        chunk uploads a deduplicated base slab (NB bases) + int32 site
        centers instead of B x seq_len per-site windows, and the windows
        are gathered on device inside the resident scan
        (_build_resident_packed_step). One dispatch per K-chunk segment,
        probs fetched once — the compute window matches the per-site
        resident plane; the upload (the binding stage of resident
        END-TO-END on remote-attached links) shrinks by
        ~seq_len/bases-per-site, x2 more under int8 slabs.

        Segments are route-homogeneous (the streaming plane's per-block
        density routing, lifted to chunks): dense blocks ride the packed
        slab step, sparse blocks (host-gathered windows) ride the
        per-site resident step; both dispatch from one sequential loop so
        output row order — and bytes, under f16 transfer — match every
        other plane (tests/test_resident_packed.py)."""
        from collections import deque
        from itertools import chain

        from ..io.batching import bounded_thread_map
        from ..utils.fastparse import emit_call_rows_arrays
        from ..utils.prof import PROFILER

        seq_len = self.model_cfg.seq_len
        sig_len = self.model_cfg.signal_len
        nb = (seq_len - 1) // 2

        it = (_check_packed_block(pb, seq_len, sig_len)
              for pb in iter(packed_blocks)
              if pb is not None and pb.n)
        first = next(it, None)
        if first is None:
            AsyncWriter(result_path, is_gzip).close()
            return CallStats()
        thr = self.packed_density_threshold()
        if thr == 0.0:
            # --packed_wire off: the per-site resident plane
            return self._run_resident(
                (pb.to_raw_block() for pb in chain([first], it)),
                result_path, is_gzip, target, est_rows=est_rows)
        stream = chain([first], it)
        k_chunks = self._resident_k_chunks(est_rows, target)
        if mesh_is_remote(self.mesh):
            # pipeline the tunnel: aim for >= ~4 segments so uploads of
            # segment s+1 (prefetch pool) overlap segment s's compute +
            # fetch — one giant dispatch leaves the whole upload latency
            # exposed (round-5 measurement: 131k rows as ONE segment
            # spent 1.1 of 1.8 s wall in upload with zero overlap)
            while k_chunks > 1 and (est_rows or 0) < 4 * k_chunks * target:
                k_chunks //= 2
        # single-device segments ride ONE uint8 blob per upload (the
        # tunnel charges latency per transfer, not per byte — see
        # _resident_packed_blob_step); mesh runs keep per-array uploads
        # so centers can shard while slabs replicate
        blob_mode = self._single
        wire_code = ("f4" if self.call_cfg.transfer_dtype == "float32"
                     else ("i1" if self._quant else "f2"))
        # static per-run base-slab width: sized from the first block's
        # density (denser later blocks just fill fewer sites per chunk —
        # site-axis padding, never a recompile)
        dens = max(1.0, first.n_bases / max(1, first.n))
        want = int(min(dens * 1.25, float(seq_len)) * target) + seq_len
        nb_width = max(4096, 1 << (want - 1).bit_length())
        wire = (np.float32 if self.call_cfg.transfer_dtype == "float32"
                else np.float16)
        quant = self._quant

        if self._sharding is not None:
            # mesh runs keep per-array uploads so centers can shard
            # while slabs replicate; single-device runs never build
            # these (blob/numpy args ride the dispatch instead)
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            axis = self.mesh.axis_names[0]
            to_dev_rep = jax.jit(
                lambda v: v, out_shardings=NamedSharding(self.mesh, P()))
            to_dev_shard = jax.jit(
                lambda v: v,
                out_shardings=NamedSharding(self.mesh, P(None, axis)))

        import threading
        prof_lock = threading.Lock()
        stats = CallStats()
        profile = {"upload_s": 0.0, "compute_s": 0.0, "fetch_s": 0.0,
                   "rows": 0, "k_chunks": k_chunks, "device_batch": target,
                   "segments": 0, "nb_width": nb_width, "plane": "packed"}
        t0 = time.time()
        writer = AsyncWriter(result_path, is_gzip)

        def is_dense(pb) -> bool:
            return pb.n_bases <= thr * pb.n

        def gen_segments():
            """Yield route-homogeneous segments: (route, chunks) with
            chunks = [(host_arrays, metas)] and metas = (segs, labels,
            n_valid); segs = [(pb, lo, hi)] in stream order."""
            fifo: deque = deque()   # [pb, consumed_sites]
            pending = 0
            exhausted = False

            def fill():
                nonlocal pending, exhausted
                while not exhausted and pending < target:
                    pb = next(stream, None)
                    if pb is None:
                        exhausted = True
                        return
                    fifo.append([pb, 0])
                    pending += pb.n

            def take_packed_chunk():
                nonlocal pending
                # shared consumption core (_take_packed_span); this
                # plane pads the base axis to the static slab width
                arrays, segs, labels, ns, nbase = _take_packed_span(
                    fifo, target, nb_width, seq_len, is_dense)
                pending -= ns
                codes, means, stds, lens, rect, centers = arrays
                pad_b = nb_width - nbase
                if pad_b:
                    codes = np.pad(codes, (0, pad_b))
                    means = np.pad(means, (0, pad_b))
                    stds = np.pad(stds, (0, pad_b))
                    lens = np.pad(lens, (0, pad_b))
                    rect = np.pad(rect, ((0, pad_b), (0, 0)))
                if ns < target:
                    centers = np.pad(centers, (0, target - ns),
                                     constant_values=nb)
                return ((codes, means, stds, lens, rect, centers),
                        (segs, labels, ns))

            def take_persite_chunk():
                nonlocal pending
                arrays, segs, labels, ns = _take_persite_span(
                    fifo, target, is_dense)
                pending -= ns
                return (arrays, (segs, labels, ns))

            while True:
                fill()
                if not fifo:
                    return
                route = ("packed" if is_dense(fifo[0][0]) else "persite")
                chunks = []
                while len(chunks) < k_chunks:
                    fill()
                    if not fifo:
                        break
                    nxt = ("packed" if is_dense(fifo[0][0])
                           else "persite")
                    if nxt != route:
                        break
                    chunks.append(take_packed_chunk() if route == "packed"
                                  else take_persite_chunk())
                if chunks:
                    yield (route, chunks)

        def _upload(item):
            route, chunks = item
            metas = [m for _, m in chunks]
            host = [a for a, _ in chunks]
            npad = k_chunks - len(host)
            tu = time.time()
            if route == "packed":
                if npad:
                    zc = (np.zeros(nb_width, np.int8),
                          np.zeros(nb_width, wire),
                          np.zeros(nb_width, np.float16),
                          np.zeros(nb_width, np.float16),
                          np.zeros((nb_width, host[0][4].shape[1]), wire),
                          np.full(target, nb, np.int32))
                    host = host + [zc] * npad
                codes = np.stack([h[0] for h in host])
                lens = np.stack([np.asarray(h[3], np.float16)
                                 for h in host])
                centers = np.stack([h[5] for h in host])
                if quant:
                    qm, qs, qr, sc = [], [], [], []
                    for h in host:
                        m, sm = _quantize_field(h[1])
                        s, ss = _quantize_field(h[2])
                        r, sr = _quantize_field(h[4])
                        qm.append(m)
                        qs.append(s)
                        qr.append(r)
                        sc.append((sm, ss, sr))
                    dev_host = (codes, np.stack(qm), np.stack(qs), lens,
                                np.stack(qr), centers,
                                np.array(sc, np.float32))
                else:
                    means = np.stack([np.asarray(h[1], wire)
                                      for h in host])
                    stds = np.stack([np.asarray(h[2], wire)
                                     for h in host])
                    rect = np.stack([np.asarray(h[4], wire)
                                     for h in host])
                    dev_host = (codes, means, stds, lens, rect, centers)
                if blob_mode:
                    # one contiguous uint8 blob, handed to the jitted
                    # step as a NUMPY arg: the transfer piggybacks on
                    # the dispatch (the streaming planes' fast path —
                    # an explicit identity-jit upload costs ~1 s of
                    # fixed relay overhead per call regardless of size,
                    # measured round 5; rig notes in
                    # .claude/skills/verify). The step's static slices/
                    # bitcasts undo this layout on device.
                    dev = self._to_blob(dev_host)
                else:
                    # centers (index 5) shard over sites; slabs + scales
                    # replicate
                    dev = tuple(
                        (to_dev_shard if i == 5 else to_dev_rep)(a)
                        for i, a in enumerate(dev_host))
            else:
                if npad:
                    S = host[0][4].shape[-1]
                    zc = (np.zeros((target, seq_len), np.int8),
                          np.zeros((target, seq_len), wire),
                          np.zeros((target, seq_len), wire),
                          np.zeros((target, seq_len), wire),
                          np.zeros((target, seq_len, S), wire))
                    host = host + [zc] * npad
                dev_host = (
                    np.stack([np.asarray(h[0], np.int8) for h in host]),
                    np.stack([np.asarray(h[1], wire) for h in host]),
                    np.stack([np.asarray(h[2], wire) for h in host]),
                    np.stack([np.asarray(h[3], wire) for h in host]),
                    np.stack([np.asarray(h[4], wire) for h in host]))
                # single device: numpy straight into the jitted step
                # (transfer rides the dispatch, as the streaming planes)
                dev = (to_dev_shard(dev_host)
                       if self._sharding is not None else dev_host)
            jax.block_until_ready(dev)
            with prof_lock:   # stage sums race across pool workers
                profile["upload_s"] += time.time() - tu
            return route, dev, metas

        wd = StallWatchdog()
        blob_key = (k_chunks, nb_width, target, first.rect.shape[1],
                    quant, wire_code)

        def _process(item):
            """upload -> dispatch -> fetch, all inside the worker: each
            stage costs a tunnel round trip, and running segments
            through a small ordered pool overlaps every latency with
            every other (the streaming planes' design; a sequential
            dispatch loop left ~0.2 s of exposed RTT per segment —
            round-5 measurement). Stage seconds are summed across
            workers, as in the streaming profile."""
            route, dev, metas = _upload(item)
            nv = sum(m[2] for m in metas)
            tc = time.time()
            with PROFILER.stage("dispatch", nv), wd.track():
                # resolve step attributes inside the retry closure: the
                # pallas->scan fallback swaps them via _rebuild_steps
                if route == "packed" and blob_mode:
                    probs = self._run_with_fallback(
                        lambda d=dev: self._resident_packed_blob_step(
                            blob_key)(self.params, d))
                elif route == "packed":
                    if quant:
                        probs = self._run_with_fallback(
                            lambda d=dev: self._step_resident_packed_q(
                                self.params, *d))
                    else:
                        probs = self._run_with_fallback(
                            lambda d=dev: self._step_resident_packed(
                                self.params, *d))
                else:
                    probs = self._run_with_fallback(
                        lambda d=dev: self._step_resident(self.params, *d))
                jax.block_until_ready(probs)
            with prof_lock:
                profile["compute_s"] += time.time() - tc
            tf = time.time()
            with PROFILER.stage("fetch", nv):
                probs = np.asarray(probs)
            with prof_lock:
                profile["fetch_s"] += time.time() - tf
            return probs, metas, nv

        # segment pool width scales with the engine's dispatch budget
        # (segments are K-chunk heavyweights; half the streaming worker
        # count keeps the host stacking/quantize stages from thrashing)
        seg_workers = max(2, min(8, self.call_cfg.dispatch_workers // 2))
        for probs, metas, nv in bounded_thread_map(
                _process, gen_segments(), workers=seg_workers,
                depth=2 * seg_workers):
            profile["rows"] += nv
            profile["segments"] += 1
            with PROFILER.stage("format", nv):
                out = []
                for k, (segs, labels, ns) in enumerate(metas):
                    pk = probs[k][:ns]
                    off = 0
                    for pb, lo, hi in segs:
                        kmer = pb.codes[pb.window_index(lo, hi)]
                        out.append(emit_call_rows_arrays(
                            pb.raw, pb.row_starts[lo:hi],
                            pb.info_ends[lo:hi], kmer,
                            pk[off:off + hi - lo]))
                        off += hi - lo
                    called = pk[:, 1] > pk[:, 0]
                    stats.label_correct += int(
                        (called == (labels == 1)).sum())
                writer.write_bytes(b"".join(out))
            stats.sites += nv
            stats.batches += 1
        writer.close()
        stats.seconds = time.time() - t0
        wd.fill(stats)
        profile["wall_s"] = stats.seconds
        self.last_resident_profile = profile
        return stats

    def _run_features_file_resident(self, input_path: str,
                                    result_path: str, is_gzip: bool,
                                    target: int) -> CallStats:
        """Route any input plane into the resident engine as a raw-block
        stream (TSV via the native parser; wire v2 directly; packed v3
        via host window materialization)."""
        import os

        from ..io.batching import (bounded_thread_map,
                                   default_parse_workers, iter_byte_blocks)
        from ..utils.fastparse import native_available, \
            parse_raw_feature_block
        from ..utils.formats import (feature_npz_paths, load_packed_npz,
                                     load_wire_npz, wire_npz_version)
        if not native_available():
            raise ValueError(
                "--device_resident needs the native featparse library "
                "(not built on this host): the resident plane parses and "
                "emits through it. Rebuild with a C++ toolchain or use "
                "the default streaming engine.")
        cfg = self.model_cfg
        est = _estimate_rows(input_path)
        pw = self.call_cfg.num_parse_workers or default_parse_workers()
        npz_files = feature_npz_paths(input_path)
        wire_ver = (wire_npz_version(npz_files[0])
                    if npz_files is not None else 0)
        if npz_files is not None and wire_ver == 0:
            raise ValueError(
                "--device_resident does not serve v1 .npz features; "
                "regenerate with extract --w_format npz_wire/npz_packed "
                "or TSV.")
        if wire_ver >= 3:
            # 1 loader worker + prefetch (see _run_fast_wire_npz): the
            # raw-zip loader feeds millions of rows/s single-threaded;
            # pooling it thrashes the GIL. Packed containers stay packed
            # all the way into HBM (_run_resident_packed gathers windows
            # on device) — the host-side 13x window materialization this
            # route used to pay is gone.
            blocks = bounded_thread_map(load_packed_npz, npz_files,
                                        workers=1, depth=4)
            return self._run_resident_packed(blocks, result_path,
                                             is_gzip, target,
                                             est_rows=est)
        if wire_ver == 2:
            blocks = bounded_thread_map(load_wire_npz, npz_files,
                                        workers=1, depth=4)
        elif os.path.isfile(input_path) and not input_path.endswith(".gz"):
            # TSV -> packed bridge (as _run_fast_tsv): reference TSVs
            # group rows by read, so the dedup cuts the resident upload
            # — the binding stage of resident e2e — by ~seq_len/density
            from ..utils.fastparse import pack_raw_block

            def parse_and_pack(raw):
                return pack_raw_block(parse_raw_feature_block(
                    raw, cfg.seq_len, cfg.signal_len))

            blocks = bounded_thread_map(parse_and_pack,
                                        iter_byte_blocks(input_path,
                                                         8 << 20),
                                        workers=pw, depth=2 * pw)
            return self._run_resident_packed(blocks, result_path,
                                             is_gzip, target,
                                             est_rows=est)
        else:
            raise ValueError(
                "--device_resident serves plain features TSV or wire-"
                "format .npz inputs (got {})".format(input_path))
        return self._run_resident(blocks, result_path, is_gzip, target,
                                  est_rows=est)

    def run_features_file(self, input_path: str, result_path: str,
                          is_gzip: bool = False,
                          use_fast_path: bool = True) -> CallStats:
        """features TSV -> call_mods TSV (reference else-branch,
        call_modifications.py:584-636)."""
        import os

        from ..io.batching import bounded_thread_map
        from ..utils.fastparse import native_available
        from ..utils.formats import feature_npz_paths
        from ..utils.prof import PROFILER
        cfg = self.model_cfg
        stats = CallStats()
        t0 = time.time()
        target = self._resolve_target(input_path)
        if self.call_cfg.device_resident == "always":
            return self._run_features_file_resident(input_path,
                                                    result_path, is_gzip,
                                                    target)
        from ..utils.formats import wire_npz_version
        npz_files = feature_npz_paths(input_path)
        wire_ver = (wire_npz_version(npz_files[0])
                    if npz_files is not None else 0)
        if wire_ver:
            # wire-format containers hold the finished f16 transfer layout
            # + info byte blob (v2 per-site windows, v3 read-packed);
            # there is no slow path behind them, and float32 transfer
            # would gain nothing (the arrays were f16 on disk), so the
            # fast engine serves every transfer_dtype
            if not native_available():
                raise ValueError(
                    "{} holds wire-format (v{}) .npz batches, which need "
                    "the native featparse library. `pip install .` builds "
                    "it at install time (this install was likely forced "
                    "past that with DSP_NATIVE_OPTIONAL=1); install a C++ "
                    "toolchain and reinstall, or regenerate features as "
                    "TSV or v1 .npz (extract --w_format npz).".format(
                        input_path, wire_ver))
            if wire_ver >= 3:
                from ..io.batching import bounded_thread_map
                from ..utils.formats import load_packed_npz
                # 1 loader worker + prefetch, NOT the parse pool — see
                # _run_fast_wire_npz (np.load-era pooling measured 4x
                # slower than single-threaded loading)
                blocks = bounded_thread_map(load_packed_npz, npz_files,
                                            workers=1, depth=4)
                return self._run_fast_packed(blocks, result_path, is_gzip,
                                             target)
            return self._run_fast_wire_npz(npz_files, result_path,
                                           is_gzip, target)
        if (use_fast_path and native_available()
                and self.call_cfg.transfer_dtype in ("float16", "int8")
                and npz_files is None and os.path.isfile(input_path)):
            return self._run_fast_tsv(input_path, result_path, is_gzip,
                                      target)
        if npz_files is not None and not getattr(self, "_warned_v1", False):
            # v1 (wire_ver 0) reaches here: DEPRECATED for inference.
            # Its per-row sampleinfo Python strings cap the plane ~30%
            # below TSV/packed (BENCH r2-r4); it stays the training/
            # tools container only. Warn once per engine.
            self._warned_v1 = True
            print("[warn] v1 .npz feature batches are DEPRECATED as a "
                  "call_mods input (slow per-row string decode): "
                  "regenerate with extract --w_format npz_packed (or "
                  "serve the TSV directly). v1 remains the training/"
                  "tools container.")
        batches = PrefetchIterator(
            batches_from_features_file(
                input_path, target, cfg.seq_len, cfg.signal_len,
                self.call_cfg.num_parse_workers,
                out_dtype=("float32"
                           if self.call_cfg.transfer_dtype == "float32"
                           else "float16")),
            depth=4)
        writer = AsyncWriter(result_path, is_gzip)

        # software pipeline: dispatches run in a small thread pool so the
        # host->device copies of consecutive batches overlap (the per-call
        # transfer/RPC latency, not compute, bounds remote-attached TPUs);
        # results come back in order and are formatted on the main thread
        # while later steps are in flight.
        wd = StallWatchdog()

        def _dispatch(pb):
            with PROFILER.stage("dispatch", pb.n_valid), wd.track():
                return _start_fetch(self.predict_probs(pb.features)), pb

        for probs, pb in bounded_thread_map(
                _dispatch, batches,
                workers=self.call_cfg.dispatch_workers,
                depth=2 * self.call_cfg.dispatch_workers):
            n_valid = pb.n_valid
            fb = pb.features
            with PROFILER.stage("fetch", n_valid):
                probs = np.asarray(probs)[:n_valid]
            with PROFILER.stage("format", n_valid):
                from ..utils.fastparse import format_call_block
                block = format_call_block(fb.sampleinfo, probs,
                                          fb.kmer[:n_valid])
                if block is not None:
                    writer.write_text(block)
                else:
                    kmer_strs = ["".join(CODE2BASE_DNA[int(c)] for c in row)
                                 for row in fb.kmer[:n_valid]]
                    writer.write_rows(format_call_rows(
                        fb.sampleinfo, fb.kmer[:n_valid], probs[:, 0],
                        probs[:, 1], kmer_strs))
            stats.sites += n_valid
            stats.batches += 1
            called = probs[:, 1] > probs[:, 0]
            stats.label_correct += int(
                (called == (fb.labels[:n_valid] == 1)).sum())
        writer.close()
        stats.seconds = time.time() - t0
        wd.fill(stats)
        return stats


def call_mods(args) -> CallStats:
    """CLI entry: mirrors reference call_mods(args)
    (call_modifications.py:532)."""
    import os

    from ..config import call_config_from_args, model_config_from_args

    # the engine has a runtime scan fallback, so auto may pick pallas
    # even on multi-device meshes (allow_multi_device)
    model_cfg = model_config_from_args(args, dropout_rate=0.0,
                                       allow_multi_device=True)
    call_cfg = call_config_from_args(args)

    input_path = os.path.abspath(args.input_path)
    if not os.path.exists(input_path):
        raise ValueError("--input_path does not exist!")
    model_path = os.path.abspath(args.model_path)
    if not os.path.exists(model_path):
        raise ValueError("--model_path is not set right!")

    print("[main] call_mods starts..")
    t0 = time.time()
    from ..parallel.dist import host_output_path
    from ..utils.prof import PROFILER, device_trace
    engine = CallModsEngine(model_path, model_cfg, call_cfg)
    result_file = host_output_path(args.result_file)
    PROFILER.reset()   # per-invocation stage counters
    from ..utils.formats import feature_npz_paths
    with device_trace(getattr(args, "profile_dir", None)):
        if os.path.isdir(input_path) and \
                feature_npz_paths(input_path) is None:
            from .extract import extract_to_call_mods
            stats = extract_to_call_mods(engine, input_path, args,
                                         result_file)
        else:  # features TSV, .npz file, or a directory of .npz batches
            stats = engine.run_features_file(input_path, result_file,
                                             getattr(args, "gzip", False))
    if getattr(args, "verbose_stages", False):
        print(PROFILER.report())
    print("[main] call_mods costs %.2f seconds.. "
          "(%d sites, %.0f sites/s)" % (time.time() - t0, stats.sites,
                                        stats.sites_per_s))
    if stats.sites:
        print("[main] accuracy vs label column: %.4f "
              "(meaningful only on labeled features)" %
              stats.label_accuracy)
    return stats
