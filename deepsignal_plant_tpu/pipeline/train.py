"""train — model training on a TPU mesh.

Reference behavior (train.py:22-191): two linecache datasets, one of four
optimizers, StepLR(step=2, gamma=.1), weighted CE with pos_weight,
grad-clip 0.5, full-valid eval every ``step_interval`` steps, checkpoint on
epoch-best accuracy within 2e-4 of the global best, early stop after
``min_epoch_num`` epochs without improvement.

TPU-native changes:
- the features file is vector-parsed once into dense arrays (io/dataset.py)
  instead of per-row linecache parsing each epoch;
- one jitted train step (forward+backward+update) with the batch sharded
  over the "dp" mesh axis — XLA inserts the gradient psum; parameters and
  optimizer state are replicated;
- eval is a second jitted function over padded static batches;
- checkpoints are .npz pytrees with the reference's file-naming scheme.
"""
from __future__ import annotations

import os
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig, TrainConfig
from ..io.dataset import FeatureDataset
from ..models.bilstm import Batch, forward, init_params
from ..models.convert import load_any_checkpoint, save_checkpoint
from ..ops.optim import make_optimizer, step_decay_schedule
from ..parallel.mesh import batch_sharding, make_mesh
from ..utils import metrics as M


def masked_ce_terms(logits: jax.Array, labels: jax.Array,
                    class_weights: jax.Array,
                    sample_mask: jax.Array | None = None
                    ) -> tuple[jax.Array, jax.Array]:
    """(weighted CE numerator, weight sum) — THE loss definition every
    path shares; sharded paths psum both terms before dividing."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    w = class_weights[labels]
    if sample_mask is not None:
        w = w * sample_mask
    return jnp.sum(w * ce), jnp.sum(w)


def weighted_ce(logits: jax.Array, labels: jax.Array,
                class_weights: jax.Array,
                sample_mask: jax.Array | None = None) -> jax.Array:
    """torch nn.CrossEntropyLoss(weight=w) semantics (train.py:78):
    sum(w[y]*ce) / sum(w[y]), with optional padding mask."""
    num, den = masked_ce_terms(logits, labels, class_weights, sample_mask)
    return num / jnp.maximum(den, 1e-12)


def _clip_and_update(tx, clip_grad: float, params, opt_state, grads):
    """Global-norm clip at 0.5 (reference train.py:127) + optimizer step."""
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, clip_grad / jnp.maximum(gnorm, 1e-12))
    grads = jax.tree.map(lambda g: g * scale, grads)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


def make_train_step(cfg: ModelConfig, tx: optax.GradientTransformation,
                    class_weights: np.ndarray, clip_grad: float,
                    sharding=None):
    """Build the jitted (params, opt_state, batch, labels, mask, rng)
    -> (params, opt_state, loss) update.

    Multi-device: explicit SPMD via shard_map — each device computes the
    weighted-CE terms and grads on its batch shard, psums the numerator/
    denominator and grads over "dp", then every device applies the same
    (replicated) clipped update. This keeps pallas recurrence kernels
    usable under multi-device training (GSPMD cannot partition an opaque
    pallas_call); parity: tests/test_pallas_shardmap.py,
    tests/test_multichip.py."""
    cw = jnp.asarray(class_weights, jnp.float32)

    def loss_fn(params, batch, labels, mask, rng):
        logits, _ = forward(params, batch, cfg, train=True, dropout_rng=rng)
        return weighted_ce(logits, labels, cw, mask)

    def _update(params, opt_state, loss, grads):
        params, opt_state = _clip_and_update(tx, clip_grad, params,
                                             opt_state, grads)
        return params, opt_state, loss

    if sharding is None:
        def train_step(params, opt_state, batch, labels, mask, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, batch, labels, mask, rng)
            return _update(params, opt_state, loss, grads)

        return jax.jit(train_step, donate_argnums=(0, 1))

    from jax.sharding import PartitionSpec as P
    mesh = sharding.mesh
    axis = mesh.axis_names[0]

    def train_step_local(params, opt_state, batch, labels, mask, rng):
        # distinct dropout masks per shard (one rng would repeat masks
        # across devices)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def local_loss(p):
            logits, _ = forward(p, batch, cfg, train=True, dropout_rng=rng)
            num, den = masked_ce_terms(logits, labels, cw, mask)
            # weight sum has no param dependence, so the psum is grad-inert
            den = jax.lax.psum(den, axis)
            return num / jnp.maximum(den, 1e-12)

        lloss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(lloss, axis)
        grads = jax.lax.psum(grads, axis)
        return _update(params, opt_state, loss, grads)

    smapped = jax.shard_map(
        train_step_local, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(smapped, donate_argnums=(0, 1))


def make_eval_step(cfg: ModelConfig, sharding=None):
    def eval_step(params, batch):
        logits, probs = forward(params, batch, cfg, train=False)
        return jnp.argmax(probs, axis=1), probs, logits

    if sharding is None:
        return jax.jit(eval_step)
    from jax.sharding import PartitionSpec as P
    axis = sharding.mesh.axis_names[0]
    return jax.jit(jax.shard_map(
        eval_step, mesh=sharding.mesh, in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)), check_vma=False))


def make_eval_counts_step(cfg: ModelConfig, class_weights: np.ndarray,
                          sharding):
    """Eval step returning replicated metric counts — outputs stay scalar
    so multi-host eval never gathers sharded arrays to one host.
    -> [weighted_ce, correct, total, tp, fp, fn]"""
    cw = jnp.asarray(class_weights, jnp.float32)

    def _counts(logits, probs, labels, mask, loss):
        pred = jnp.argmax(probs, axis=1)
        counts = _pred_counts(pred, labels, mask > 0)
        return jnp.concatenate([jnp.asarray(loss, jnp.float32)[None],
                                counts])

    if sharding is None:
        def counts_step(params, batch, labels, mask):
            logits, probs = forward(params, batch, cfg, train=False)
            loss = weighted_ce(logits, labels, cw, mask)
            return _counts(logits, probs, labels, mask, loss)

        return jax.jit(counts_step)

    from jax.sharding import PartitionSpec as P
    mesh = sharding.mesh
    axis = mesh.axis_names[0]

    def counts_step_local(params, batch, labels, mask):
        logits, probs = forward(params, batch, cfg, train=False)
        num, den = masked_ce_terms(logits, labels, cw, mask)
        num = jax.lax.psum(num, axis)
        den = jax.lax.psum(den, axis)
        loss = num / jnp.maximum(den, 1e-12)
        local = _counts(logits, probs, labels, mask, 0.0)
        counts = jax.lax.psum(local.at[0].set(0.0), axis)
        return counts.at[0].set(loss)

    return jax.jit(jax.shard_map(
        counts_step_local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(), check_vma=False))


# ---------------------------------------------------------------------------
# device-resident data plane: the datasets live in HBM, and an epoch runs as
# a handful of dispatches — each one a jitted lax.scan over `step_interval`
# train steps that gather their rows from the resident arrays by the epoch
# permutation. No per-step host->device input traffic exists at all; on
# remote-attached links this amortizes the round-trip latency over the whole
# eval interval, and on any rig it removes the host input pipeline from the
# step loop. Covers the full topology matrix: single device (bitwise-
# equal to per-step feeding), single-host multi-device and pods (row-
# sharded data, shard-local shuffles, psum'd scan chunks).
# ---------------------------------------------------------------------------

#: resident mode auto-enables only when both datasets fit comfortably in
#: HBM next to the model + activations (v5e: 16 GB)
RESIDENT_MAX_BYTES = int(os.environ.get("DSP_RESIDENT_MAX_BYTES",
                                        8 << 30))


def dataset_nbytes(ds) -> int:
    return (ds.kmer.nbytes + ds.base_means.nbytes + ds.base_stds.nbytes +
            ds.base_signal_lens.nbytes + ds.signals.nbytes +
            ds.labels.nbytes)


_jit_identity = None


def to_device(tree):
    """Transfer a pytree via a jitted identity — a bare device_put can
    stall for minutes on remote-attached backends; jit-arg transfer
    takes the fast path."""
    global _jit_identity
    if _jit_identity is None:
        _jit_identity = jax.jit(lambda v: v)
    return _jit_identity(tree)


_blob_put_cache: dict = {}


def blob_put(tree):
    """Upload a pytree of numpy arrays as ONE uint8 blob: the remote
    relay charges a fixed fee per jit arg (each leaf = one transfer
    RPC), so a 6-leaf dataset upload pays 6 fees through to_device but
    one here. A jitted unpack (static slices + bitcast_convert_type,
    bit-identical values) splits it on device in the same dispatch.
    Unpack executables cache per (treedef, shapes, dtypes)."""
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves or not all(
            isinstance(a, np.ndarray) and a.dtype.kind in "iuf"
            # 64-bit leaves can't round-trip the uint8 bitcast under
            # JAX's default x64-off config (the blob packs 8 B/elem but
            # the bitcast target canonicalizes to 32-bit); the per-leaf
            # transfer canonicalizes correctly (review r5)
            and a.dtype.itemsize <= 4
            for a in leaves):
        return to_device(tree)
    # the concat transiently duplicates the payload on host; past ~1 GB
    # the per-leaf fees are noise next to the transfer itself, so skip
    # the copy (review r5: a multi-GB resident dataset would 2x RSS)
    if sum(a.nbytes for a in leaves) > int(os.environ.get(
            "DSP_BLOB_PUT_MAX_BYTES", str(1 << 30))):
        return to_device(tree)
    key = (treedef, tuple((a.shape, a.dtype.str) for a in leaves))
    fn = _blob_put_cache.get(key)
    if fn is None:
        import jax.numpy as jnp
        specs = [(a.shape, jnp.dtype(a.dtype), a.dtype.itemsize,
                  int(a.size)) for a in leaves]

        def _run(blob):
            from .call_mods import _blob_cut
            out = []
            off = 0
            for shape, dt, w, count in specs:
                arr, off = _blob_cut(blob, off, count, dt, w, shape)
                out.append(arr)
            return jax.tree.unflatten(treedef, out)

        fn = jax.jit(_run)
        _blob_put_cache[key] = fn
    blob = np.concatenate(
        [np.ascontiguousarray(a).view(np.uint8).ravel() for a in leaves])
    return fn(blob)


def device_put_dataset(ds) -> tuple[Batch, jax.Array]:
    """Upload a FeatureDataset's arrays once (one blob transfer — see
    blob_put). Memoized on the dataset object: denoise's cross-rank
    round scores each half with the model trained on the other, so both
    calls reuse the same two uploads."""
    cached = getattr(ds, "_device_cache", None)
    if cached is not None:
        return cached
    batch = Batch(ds.kmer, ds.base_means, ds.base_stds,
                  ds.base_signal_lens, ds.signals)
    out = blob_put((batch, ds.labels))
    try:
        ds._device_cache = out
    except AttributeError:
        pass   # slotted/frozen dataset: skip memoization
    return out


def device_put_dataset_sharded(ds, mesh, up) -> tuple:
    """Sharded-resident upload of a dataset, memoized on the dataset
    object (the cross-rank round's two calls reuse both halves' shards
    and uploads; the trainer's mesh/sharding are fixed per run).
    ``up`` is the jitted identity with the row sharding. Returns
    (data, labels, row_valid, n_padded_global)."""
    cached = getattr(ds, "_device_cache_sharded", None)
    if cached is not None:
        return cached
    b, l, v, n_pad = shard_dataset_rows(ds, mesh)
    data, labels, valid = up((b, l, v))
    out = (data, labels, valid, n_pad)
    try:
        ds._device_cache_sharded = out
    except AttributeError:
        pass
    return out


def pad_epoch_perm(perm: np.ndarray, steps: int, batch_size: int
                   ) -> np.ndarray:
    """Zero-pad an epoch permutation to steps*batch_size (the chunked
    scan's static shape; padded rows are masked by the tail step) —
    index-0 padding matches FeatureDataset.iter_batches."""
    pad_n = steps * batch_size - len(perm)
    if pad_n > 0:
        perm = np.concatenate([perm, np.zeros(pad_n, perm.dtype)])
    return perm.astype(np.int32)


def _pred_counts(pred, labels, valid):
    """[correct, total, tp, fp, fn] as f32 — the one definition every
    eval path (host, multihost, resident) derives metrics from."""
    return jnp.stack([
        jnp.sum((pred == labels) & valid), jnp.sum(valid),
        jnp.sum(valid & (pred == 1) & (labels == 1)),
        jnp.sum(valid & (pred == 1) & (labels == 0)),
        jnp.sum(valid & (pred == 0) & (labels == 1))]).astype(jnp.float32)


def _metrics_from_counts(loss: float, counts) -> dict:
    correct, total, tp, fp, fn = np.asarray(counts, np.float64)
    return {"loss": float(loss),
            "accuracy": correct / total if total else 0.0,
            "precision": tp / (tp + fp) if tp + fp else 0.0,
            "recall": tp / (tp + fn) if tp + fn else 0.0}


def _resident_eval_fn(run_chunk):
    """evaluate() drop-in over a resident eval chunk ((losses, totals)
    callable) — shared by the single-device and sharded planes."""
    def evaluate_fn(params):
        losses, totals = run_chunk(params)
        return _metrics_from_counts(float(np.mean(np.asarray(losses))),
                                    totals)
    return evaluate_fn


def make_train_chunk(cfg: ModelConfig, tx: optax.GradientTransformation,
                     class_weights: np.ndarray, clip_grad: float,
                     k_steps: int, batch_size: int, n_rows: int,
                     acc_interval: int | None = None,
                     dequant: bool = False):
    """``k_steps`` train steps in ONE dispatch: a jitted lax.scan whose
    body gathers batch ``t`` from the device-resident data by the epoch
    permutation (padded to steps*B; the tail step masks its padding).
    Numerics match the per-step path: same gather rows, same fold_in
    dropout stream, same clip + optimizer update.

    ``acc_interval`` (the denoise loop's need): every that-many steps
    also compute the post-update no-dropout accuracy on the step's own
    batch (reference denoise.py:118-119's early-break signal); other
    steps report -1. Returns (params, opt_state, losses[, accs])."""
    cw = jnp.asarray(class_weights, jnp.float32)
    K, B, N = k_steps, batch_size, n_rows

    def chunk(params, opt_state, data, labels_all, perm, epoch_step0,
              global_step0, key, scales=None):
        def body(carry, t):
            params, opt_state = carry
            pos = epoch_step0 + t
            idx = jax.lax.dynamic_slice(perm, (pos * B,), (B,))
            batch = Batch(*(a[idx] for a in data))
            if dequant:
                # int8 spill wire: per-slab symmetric scales multiply
                # back after the (cheap, B-row) gather — mirrors the
                # inference engine's quantized step (call_mods._step_q)
                batch = Batch(
                    batch.kmer,
                    batch.base_means.astype(jnp.float32) * scales[0],
                    batch.base_stds.astype(jnp.float32) * scales[1],
                    batch.base_signal_lens.astype(jnp.float32),
                    batch.signals.astype(jnp.float32) * scales[2])
            labels = labels_all[idx]
            nv = jnp.clip(N - pos * B, 0, B)
            mask = (jnp.arange(B) < nv).astype(jnp.float32)
            rng = jax.random.fold_in(key, global_step0 + t)

            def loss_fn(p):
                logits, _ = forward(p, batch, cfg, train=True,
                                    dropout_rng=rng)
                return weighted_ce(logits, labels, cw, mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, opt_state = _clip_and_update(tx, clip_grad, params,
                                                 opt_state, grads)
            if acc_interval is None:
                return (params, opt_state), loss

            def _batch_acc(_):
                _, probs = forward(params, batch, cfg, train=False)
                pred = jnp.argmax(probs, axis=1)
                ok = jnp.sum((pred == labels) * mask)
                return ok / jnp.maximum(jnp.sum(mask), 1.0)

            acc = jax.lax.cond((t + 1) % acc_interval == 0, _batch_acc,
                               lambda _: jnp.float32(-1.0), None)
            return (params, opt_state), (loss, acc)

        (params, opt_state), out = jax.lax.scan(
            body, (params, opt_state), jnp.arange(K))
        if acc_interval is None:
            return params, opt_state, out
        return params, opt_state, out[0], out[1]

    return jax.jit(chunk, donate_argnums=(0, 1))


def make_train_chunk_sharded(cfg: ModelConfig,
                             tx: optax.GradientTransformation,
                             class_weights: np.ndarray, clip_grad: float,
                             k_steps: int, local_batch: int,
                             sharding, acc_interval: int | None = None):
    """Sharded-resident chunk: the dataset lives in HBM sharded over the
    mesh's row axis; every step each device gathers ``local_batch`` rows
    from ITS OWN shard by its shard-local epoch permutation (stratified
    shuffling — the standard data-parallel deviation from a global
    shuffle, documented in PARITY.md), computes local weighted-CE terms
    and grads, psums, and applies the identical replicated update. One
    dispatch covers ``k_steps`` steps; no host->device input traffic
    exists inside an epoch.

    Inputs (global shapes): data/labels (N_padded, ...) sharded on rows;
    row_valid (N_padded,) f32 sharded (0.0 marks padding rows so they
    never contribute); perm (ndev * steps*local_batch,) int32 sharded
    (local indices into the device's shard, zero-padded positions masked
    by the positional tail mask)."""
    from jax.sharding import PartitionSpec as P
    cw = jnp.asarray(class_weights, jnp.float32)
    K, B = k_steps, local_batch
    mesh = sharding.mesh
    axis = mesh.axis_names[0]

    def chunk_local(params, opt_state, data, labels_all, row_valid, perm,
                    epoch_step0, global_step0, key):
        n_local = labels_all.shape[0]

        def body(carry, t):
            params, opt_state = carry
            pos = epoch_step0 + t
            idx = jax.lax.dynamic_slice(perm, (pos * B,), (B,))
            batch = Batch(*(a[idx] for a in data))
            labels = labels_all[idx]
            nv = jnp.clip(n_local - pos * B, 0, B)
            mask = ((jnp.arange(B) < nv).astype(jnp.float32)
                    * row_valid[idx])
            rng = jax.random.fold_in(key, global_step0 + t)
            # distinct dropout masks per shard (mirrors train_step_local)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

            def local_loss(p):
                logits, _ = forward(p, batch, cfg, train=True,
                                    dropout_rng=rng)
                num, den = masked_ce_terms(logits, labels, cw, mask)
                den = jax.lax.psum(den, axis)
                return num / jnp.maximum(den, 1e-12)

            lloss, grads = jax.value_and_grad(local_loss)(params)
            loss = jax.lax.psum(lloss, axis)
            grads = jax.lax.psum(grads, axis)
            params, opt_state = _clip_and_update(tx, clip_grad, params,
                                                 opt_state, grads)
            if acc_interval is None:
                return (params, opt_state), loss

            def _batch_acc(_):
                # post-update no-dropout accuracy on the step's own
                # global batch (denoise early-break signal; psum'd)
                _, probs = forward(params, batch, cfg, train=False)
                pred = jnp.argmax(probs, axis=1)
                ok = jax.lax.psum(jnp.sum((pred == labels) * mask), axis)
                tot = jax.lax.psum(jnp.sum(mask), axis)
                return ok / jnp.maximum(tot, 1.0)

            acc = jax.lax.cond((t + 1) % acc_interval == 0, _batch_acc,
                               lambda _: jnp.float32(-1.0), None)
            return (params, opt_state), (loss, acc)

        (params, opt_state), out = jax.lax.scan(
            body, (params, opt_state), jnp.arange(K))
        if acc_interval is None:
            return params, opt_state, out
        return params, opt_state, out[0], out[1]

    n_out = 3 if acc_interval is None else 4
    smapped = jax.shard_map(
        chunk_local, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(), P(),
                  P()),
        out_specs=(P(),) * n_out, check_vma=False)
    return jax.jit(smapped, donate_argnums=(0, 1))


def make_score_chunk_sharded(cfg: ModelConfig, local_batch: int,
                             k_steps: int, sharding):
    """Sharded scoring in one dispatch: every device scans row slices of
    its resident shard -> (K, ndev*local_batch) prob_1, columns grouped
    by device. Host-side row order: device d's local row r sits at
    out[r // local_batch, d*local_batch + r % local_batch]."""
    from jax.sharding import PartitionSpec as P
    K, B = k_steps, local_batch
    mesh = sharding.mesh

    def chunk_local(params, data):
        n_local = data.kmer.shape[0]

        def body(_, t):
            idx = jnp.minimum(t * B + jnp.arange(B), n_local - 1)
            batch = Batch(*(a[idx] for a in data))
            _, probs = forward(params, batch, cfg, train=False)
            return 0, probs[:, 1]

        _, p1 = jax.lax.scan(body, 0, jnp.arange(K))
        return p1

    axis = mesh.axis_names[0]
    smapped = jax.shard_map(chunk_local, mesh=mesh,
                            in_specs=(P(), P(axis)),
                            out_specs=P(None, axis), check_vma=False)
    return jax.jit(smapped)


def make_eval_chunk_sharded(cfg: ModelConfig, class_weights: np.ndarray,
                            local_batch: int, k_steps: int, sharding):
    """Sharded-resident eval in one dispatch: every device scans row
    slices of its shard, counts are psum'd -> replicated (losses are the
    global weighted-CE per step)."""
    from jax.sharding import PartitionSpec as P
    cw = jnp.asarray(class_weights, jnp.float32)
    K, B = k_steps, local_batch
    mesh = sharding.mesh
    axis = mesh.axis_names[0]

    def chunk_local(params, data, labels_all, row_valid):
        n_local = labels_all.shape[0]

        def body(totals, t):
            lo = t * B
            idx = jnp.minimum(lo + jnp.arange(B), n_local - 1)
            batch = Batch(*(a[idx] for a in data))
            labels = labels_all[idx]
            nv = jnp.clip(n_local - lo, 0, B)
            mask = ((jnp.arange(B) < nv).astype(jnp.float32)
                    * row_valid[idx])
            logits, probs = forward(params, batch, cfg, train=False)
            num, den = masked_ce_terms(logits, labels, cw, mask)
            num = jax.lax.psum(num, axis)
            den = jax.lax.psum(den, axis)
            loss = num / jnp.maximum(den, 1e-12)
            counts = jax.lax.psum(
                _pred_counts(jnp.argmax(probs, axis=1), labels, mask > 0),
                axis)
            return totals + counts, loss

        totals, losses = jax.lax.scan(body, jnp.zeros(5, jnp.float32),
                                      jnp.arange(K))
        return losses, totals

    smapped = jax.shard_map(chunk_local, mesh=mesh,
                            in_specs=(P(), P(axis), P(axis), P(axis)),
                            out_specs=(P(), P()), check_vma=False)
    return jax.jit(smapped)


def shard_dataset_rows(ds, mesh):
    """The sharded-resident row layout: contiguous per-device blocks of
    ``rows_per_device = ceil(N/ndev)`` rows (zero-index padding inside a
    block's tail, masked by the returned f32 row_valid). Returns THIS
    process's local (Batch, labels, row_valid) — the concatenation of
    its devices' blocks, every device on a single host — plus the padded
    GLOBAL row count. Single-host callers upload the result directly
    (all blocks are local); pods lift it with to_global(sharding, ...,
    n_padded)."""
    total = mesh.devices.size
    pid = jax.process_index()
    n = len(ds)
    rpd = -(-n // total)                    # rows per device
    idxs, valid = [], []
    for i, d in enumerate(mesh.devices.flat):
        if d.process_index != pid:
            continue
        lo = min(i * rpd, n)
        hi = min(lo + rpd, n)
        take = np.arange(lo, hi)
        idxs.append(np.concatenate(
            [take, np.zeros(rpd - len(take), np.int64)]))
        v = np.zeros(rpd, np.float32)
        v[:len(take)] = 1.0
        valid.append(v)
    idx = np.concatenate(idxs)
    batch = Batch(ds.kmer[idx], ds.base_means[idx], ds.base_stds[idx],
                  ds.base_signal_lens[idx], ds.signals[idx])
    return batch, ds.labels[idx], np.concatenate(valid), rpd * total


def sharded_epoch_perm(rng_np, rows_per_device: int, mesh, steps: int,
                       local_batch: int) -> np.ndarray:
    """This process's slice of the global per-device epoch permutations
    (shard-local indices), each part exactly steps*local_batch long
    (zero-padded, or truncated when a caller undersizes steps for a
    partial epoch) — the fixed stride is the layout contract. Every host
    draws ALL devices' perms from the identically-seeded rng stream, so
    the global shuffle stays consistent across processes; each keeps the
    blocks of its own devices."""
    width = steps * local_batch
    pid = jax.process_index()
    parts = []
    for d in mesh.devices.flat:
        p = pad_epoch_perm(rng_np.permutation(rows_per_device), steps,
                           local_batch)[:width]
        if d.process_index == pid:
            parts.append(p)
    return np.concatenate(parts)


def make_score_chunk(cfg: ModelConfig, batch_size: int, k_steps: int,
                     n_rows: int):
    """Score a device-resident dataset in ONE dispatch: scan over row
    slices -> prob_1 of every row ((K, B); flatten + trim on host)."""
    K, B, N = k_steps, batch_size, n_rows

    def chunk(params, data):
        def body(_, t):
            idx = jnp.minimum(t * B + jnp.arange(B), N - 1)
            batch = Batch(*(a[idx] for a in data))
            _, probs = forward(params, batch, cfg, train=False)
            return 0, probs[:, 1]

        _, p1 = jax.lax.scan(body, 0, jnp.arange(K))
        return p1

    return jax.jit(chunk)


def make_eval_chunk(cfg: ModelConfig, class_weights: np.ndarray,
                    batch_size: int, k_steps: int, n_rows: int):
    """Full-validation eval in ONE dispatch: scan over row slices of the
    device-resident valid set -> (per-step weighted-CE losses, summed
    [correct, total, tp, fp, fn]) — exactly evaluate()'s metrics."""
    cw = jnp.asarray(class_weights, jnp.float32)
    K, B, N = k_steps, batch_size, n_rows

    def chunk(params, data, labels_all):
        def body(totals, t):
            lo = t * B
            idx = jnp.minimum(lo + jnp.arange(B), N - 1)
            batch = Batch(*(a[idx] for a in data))
            labels = labels_all[idx]
            nv = jnp.clip(N - lo, 0, B)
            mask = (jnp.arange(B) < nv).astype(jnp.float32)
            logits, probs = forward(params, batch, cfg, train=False)
            loss = weighted_ce(logits, labels, cw, mask)
            counts = _pred_counts(jnp.argmax(probs, axis=1), labels,
                                  mask > 0)
            return totals + counts, loss

        totals, losses = jax.lax.scan(body, jnp.zeros(5, jnp.float32),
                                      jnp.arange(K))
        return losses, totals

    return jax.jit(chunk)


def evaluate(params, dataset: FeatureDataset, eval_step, batch_size: int,
             class_weights: np.ndarray) -> dict:
    preds, labels, losses = [], [], []
    cw = np.asarray(class_weights, np.float32)
    for batch, y, n_valid in dataset.iter_batches(batch_size, shuffle=False,
                                                  pad_to_batch=True):
        pred, probs, logits = eval_step(params, batch)
        pred = np.asarray(pred)[:n_valid]
        logits = np.asarray(logits)[:n_valid]
        y = y[:n_valid]
        logp = logits - np.log(np.sum(np.exp(logits - logits.max(1, keepdims=True)),
                                      axis=1, keepdims=True)) - logits.max(1, keepdims=True)
        ce = -logp[np.arange(len(y)), y]
        w = cw[y]
        losses.append(float(np.sum(w * ce) / max(np.sum(w), 1e-12)))
        preds.append(pred)
        labels.append(y)
    preds = np.concatenate(preds) if preds else np.empty(0, np.int64)
    labels = np.concatenate(labels) if labels else np.empty(0, np.int64)
    return {"loss": float(np.mean(losses)) if losses else 0.0,
            "accuracy": M.accuracy(labels, preds),
            "precision": M.precision(labels, preds),
            "recall": M.recall(labels, preds)}


def save_train_state(path: str, params, opt_state, epoch: int,
                     global_step: int, best_accuracy: float) -> None:
    """Full resumable training state (params + optimizer + position) — the
    reference checkpoints weights only (train.py:161, SURVEY §5.4)."""
    import pickle
    state = {
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
        "epoch": epoch,
        "global_step": global_step,
        "best_accuracy": best_accuracy,
    }
    blob = np.frombuffer(pickle.dumps(state), dtype=np.uint8)
    np.savez(path, train_state=blob)


def load_train_state(path: str) -> dict:
    import pickle
    with np.load(path) as z:
        return pickle.loads(bytes(z["train_state"]))


def train_state_path(model_dir: str, module: str) -> str:
    return os.path.join(model_dir, f"{module}.train_state.npz")


def ckpt_name(model_dir: str, module: str, seq_len: int, signal_len: int,
              epoch: int) -> str:
    """Reference naming (train.py:161-164), with our .npz container."""
    return os.path.join(
        model_dir, f"{module}.b{seq_len}_s{signal_len}_epoch{epoch}.ckpt.npz")


def clean_old_ckpts(model_dir: str, module: str) -> None:
    """Remove stale checkpoints of the same model_type at train start
    (reference train.py:54-57). Process 0 only on pods; tolerant of
    concurrent removal on shared filesystems."""
    if jax.process_index() != 0:
        return
    rx = re.compile(r"" + re.escape(module) + r"\.b\d+_s\d+_epoch\d+\.ckpt")
    for f in os.listdir(model_dir):
        if rx.match(f):
            try:
                os.remove(os.path.join(model_dir, f))
            except FileNotFoundError:
                pass


def train(args) -> dict:
    """CLI entry mirroring reference train(args) (train.py:22). Returns a
    summary dict {best_accuracy, best_ckpt, epochs_run}."""
    from ..config import model_config_from_args

    t_start = time.time()
    print("[main] train starts..")
    model_cfg = model_config_from_args(args,
                                       dropout_rate=args.dropout_rate)
    train_cfg = TrainConfig(
        batch_size=args.batch_size, lr=args.lr, lr_decay=args.lr_decay,
        lr_decay_step=args.lr_decay_step, max_epoch_num=args.max_epoch_num,
        min_epoch_num=args.min_epoch_num, step_interval=args.step_interval,
        pos_weight=args.pos_weight, optim_type=args.optim_type,
        device_resident=getattr(args, "device_resident", "auto"))

    print("reading data..")
    stream = getattr(args, "stream", "auto")
    if stream == "auto":
        # big training files stream from disk (bounded memory); small ones
        # load once for exact-permutation shuffling. Streaming is
        # single-host, so multi-process runs always load in memory.
        try:
            size = os.path.getsize(args.train_file)
        except OSError:
            size = 0
        import jax as _jax
        stream = ("yes" if size > 8 << 30 and _jax.process_count() == 1
                  else "no")
    if stream == "yes":
        from ..io.dataset import StreamingFeatureDataset
        print("using streaming (block-shuffled) training dataset..")
        train_ds = StreamingFeatureDataset(args.train_file,
                                           model_cfg.seq_len,
                                           model_cfg.signal_len)
    else:
        train_ds = FeatureDataset.from_file(args.train_file,
                                            model_cfg.seq_len,
                                            model_cfg.signal_len)
    valid_ds = FeatureDataset.from_file(args.valid_file, model_cfg.seq_len,
                                        model_cfg.signal_len)

    model_dir = args.model_dir
    if model_dir != "/":
        model_dir = os.path.abspath(model_dir).rstrip("/")
        os.makedirs(model_dir, exist_ok=True)
        if not getattr(args, "resume", False):
            clean_old_ckpts(model_dir, model_cfg.module)
    model_dir += "/"

    return train_loop(model_cfg, train_cfg, train_ds, valid_ds, model_dir,
                      init_model=getattr(args, "init_model", None),
                      t_start=t_start,
                      resume=getattr(args, "resume", False))


def train_loop(model_cfg: ModelConfig, train_cfg: TrainConfig,
               train_ds: FeatureDataset, valid_ds: FeatureDataset,
               model_dir: str | None, init_model: str | None = None,
               t_start: float | None = None, verbose: bool = True,
               resume: bool = False) -> dict:
    """The core loop, reusable by denoise (which trains many small models).

    Multi-process (pod) mode: when ``jax.process_count() > 1`` the batch is
    sharded over a GLOBAL mesh — every host holds a row shard of the
    (identically loaded) datasets, feeds its local slice of each global
    batch via ``jax.make_array_from_process_local_data``, and XLA inserts
    the gradient psum over ICI/DCN. Step counts per epoch are derived from
    global sizes so all hosts run the same number of collectives.
    """
    from ..parallel.dist import process_info
    from ..parallel.multihost import global_mesh, host_row_shard, to_global

    t_start = t_start or time.time()
    pid, pcount = process_info()
    multihost = pcount > 1
    if multihost and not hasattr(train_ds, "batch_at"):
        raise ValueError("streaming datasets are single-host only; "
                         "pre-shard the file per host instead")
    if multihost:
        mesh = global_mesh()
        sharding = batch_sharding(mesh)
        total_dev = mesh.devices.size
        global_bs = ((train_cfg.batch_size + total_dev - 1)
                     // total_dev) * total_dev
        batch_size = global_bs // pcount          # this host's slice
        n_train_global = len(train_ds)
        n_valid_global = len(valid_ds)
        # multihost resident: every host keeps the full (identically
        # loaded) datasets and uploads its devices' contiguous row
        # blocks; host-fed mode takes the strided per-host row shard
        # (streaming datasets were rejected above, so batch_at holds)
        resident_mh = (train_cfg.device_resident != "never"
                       and (dataset_nbytes(train_ds)
                            + dataset_nbytes(valid_ds)) // pcount
                       <= RESIDENT_MAX_BYTES)
        if not resident_mh:
            train_ds = train_ds.take(host_row_shard(len(train_ds)))
            valid_ds = valid_ds.take(host_row_shard(len(valid_ds)))
    else:
        resident_mh = False
        mesh = make_mesh()
        # single-device: plain jit (the SPMD partitioner only adds compile
        # latency); multi-device: shard the batch axis over the mesh
        sharding = batch_sharding(mesh) if mesh.devices.size > 1 else None
        ndev = mesh.devices.size
        batch_size = ((train_cfg.batch_size + ndev - 1) // ndev) * ndev
        global_bs = batch_size
        n_train_global = len(train_ds)
        n_valid_global = len(valid_ds)

    rng_np = np.random.default_rng(train_cfg.seed)
    params = init_params(jax.random.PRNGKey(train_cfg.seed), model_cfg)
    if init_model is not None:
        print(f"loading pre-trained model: {init_model}")
        params = load_any_checkpoint(init_model, model_cfg)
    params = jax.device_put(params)

    def _feed(batch, labels, mask):
        """Host-local numpy -> device inputs (global arrays on pods)."""
        labels = np.asarray(labels)
        if not multihost:
            return batch, jnp.asarray(labels), mask
        gb = to_global(sharding, batch, global_bs)
        gl = to_global(sharding, labels, global_bs)
        gm = to_global(sharding, mask, global_bs)
        return gb, gl, gm

    # equal per-host steps derived from the GLOBAL row count: hosts must
    # execute the same number of (collective-bearing) steps per epoch
    steps_per_epoch = max(1, int(np.ceil(
        np.ceil(n_train_global / pcount) / batch_size)))
    schedule = step_decay_schedule(train_cfg.lr, steps_per_epoch,
                                   train_cfg.lr_decay_step,
                                   train_cfg.lr_decay)
    tx = make_optimizer(train_cfg.optim_type, schedule)
    opt_state = tx.init(params)

    class_weights = np.array([1.0, train_cfg.pos_weight], np.float32)
    train_step = make_train_step(model_cfg, tx, class_weights,
                                 train_cfg.clip_grad, sharding)
    eval_step = make_eval_step(model_cfg, sharding)
    eval_counts_step = (make_eval_counts_step(model_cfg, class_weights,
                                              sharding)
                        if multihost else None)

    def _evaluate(params):
        if not multihost:
            return evaluate(params, valid_ds, eval_step, batch_size,
                            class_weights)
        # fixed step count from the GLOBAL size; aggregate replicated counts
        steps_eval = max(1, int(np.ceil(
            np.ceil(n_valid_global / pcount) / batch_size)))
        n_local = len(valid_ds)
        batch_losses = []
        totals = np.zeros(5, np.float64)  # correct, total, tp, fp, fn
        for i in range(steps_eval):
            lo = i * batch_size
            idx = np.arange(lo, min(lo + batch_size, n_local))
            n_valid = len(idx)
            if n_valid < batch_size:
                idx = np.concatenate(
                    [idx, np.zeros(batch_size - n_valid, np.int64)])
            vb, vy = valid_ds.batch_at(idx)
            vmask = np.zeros(batch_size, np.float32)
            vmask[:n_valid] = 1.0
            gb, gl, gm = _feed(vb, vy, vmask)
            counts = np.asarray(eval_counts_step(params, gb, gl, gm),
                                np.float64)
            batch_losses.append(counts[0])
            totals += counts[1:]
        return _metrics_from_counts(float(np.mean(batch_losses)), totals)

    # device-resident data plane: single-device, in-memory datasets that
    # fit HBM next to the model (see the module-level section comment)
    resident = (train_cfg.device_resident != "never" and not multihost
                and sharding is None and hasattr(train_ds, "batch_at")
                and hasattr(valid_ds, "batch_at")
                and dataset_nbytes(train_ds) + dataset_nbytes(valid_ds)
                <= RESIDENT_MAX_BYTES)
    evaluate_fn = _evaluate
    if resident:
        dtrain, ltrain = device_put_dataset(train_ds)
        dvalid, lvalid = device_put_dataset(valid_ds)
        steps_eval_res = max(1, int(np.ceil(len(valid_ds) / batch_size)))
        eval_chunk = make_eval_chunk(model_cfg, class_weights, batch_size,
                                     steps_eval_res, len(valid_ds))
        _chunk_cache: dict = {}

        def _train_chunk(k: int):
            if k not in _chunk_cache:
                _chunk_cache[k] = make_train_chunk(
                    model_cfg, tx, class_weights, train_cfg.clip_grad, k,
                    batch_size, len(train_ds))
            return _chunk_cache[k]

        evaluate_fn = _resident_eval_fn(
            lambda params: eval_chunk(params, dvalid, lvalid))
        if verbose:
            print("device-resident data plane: {} train + {} valid rows "
                  "in HBM, {} steps/dispatch".format(
                      len(train_ds), len(valid_ds),
                      train_cfg.step_interval))

    # sharded-resident plane: multi-device meshes hold the dataset
    # SHARDED over the row axis — each device shuffles and gathers from
    # its own shard (stratified shuffling; PARITY.md) and the scan body
    # psums loss terms + grads exactly like the host-fed shard_map step.
    # On pods (resident_mh) every host uploads its devices' contiguous
    # row blocks via make_array_from_process_local_data.
    resident_sharded = (not resident and sharding is not None
                        and (resident_mh
                             or (train_cfg.device_resident != "never"
                                 and not multihost
                                 and hasattr(train_ds, "batch_at")
                                 and hasattr(valid_ds, "batch_at")
                                 and dataset_nbytes(train_ds)
                                 + dataset_nbytes(valid_ds)
                                 <= RESIDENT_MAX_BYTES)))
    if resident_sharded:
        ndev = mesh.devices.size
        local_B = global_bs // ndev
        tb_, tl_, tvalid_, n_train_padded = shard_dataset_rows(train_ds,
                                                               mesh)
        vb_, vl_, vvalid_, n_valid_padded = shard_dataset_rows(valid_ds,
                                                               mesh)
        if multihost:
            _up_sharded = lambda t, rows: to_global(  # noqa: E731
                sharding, t, rows)
        else:
            # jitted identity with explicit out_shardings (bare
            # device_put can stall on remote-attached links; see
            # to_device) — serves the datasets and the per-epoch perms
            _jit_up = jax.jit(lambda x: x, out_shardings=sharding)
            _up_sharded = lambda t, rows: _jit_up(t)  # noqa: E731
        dtrain, ltrain, tvalid_mask = _up_sharded((tb_, tl_, tvalid_),
                                                  n_train_padded)
        dvalid, lvalid, vvalid_mask = _up_sharded((vb_, vl_, vvalid_),
                                                  n_valid_padded)
        steps_eval_sh = max(1, -(-(n_valid_padded // ndev) // local_B))
        eval_chunk_sh = make_eval_chunk_sharded(
            model_cfg, class_weights, local_B, steps_eval_sh, sharding)
        _chunk_cache_sh: dict = {}

        def _train_chunk_sh(k: int):
            if k not in _chunk_cache_sh:
                _chunk_cache_sh[k] = make_train_chunk_sharded(
                    model_cfg, tx, class_weights, train_cfg.clip_grad, k,
                    local_B, sharding)
            return _chunk_cache_sh[k]

        evaluate_fn = _resident_eval_fn(
            lambda params: eval_chunk_sh(params, dvalid, lvalid,
                                         vvalid_mask))
        if verbose:
            print("sharded device-resident data plane: {} train + {} "
                  "valid rows over {} devices, {} steps/dispatch".format(
                      len(train_ds), len(valid_ds), ndev,
                      train_cfg.step_interval))

    # chunked-resident (spill) plane, VERDICT r4 item 4: a single-device
    # in-memory dataset TOO BIG for HBM streams through it in slabs —
    # each slab is uploaded once (double-buffered: the next slab's
    # transfer overlaps the current slab's scan dispatches) and trains
    # with the same one-dispatch-per-interval chunks as the resident
    # plane. Shuffling is two-level (slab order + within-slab
    # permutation, both from the run's host rng stream) — the same
    # block-shuffle semantics the host-fed path already applies to
    # streaming datasets. Replaces the per-step host-fed fallback
    # (~73k samples/s in BENCH_r04) for any dataset size.
    resident_spill = (not resident and not resident_sharded
                      and train_cfg.device_resident != "never"
                      and not multihost and sharding is None
                      and hasattr(train_ds, "batch_at")
                      and hasattr(valid_ds, "batch_at")
                      and dataset_nbytes(valid_ds) * 4
                      <= RESIDENT_MAX_BYTES)
    if resident_spill:
        dvalid, lvalid = device_put_dataset(valid_ds)
        steps_eval_sp = max(1, int(np.ceil(len(valid_ds) / batch_size)))
        eval_chunk_sp = make_eval_chunk(model_cfg, class_weights,
                                        batch_size, steps_eval_sp,
                                        len(valid_ds))
        evaluate_fn = _resident_eval_fn(
            lambda params: eval_chunk_sp(params, dvalid, lvalid))
        # slab wire: re-uploads recur EVERY epoch (unlike the one-time
        # resident upload), and on remote-attached links the transfer —
        # not the chip — bounds the plane. int8 (the inference engine's
        # remote wire: symmetric per-slab scales, dequant after the
        # B-row gather on device) ships ~5.3x fewer bytes than f32;
        # values are 6-decimal-rounded extractor outputs and forward
        # computes in bf16 on TPU regardless, so the added noise is
        # amax/254 per field. Auto mirrors the engine's attachment
        # policy (call_mods.resolve_transfer_dtype): int8 only behind a
        # remote link — on directly-attached chips the transfer is
        # ~free, so skip the quantization noise and ship f16.
        from ..utils.fastparse import native_available
        from .call_mods import mesh_is_remote
        _wire_req = os.environ.get("DSP_TRAIN_SPILL_WIRE", "auto")
        if _wire_req == "int8" and not native_available():
            raise ValueError(
                "DSP_TRAIN_SPILL_WIRE=int8 needs the native quantizer "
                "(the numpy path holds the GIL and is slower than f16); "
                "build libdsp_native or use float16")
        spill_int8 = (_wire_req == "int8"
                      or (_wire_req == "auto" and native_available()
                          and mesh_is_remote(mesh)))
        # slab sizing: current + prefetched next slab + valid + model/
        # activations must fit the budget -> each slab gets ~1/3 of what
        # remains after the valid set; whole multiples of batch_size so
        # only the last slab's last step is ragged. Sized in WIRE bytes
        # (what actually lands in HBM), not the host f32 footprint —
        # f32 sizing made int8 slabs ~4x smaller than the budget allows
        # and quadrupled per-epoch upload round trips (review r5).
        L, S = model_cfg.seq_len, model_cfg.signal_len
        if spill_int8:      # int8 kmer/means/stds/signals + f16 lens
            bytes_per_row = L * (1 + 1 + 1 + 2 + S) + 1
        else:               # int8 kmer + f16 floats
            bytes_per_row = L * (1 + 2 + 2 + 2 + 2 * S) + 1
        slab_budget = max(batch_size * bytes_per_row,
                          (RESIDENT_MAX_BYTES
                           - 2 * dataset_nbytes(valid_ds)) // 3)
        slab_rows = min(len(train_ds),
                        max(batch_size, int(slab_budget // bytes_per_row)))
        slab_rows -= slab_rows % batch_size
        slab_rows = max(batch_size, slab_rows)
        n_slabs = -(-len(train_ds) // slab_rows)
        _chunk_cache_sp: dict = {}

        def _train_chunk_sp(k: int, slab_n: int):
            key_ = (k, slab_n)
            if key_ not in _chunk_cache_sp:
                _chunk_cache_sp[key_] = make_train_chunk(
                    model_cfg, tx, class_weights, train_cfg.clip_grad, k,
                    batch_size, slab_n, dequant=spill_int8)
            return _chunk_cache_sp[key_]

        # slab wires are content-static across epochs (only the order
        # and within-slab perms reshuffle): quantize once, cache on host
        # up to a byte cap, re-upload per epoch
        _slab_wire_cache: dict = {}
        _slab_cache_cap = int(os.environ.get(
            "DSP_SPILL_HOST_CACHE_BYTES", 4 << 30))

        def _slab_wire(si: int):
            hit = _slab_wire_cache.get(si)
            if hit is not None:
                return hit
            lo = si * slab_rows
            hi = min(lo + slab_rows, len(train_ds))
            b, l = train_ds.batch_at(np.arange(lo, hi))
            if spill_int8:
                from .call_mods import quantize_for_wire
                wire, scales = quantize_for_wire(b)
            else:
                scales = None
                wire = Batch(kmer=np.asarray(b.kmer, np.int8),
                             base_means=np.asarray(b.base_means,
                                                   np.float16),
                             base_stds=np.asarray(b.base_stds,
                                                  np.float16),
                             base_signal_lens=np.asarray(
                                 b.base_signal_lens, np.float16),
                             signals=np.asarray(b.signals, np.float16))
            # one contiguous blob per slab: the relay charges a fixed
            # per-transfer fee per jit arg, so 6 per-array transfers
            # collapse into one (_slab_unpack bitcasts them back on
            # device; values bit-identical — call_mods blob-dispatch
            # design, round 5)
            blob = np.concatenate(
                [np.ascontiguousarray(a).view(np.uint8).ravel()
                 for a in (*wire, np.asarray(l, np.int8))])
            out = (blob, scales, hi - lo)
            used = sum(c[0].nbytes for c in _slab_wire_cache.values())
            if used + blob.nbytes <= _slab_cache_cap:
                _slab_wire_cache[si] = out
            return out

        _unpack_cache: dict = {}

        def _slab_unpack(n_sl: int):
            """Jitted blob -> ((Batch arrays), labels): passing the
            numpy blob as the single jit arg rides the fast transfer
            path AND unpacks on device in the same dispatch. Cached per
            slab length (2 variants: full + ragged last)."""
            fn = _unpack_cache.get(n_sl)
            if fn is not None:
                return fn
            from .call_mods import _blob_cut
            L = train_ds.kmer.shape[1]
            S = train_ds.signals.shape[2]
            ft = jnp.int8 if spill_int8 else jnp.float16
            fw = 1 if spill_int8 else 2

            def _run(blob):
                off = 0
                kmer, off = _blob_cut(blob, off, n_sl * L, jnp.int8, 1,
                                (n_sl, L))
                means, off = _blob_cut(blob, off, n_sl * L, ft, fw, (n_sl, L))
                stds, off = _blob_cut(blob, off, n_sl * L, ft, fw, (n_sl, L))
                lens, off = _blob_cut(blob, off, n_sl * L, jnp.float16, 2,
                                (n_sl, L))
                sig, off = _blob_cut(blob, off, n_sl * L * S, ft, fw,
                               (n_sl, L, S))
                lab, off = _blob_cut(blob, off, n_sl, jnp.int8, 1, (n_sl,))
                return Batch(kmer, means, stds, lens, sig), lab

            fn = jax.jit(_run)
            _unpack_cache[n_sl] = fn
            return fn

        def _upload_slab(si: int):
            blob, scales, n_sl = _slab_wire(si)
            dev = _slab_unpack(n_sl)(blob)
            return dev, scales, n_sl

        # cross-epoch prefetch state: the executor persists over the
        # whole run so the NEXT epoch's first slab uploads while the
        # current epoch's last slab trains (the first slab of every
        # epoch was otherwise a serial upload stall). Idle threads join
        # at interpreter exit; slab refs die with this closure.
        _sp_state: dict = {"pool": None, "fut": None, "fut_si": None,
                           "next_order": None}

        if verbose:
            print("chunked-resident (spill) data plane: {} train rows "
                  "in {} slab(s) of <= {} rows, {} valid rows in HBM, "
                  "{} steps/dispatch".format(
                      len(train_ds), n_slabs, slab_rows, len(valid_ds),
                      train_cfg.step_interval))

    if verbose:
        print("total_step: {}".format(steps_per_epoch))
    curr_best_accuracy = 0.0
    best_ckpt = None
    key = jax.random.PRNGKey(train_cfg.seed + 1)
    global_step = 0
    epochs_run = 0
    start_epoch = 0
    state_path = (train_state_path(model_dir, model_cfg.module)
                  if model_dir is not None else None)
    if resume and state_path is not None:
        if not multihost:
            have_state = os.path.exists(state_path)
            st = load_train_state(state_path) if have_state else None
        else:
            # only process 0 reads the state (model_dir may be host-local);
            # everything resumable is broadcast so every host starts at the
            # same epoch/step and runs identical collective sequences
            from jax.experimental import multihost_utils as mhu
            have0 = pid == 0 and os.path.exists(state_path)
            have_state = bool(np.asarray(
                mhu.broadcast_one_to_all(np.asarray(have0))))
            st = None
            if have_state:
                if pid == 0:
                    st = load_train_state(state_path)
                    small = np.array([st["epoch"], st["global_step"],
                                      st["best_accuracy"]], np.float64)
                    p_tree, o_tree = st["params"], st["opt_state"]
                else:
                    small = np.zeros(3, np.float64)
                    p_tree = jax.device_get(params)
                    o_tree = jax.device_get(opt_state)
                small = np.asarray(mhu.broadcast_one_to_all(small))
                p_tree = mhu.broadcast_one_to_all(p_tree)
                o_tree = mhu.broadcast_one_to_all(o_tree)
                st = {"params": p_tree, "opt_state": o_tree,
                      "epoch": int(small[0]), "global_step": int(small[1]),
                      "best_accuracy": float(small[2])}
        if have_state:
            params = jax.device_put(st["params"])
            opt_state = jax.device_put(st["opt_state"])
            start_epoch = st["epoch"]
            global_step = st["global_step"]
            curr_best_accuracy = st["best_accuracy"]
            if verbose:
                print("resuming training from epoch {} (step {})".format(
                    start_epoch, global_step))
    epoch_seconds: list[float] = []
    for epoch in range(start_epoch, train_cfg.max_epoch_num):
        curr_best_accuracy_epoch = 0.0
        no_best_model = True
        tlosses: list[float] = []
        tic = time.time()
        epoch_t0 = tic
        # exactly steps_per_epoch iterations on every host (hosts' shards
        # can differ by a row; collectives require identical step counts)
        def _epoch_batches():
            if hasattr(train_ds, "batch_at"):
                perm = rng_np.permutation(len(train_ds))
                for i in range(steps_per_epoch):
                    idx = perm[i * batch_size:(i + 1) * batch_size]
                    nv = len(idx)
                    if nv < batch_size:
                        idx = np.concatenate(
                            [idx, np.zeros(batch_size - nv, np.int64)])
                    b, l = train_ds.batch_at(idx)
                    yield b, l, nv
            else:   # streaming dataset: block-shuffled epoch
                yield from train_ds.iter_batches(
                    batch_size, shuffle=True, rng=rng_np,
                    pad_to_batch=True)

        def _eval_boundary(step_in_epoch: int):
            """Shared eval + best-ckpt + log block (host and resident
            paths), run at every step_interval boundary / epoch end."""
            nonlocal curr_best_accuracy, curr_best_accuracy_epoch
            nonlocal no_best_model, best_ckpt, tlosses, tic
            stats = evaluate_fn(params)
            v_acc = stats["accuracy"]
            if v_acc > curr_best_accuracy_epoch:
                curr_best_accuracy_epoch = v_acc
                if curr_best_accuracy_epoch > curr_best_accuracy - 0.0002:
                    if model_dir is not None and pid == 0:
                        best_ckpt = ckpt_name(model_dir, model_cfg.module,
                                              model_cfg.seq_len,
                                              model_cfg.signal_len,
                                              epoch + 1)
                        save_checkpoint(best_ckpt, jax.device_get(params),
                                        model_cfg)
                    if curr_best_accuracy_epoch > curr_best_accuracy:
                        curr_best_accuracy = curr_best_accuracy_epoch
                        no_best_model = False
            if verbose:
                print("Epoch [{}/{}], Step [{}/{}], TrainLoss: {:.4f}; "
                      "ValidLoss: {:.4f}, Accuracy: {:.4f}, "
                      "Precision: {:.4f}, Recall: {:.4f}, "
                      "curr_epoch_best_accuracy: {:.4f}; Time: {:.2f}s"
                      .format(epoch + 1, train_cfg.max_epoch_num,
                              step_in_epoch, steps_per_epoch,
                              float(np.mean([float(x) for x in tlosses])),
                              stats["loss"], v_acc, stats["precision"],
                              stats["recall"], curr_best_accuracy_epoch,
                              time.time() - tic))
                sys.stdout.flush()
            tlosses = []
            tic = time.time()

        if resident or resident_sharded:
            # epoch = a handful of dispatches: one jitted scan of up to
            # step_interval steps per eval interval. Single-device mode
            # draws the permutation from the SAME host rng stream as the
            # host path, so a given seed produces identical epoch orders
            # in both modes; sharded mode draws one per shard. Uploaded
            # once per epoch — committed device arrays aren't
            # re-transferred by each chunk dispatch.
            if resident:
                perm = to_device(pad_epoch_perm(
                    rng_np.permutation(len(train_ds)), steps_per_epoch,
                    batch_size))
            else:
                perm = _up_sharded(
                    sharded_epoch_perm(rng_np, n_train_padded // ndev,
                                       mesh, steps_per_epoch, local_B),
                    ndev * steps_per_epoch * local_B)
            s0 = 0
            while s0 < steps_per_epoch:
                k = min(train_cfg.step_interval, steps_per_epoch - s0)
                if resident:
                    params, opt_state, losses = _train_chunk(k)(
                        params, opt_state, dtrain, ltrain, perm, s0,
                        global_step, key)
                else:
                    params, opt_state, losses = _train_chunk_sh(k)(
                        params, opt_state, dtrain, ltrain, tvalid_mask,
                        perm, s0, global_step, key)
                global_step += k
                s0 += k
                tlosses.extend(np.asarray(losses).tolist())
                _eval_boundary(s0)
        elif resident_spill:
            # slab order reshuffles every epoch; slab si+1's upload runs
            # on a single prefetch thread while slab si trains. Eval
            # cadence matches the host path: every step_interval steps
            # of the EPOCH (carry tracks the remainder across slabs).
            from concurrent.futures import ThreadPoolExecutor
            if _sp_state["pool"] is None:
                _sp_state["pool"] = ThreadPoolExecutor(max_workers=1)
            pool = _sp_state["pool"]
            if _sp_state["next_order"] is not None:
                slab_order = _sp_state.pop("next_order")
            else:
                slab_order = rng_np.permutation(n_slabs)
            step_in_epoch = 0
            carry = 0
            pending_losses: list = []

            def _drain_losses():
                # loss fetches are deferred to eval boundaries: a
                # per-chunk np.asarray would force one device round
                # trip per slab and serialize the upload/compute
                # overlap. Concatenate on HOST — a device
                # jnp.concatenate eagerly compiles one executable per
                # distinct ordering of the slab loss shapes (4 slabs ->
                # up to 4 one-off ~300ms relay compiles, measured as 4
                # slow epochs before steady state)
                if pending_losses:
                    tlosses.extend(np.concatenate(
                        [np.asarray(x) for x in pending_losses]).tolist())
                    pending_losses.clear()

            if _sp_state["fut"] is None or \
                    _sp_state["fut_si"] != int(slab_order[0]):
                _sp_state["fut"] = pool.submit(_upload_slab,
                                               int(slab_order[0]))
            for oi in range(n_slabs):
                (dtrain_sp, ltrain_sp), scales_sp, slab_n = \
                    _sp_state["fut"].result()
                if oi + 1 < n_slabs:
                    nxt = int(slab_order[oi + 1])
                elif epoch + 1 < train_cfg.max_epoch_num:
                    # cross-epoch: prefetch the NEXT epoch's first slab
                    # while this epoch's last slab trains (its order is
                    # drawn now, consumed at the next epoch's entry);
                    # skipped after the final epoch — nothing consumes it
                    _sp_state["next_order"] = rng_np.permutation(n_slabs)
                    nxt = int(_sp_state["next_order"][0])
                else:
                    nxt = None
                if nxt is not None:
                    _sp_state["fut"] = pool.submit(_upload_slab, nxt)
                    _sp_state["fut_si"] = nxt
                else:
                    _sp_state["fut"] = _sp_state["fut_si"] = None
                steps_slab = -(-slab_n // batch_size)
                # perm rides the dispatch as a numpy arg (the jit
                # fast path) — no separate upload round trip
                perm = pad_epoch_perm(
                    rng_np.permutation(slab_n), steps_slab,
                    batch_size)
                s0 = 0
                while s0 < steps_slab:
                    # chunk lengths ignore the eval carry so the jit
                    # cache stays at <= 2 keys per slab shape (a
                    # carry-ragged k cycled through O(step_interval)
                    # distinct scan compiles, ~300ms each over the
                    # relay); eval fires at the first chunk boundary
                    # past the interval instead of exactly on it
                    k = min(train_cfg.step_interval, steps_slab - s0)
                    params, opt_state, losses = _train_chunk_sp(
                        k, slab_n)(params, opt_state, dtrain_sp,
                                   ltrain_sp, perm, s0, global_step,
                                   key, scales_sp)
                    global_step += k
                    s0 += k
                    step_in_epoch += k
                    carry += k
                    pending_losses.append(losses)
                    if carry >= train_cfg.step_interval:
                        carry = 0
                        _drain_losses()
                        _eval_boundary(step_in_epoch)
                del dtrain_sp, ltrain_sp, perm   # free HBM slab
            _drain_losses()
            if carry:
                _eval_boundary(step_in_epoch)
        else:
            for i, (batch, labels, n_valid) in enumerate(_epoch_batches()):
                mask = np.zeros(batch_size, np.float32)
                mask[:n_valid] = 1.0
                step_key = jax.random.fold_in(key, global_step)
                fb, fl, fm = _feed(batch, labels, mask)
                params, opt_state, loss = train_step(params, opt_state, fb,
                                                     fl, fm, step_key)
                tlosses.append(loss)
                global_step += 1

                if (i + 1) % train_cfg.step_interval == 0 \
                        or (i + 1) == steps_per_epoch:
                    _eval_boundary(i + 1)
        epochs_run = epoch + 1
        epoch_seconds.append(time.time() - epoch_t0)
        if state_path is not None and pid == 0:
            save_train_state(state_path, params, opt_state, epoch + 1,
                             global_step, curr_best_accuracy)
        if no_best_model and epoch >= train_cfg.min_epoch_num - 1:
            if verbose:
                print("early stop!")
            break

    if verbose:
        print("[main] train costs {:.1f} seconds, best accuracy: {}".format(
            time.time() - t_start, curr_best_accuracy))
    return {"best_accuracy": curr_best_accuracy, "best_ckpt": best_ckpt,
            "epochs_run": epochs_run, "params": jax.device_get(params),
            # wall per epoch (training dispatches + eval boundaries, not
            # dataset upload/compile): epoch 0 pays the compiles, later
            # entries are the steady-state rate bench.py reports
            "epoch_seconds": epoch_seconds}
