"""denoise — cross-rank filter-and-retrain label cleaning.

Reference behavior (denoise.py:318-383): for up to ``--iterations``, run
``--rounds`` of cross-rank (random-halve the train file; train a fresh
small model on each half for ``--epoch_num`` epochs — stopping early once
running train accuracy >= 0.95 — and score the held-out half), average each
sample's positive-class probability over all scores, keep positives with
mean >= score_cf (and optionally negatives < 1-score_cf), re-balance
negatives to the positives' k-mer distribution, shuffle-concat into the
next iteration's train file; stop when the kept ratio >= kept_ratio.

TPU-native changes: each mini-training reuses one jitted train/eval step
(same static batch shape => one compile serves all 2*rounds*iterations
trainings), the file is vector-parsed once per iteration, and the halves
are index splits of the in-memory dataset instead of temp half-files.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, TrainConfig
from ..io.dataset import FeatureDataset
from ..models.bilstm import init_params
from ..ops.optim import make_optimizer, step_decay_schedule
from ..parallel.mesh import batch_sharding, make_mesh
from ..utils import metrics as M
from ..utils.fileio import (count_lines, select_neg_rows_as_pos_kmer_dist,
                            shuffle_concat)
from .train import make_eval_step, make_train_step


def get_model_type_str(model_type: str, is_base: bool,
                       is_signallen: bool) -> str:
    """File-tag string (process_utils.py:533-539)."""
    if model_type != "signal_bilstm":
        basestr = "with_base" if is_base else "no_base"
        slenstr = "with_slen" if is_signallen else "no_slen"
        return "_".join([model_type, basestr, slenstr])
    return model_type


class CrossRankTrainer:
    """Train-on-half / score-other-half with jit reuse across rounds."""

    def __init__(self, model_cfg: ModelConfig, train_cfg: TrainConfig):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        mesh = make_mesh()
        self.mesh = mesh
        self.sharding = batch_sharding(mesh) if mesh.devices.size > 1 \
            else None
        ndev = mesh.devices.size
        self.batch_size = ((train_cfg.batch_size + ndev - 1) // ndev) * ndev
        self.class_weights = np.array([1.0, train_cfg.pos_weight],
                                      np.float32)
        # jitted steps cached by steps_per_epoch (the only value baked into
        # the schedule closure): one compile serves every mini-training of
        # the same shape across all rounds and iterations
        self._step_cache: dict[int, tuple] = {}
        self.eval_step = make_eval_step(model_cfg, self.sharding)
        # device-resident mini-trainings: the halves stay in HBM (row-
        # sharded over multi-device meshes) and each epoch is ONE
        # dispatch (a lax.scan over all its steps, with the reference's
        # per-interval batch-accuracy early-break signal computed
        # in-scan). The denoise loop runs up to 60 mini-trainings of
        # hundreds of steps each — per-step dispatch latency, not
        # compute, dominates it on remote-attached rigs. Cached by
        # (steps, n_rows): half sizes repeat across the ROUNDS of one
        # iteration (two compiles per iteration), but the train file
        # shrinks between iterations, so each iteration recompiles —
        # hence RESIDENT_MIN_ROWS below.
        self.resident = (train_cfg.device_resident != "never"
                         and jax.process_count() == 1)
        self._chunk_cache: dict[tuple, tuple] = {}
        self._score_cache: dict[tuple, object] = {}
        # one jitted identity per trainer (a per-call jit would recompile
        # the transfer up to 2*rounds*iterations times)
        self._up_sharded = (jax.jit(lambda x: x,
                                    out_shardings=self.sharding)
                            if self.sharding is not None else None)

    #: below this many train rows the per-iteration scan recompiles
    #: (dataset sizes shrink every denoise iteration, so chunk compiles
    #: can't be reused across iterations) outweigh the dispatch savings;
    #: measured a wash at 16k rows on the remote-attached rig
    RESIDENT_MIN_ROWS = int(os.environ.get(
        "DSP_DENOISE_RESIDENT_MIN_ROWS", 100_000))

    def _use_resident(self, train_ds, score_ds) -> bool:
        """Resident gate: in-memory halves that fit HBM and are big
        enough that one-dispatch epochs beat the per-iteration compile
        cost (single process; multi-device meshes run the row-sharded
        variant)."""
        from .train import RESIDENT_MAX_BYTES, dataset_nbytes
        if not (self.resident and hasattr(train_ds, "batch_at")
                and hasattr(score_ds, "batch_at")):
            return False
        if len(train_ds) < self.RESIDENT_MIN_ROWS:
            return False
        return (dataset_nbytes(train_ds) + dataset_nbytes(score_ds)
                <= RESIDENT_MAX_BYTES)

    def _get_chunk(self, steps_per_epoch: int, n_rows: int,
                   acc_interval: int):
        from .train import make_train_chunk, make_train_chunk_sharded
        # the sharded chunk bakes no row count (masks derive from the
        # runtime shapes), so one wrapper serves both halves of a round
        # and jax's jit cache dedupes equal-shape compiles
        k = (steps_per_epoch,
             None if self.sharding is not None else n_rows, acc_interval)
        cached = self._chunk_cache.get(k)
        if cached is None:
            schedule = step_decay_schedule(self.train_cfg.lr,
                                           steps_per_epoch, 2, 0.1)
            tx = make_optimizer("Adam", schedule)
            if self.sharding is None:
                chunk = make_train_chunk(self.model_cfg, tx,
                                         self.class_weights,
                                         self.train_cfg.clip_grad,
                                         steps_per_epoch, self.batch_size,
                                         n_rows,
                                         acc_interval=acc_interval)
            else:
                local_b = self.batch_size // self.mesh.devices.size
                chunk = make_train_chunk_sharded(
                    self.model_cfg, tx, self.class_weights,
                    self.train_cfg.clip_grad, steps_per_epoch, local_b,
                    self.sharding, acc_interval=acc_interval)
            cached = (tx, chunk)
            self._chunk_cache[k] = cached
        return cached

    def _get_score_chunk(self, k_steps: int, n_rows: int):
        from .train import make_score_chunk, make_score_chunk_sharded
        key = (k_steps,
               None if self.sharding is not None else n_rows)
        if key not in self._score_cache:
            if self.sharding is None:
                self._score_cache[key] = make_score_chunk(
                    self.model_cfg, self.batch_size, k_steps, n_rows)
            else:
                local_b = self.batch_size // self.mesh.devices.size
                self._score_cache[key] = make_score_chunk_sharded(
                    self.model_cfg, local_b, k_steps, self.sharding)
        return self._score_cache[key]

    def _get_step(self, steps_per_epoch: int):
        """-> (tx, train_step), compiled once per steps_per_epoch."""
        cached = self._step_cache.get(steps_per_epoch)
        if cached is None:
            schedule = step_decay_schedule(self.train_cfg.lr,
                                           steps_per_epoch, 2, 0.1)
            tx = make_optimizer("Adam", schedule)
            step = make_train_step(self.model_cfg, tx, self.class_weights,
                                   self.train_cfg.clip_grad, self.sharding)
            cached = (tx, step)
            self._step_cache[steps_per_epoch] = cached
        return cached

    def train_then_score(self, train_ds: FeatureDataset,
                         score_ds: FeatureDataset, seed: int,
                         epoch_num: int, step_interval: int,
                         verbose: bool = False) -> np.ndarray:
        """Train a fresh model on train_ds, return prob_1 of every score_ds
        row (reference train_1time, denoise.py:28-170)."""
        cfg, tcfg = self.model_cfg, self.train_cfg
        rng_np = np.random.default_rng(seed)
        params = init_params(jax.random.PRNGKey(seed), cfg)
        steps_per_epoch = max(1, int(np.ceil(len(train_ds) / self.batch_size)))
        key = jax.random.PRNGKey(seed + 7)

        if self._use_resident(train_ds, score_ds):
            return self._train_then_score_resident(
                train_ds, score_ds, rng_np, params, key, steps_per_epoch,
                epoch_num, step_interval, verbose)

        tx, train_step = self._get_step(steps_per_epoch)
        opt_state = tx.init(params)

        gstep = 0
        for epoch in range(epoch_num):
            epoch_accs: list[float] = []
            for i, (batch, labels, n_valid) in enumerate(
                    train_ds.iter_batches(self.batch_size, shuffle=True,
                                          rng=rng_np, pad_to_batch=True)):
                mask = np.zeros(self.batch_size, np.float32)
                mask[:n_valid] = 1.0
                params, opt_state, loss = train_step(
                    params, opt_state, batch, jnp.asarray(labels), mask,
                    jax.random.fold_in(key, gstep))
                gstep += 1
                if (i + 1) % step_interval == 0:
                    pred, _, _ = self.eval_step(params, batch)
                    acc = M.accuracy(labels[:n_valid],
                                     np.asarray(pred)[:n_valid])
                    epoch_accs.append(acc)
                    if verbose:
                        print("Epoch [{}/{}], Step [{}/{}], "
                              "TrainLoss: {:.4f}, Accuracy: {:.4f}".format(
                                  epoch + 1, epoch_num, i + 1,
                                  steps_per_epoch, float(loss), acc))
                        sys.stdout.flush()
            # reference early break: running train accuracy >= .95
            # (denoise.py:108)
            if epoch_accs and np.mean(epoch_accs) >= 0.95:
                break

        probs1 = np.empty(len(score_ds), np.float32)
        out = 0
        for batch, _labels, n_valid in score_ds.iter_batches(
                self.batch_size, shuffle=False, pad_to_batch=True):
            _pred, probs, _logits = self.eval_step(params, batch)
            probs1[out:out + n_valid] = np.asarray(probs)[:n_valid, 1]
            out += n_valid
        return probs1

    def _train_then_score_resident(self, train_ds, score_ds, rng_np,
                                   params, key, steps_per_epoch: int,
                                   epoch_num: int, step_interval: int,
                                   verbose: bool) -> np.ndarray:
        """Resident variant of train_then_score: one dispatch per epoch +
        one scoring dispatch, same rng streams as the host path (same
        epoch permutations, same fold_in dropout) so results match."""
        from .train import (device_put_dataset, device_put_dataset_sharded,
                            pad_epoch_perm, sharded_epoch_perm, to_device)
        B = self.batch_size
        sharded = self.sharding is not None
        tx, chunk = self._get_chunk(steps_per_epoch, len(train_ds),
                                    step_interval)
        opt_state = tx.init(params)
        if sharded:
            ndev = self.mesh.devices.size
            local_b = B // ndev
            dtrain, ltrain, tvalid, n_tpad = device_put_dataset_sharded(
                train_ds, self.mesh, self._up_sharded)
            dscore, _, _, n_spad = device_put_dataset_sharded(
                score_ds, self.mesh, self._up_sharded)
        else:
            dtrain, ltrain = device_put_dataset(train_ds)
            dscore, _ = device_put_dataset(score_ds)

        gstep = 0
        for epoch in range(epoch_num):
            # same rng stream position as iter_batches(shuffle=True)
            if sharded:
                perm = self._up_sharded(sharded_epoch_perm(
                    rng_np, n_tpad // ndev, self.mesh, steps_per_epoch,
                    local_b))
                params, opt_state, losses, accs = chunk(
                    params, opt_state, dtrain, ltrain, tvalid, perm, 0,
                    gstep, key)
            else:
                perm = to_device(pad_epoch_perm(
                    rng_np.permutation(len(train_ds)), steps_per_epoch,
                    B))
                params, opt_state, losses, accs = chunk(
                    params, opt_state, dtrain, ltrain, perm, 0, gstep,
                    key)
            gstep += steps_per_epoch
            accs = np.asarray(accs)
            epoch_accs = accs[accs >= 0.0]
            if verbose:
                losses = np.asarray(losses)
                for j, acc in zip(np.flatnonzero(accs >= 0.0), epoch_accs):
                    print("Epoch [{}/{}], Step [{}/{}], TrainLoss: {:.4f},"
                          " Accuracy: {:.4f}".format(
                              epoch + 1, epoch_num, j + 1, steps_per_epoch,
                              float(losses[j]), float(acc)))
                sys.stdout.flush()
            # reference early break: running train accuracy >= .95
            # (denoise.py:108)
            if len(epoch_accs) and float(np.mean(epoch_accs)) >= 0.95:
                break

        if sharded:
            rpd = n_spad // ndev
            k_score = max(1, -(-rpd // local_b))
            # (K, ndev*local_b): device d's local row r sits at
            # [r // local_b, d*local_b + r % local_b]
            p1 = np.asarray(self._get_score_chunk(k_score, n_spad)(
                params, dscore))
            per_dev = p1.reshape(k_score, ndev, local_b) \
                .transpose(1, 0, 2).reshape(ndev, -1)
            counts = np.clip(len(score_ds) - np.arange(ndev) * rpd, 0,
                             rpd)
            return np.concatenate(
                [per_dev[d, :counts[d]] for d in range(ndev)]
            ).astype(np.float32)
        k_score = max(1, int(np.ceil(len(score_ds) / B)))
        p1 = np.asarray(self._get_score_chunk(k_score, len(score_ds))(
            params, dscore))
        return p1.reshape(-1)[:len(score_ds)].astype(np.float32)


def denoise(args) -> str:
    """CLI entry mirroring reference denoise(args) (denoise.py:318).
    Returns the path of the final denoised training file."""
    from ..config import model_config_from_args
    from ..utils.bases import str2bool

    total_start = time.time()
    model_cfg = model_config_from_args(args,
                                       dropout_rate=args.dropout_rate)
    train_cfg = TrainConfig(batch_size=args.batch_size, lr=args.lr,
                            pos_weight=args.pos_weight,
                            step_interval=args.step_interval,
                            device_resident=getattr(args,
                                                    "device_resident",
                                                    "auto"))
    modeltype_str = get_model_type_str(args.model_type,
                                       str2bool(args.is_base),
                                       str2bool(args.is_signallen))
    is_filter_fn = str2bool(args.is_filter_fn)
    rng = np.random.default_rng(getattr(args, "seed", None))
    # the k-mer-balanced negative reselection uses the stdlib rng
    # API (rng.sample); derive it from the same seed stream so a
    # seeded denoise is reproducible end to end instead of falling
    # back to the unseeded global random module
    import random as _random
    py_rng = _random.Random(int(rng.integers(1 << 62)))

    train_file = args.train_file
    # all-negative pool for k-mer-balanced reselection (denoise.py:296)
    fname, fext = os.path.splitext(train_file)
    train_neg_file = fname + ".neg_all." + modeltype_str + fext
    from ..utils.fileio import filter_rows_by_label
    filter_rows_by_label(train_file, train_neg_file, 0)

    trainer = CrossRankTrainer(model_cfg, train_cfg)
    final_file = train_file
    for iter_c in range(args.iterations):
        print("\n###### cross rank to clean samples, Iter: {} ######".format(
            iter_c + 1))
        ds = FeatureDataset.from_file(train_file, model_cfg.seq_len,
                                      model_cfg.signal_len)
        n = len(ds)
        half = n // 2
        score_sum = np.zeros(n, np.float64)
        score_cnt = np.zeros(n, np.int64)
        for r in range(args.rounds):
            print("##########Train Cross Rank, Iter {}, Round {}##########"
                  .format(iter_c + 1, r + 1))
            perm = rng.permutation(n)
            idx1, idx2 = np.sort(perm[:half]), np.sort(perm[half:])
            seed = int(rng.integers(1 << 30))
            # one take() per half: both cross-rank calls see the same
            # objects, so the resident plane's per-dataset device-upload
            # memoization actually hits (each half uploads once per round)
            h1, h2 = ds.take(idx1), ds.take(idx2)
            p2 = trainer.train_then_score(h1, h2, seed, args.epoch_num,
                                          args.step_interval)
            p1 = trainer.train_then_score(h2, h1, seed + 1, args.epoch_num,
                                          args.step_interval)
            score_sum[idx2] += p2
            score_cnt[idx2] += 1
            score_sum[idx1] += p1
            score_cnt[idx1] += 1
        mean_scores = score_sum / np.maximum(score_cnt, 1)

        if iter_c == 0 and getattr(args, "fst_iter_prob", False):
            with open(args.train_file + ".probs_1stiter.txt", "w") as wf:
                for i in range(n):
                    wf.write("\t".join([str(i), str(mean_scores[i])]) + "\n")

        # ---- clean samples (denoise.py:216-293) ----
        print("\n###### clean the samples ######")
        labels = ds.labels
        pos_mask = labels == 1
        neg_mask = ~pos_mask
        keep_pos = pos_mask & (mean_scores >= args.score_cf)
        keep_neg = (neg_mask & (mean_scores < 1 - args.score_cf)
                    if is_filter_fn else np.zeros(n, bool))
        n_pos, n_neg = int(pos_mask.sum()), int(neg_mask.sum())
        print("There are {} positive, {} negative samples in total;".format(
            n_pos, n_neg))
        left_ratio = float(keep_pos.sum()) / n_pos if n_pos else 0.0
        left_ratio2 = float(keep_neg.sum()) / n_neg if n_neg else 0.0
        print("{} ({}) high quality positive samples left, "
              "{} ({}) high quality negative samples left".format(
                  int(keep_pos.sum()), round(left_ratio, 6),
                  int(keep_neg.sum()), round(left_ratio2, 6)))

        if train_file == args.train_file:
            stem = fname + "." + modeltype_str
        else:
            stem = os.path.splitext(train_file)[0]
        pos_file = stem + ".pos.cf" + str(args.score_cf) + fext
        neg_file = (stem + ".neg.cf" + str(args.score_cf) + fext
                    if is_filter_fn else None)
        _write_selected_rows(train_file, pos_file, keep_pos,
                             neg_file, keep_neg)
        if is_filter_fn:
            left_ratio = (left_ratio + left_ratio2) / 2

        # ---- rebuild train file (denoise.py:347-375) ----
        # NOTE: the previous iteration's working file is removed only
        # AFTER a replacement exists — when this iteration filters out
        # every positive, that file IS the returned final_file, and
        # deleting it first would return a path that no longer exists
        prev_file = train_file
        print("\n#####concat denoised file#####")
        pos_num = int(keep_pos.sum())
        if pos_num > 0:
            nfname, nfext = os.path.splitext(train_neg_file)
            seled_neg = nfname + ".r" + str(pos_num) + nfext
            if neg_file is None:
                select_neg_rows_as_pos_kmer_dist(pos_file, train_neg_file,
                                                 seled_neg, rng=py_rng)
            else:
                neg_num = count_lines(neg_file)
                if pos_num <= neg_num:
                    select_neg_rows_as_pos_kmer_dist(pos_file, neg_file,
                                                     seled_neg,
                                                     rng=py_rng)
                    os.remove(neg_file)
                else:
                    seled_neg = neg_file
            tag = ".denoise_fpnp" if is_filter_fn else ".denoise_fp"
            train_file = (os.path.splitext(args.train_file)[0] + "." +
                          modeltype_str + tag + str(iter_c + 1) + fext)
            shuffle_concat(pos_file, seled_neg, train_file, rng=rng)
            os.remove(seled_neg)
            final_file = train_file
            if prev_file != args.train_file:
                os.remove(prev_file)
        else:
            if neg_file is not None:
                os.remove(neg_file)
            print("WARNING: The denoise module denoised all samples in the "
                  "train_file!!!")
        os.remove(pos_file)
        print("#####concat denoised file, finished!#####")

        if left_ratio >= args.kept_ratio or pos_num == 0:
            break

    os.remove(train_neg_file)
    print("###### denoised file for training: {}".format(final_file))
    print("###### denoise totally costs {:.2f} seconds".format(
        time.time() - total_start))
    return final_file


def _write_selected_rows(src: str, pos_file: str, keep_pos: np.ndarray,
                         neg_file: str | None,
                         keep_neg: np.ndarray) -> None:
    wfp = open(pos_file, "w")
    wfn = open(neg_file, "w") if neg_file is not None else None
    with open(src) as rf:
        for i, line in enumerate(rf):
            if keep_pos[i]:
                wfp.write(line)
            elif wfn is not None and keep_neg[i]:
                wfn.write(line)
    wfp.close()
    if wfn is not None:
        wfn.close()
