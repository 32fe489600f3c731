"""Optimizers: the reference's four choices as optax transforms.

Reference set (train.py:79-95): Adam, RMSprop, SGD(momentum=0.8), and
Ranger — RAdam + Lookahead + gradient centralization
(utils/ranger2020.py:43, vendored from lessw2020/Ranger). Here Ranger is
re-composed from optax primitives plus two small custom transforms, all
jit/pjit-safe pure functions of (updates, state, params).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def gradient_centralization() -> optax.GradientTransformation:
    """Subtract the per-output-channel mean from multi-dim gradients
    (ranger2020.py:31: applied to any grad with ndim > 1)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def _gc(g):
            if g.ndim > 1:
                axes = tuple(range(1, g.ndim))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree.map(_gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    slow: optax.Params
    step: jax.Array


def lookahead(k: int = 6, alpha: float = 0.5) -> optax.GradientTransformation:
    """Additive-update Lookahead (Zhang & Hinton 2019; ranger2020.py:198-206).

    Keeps slow weights in optimizer state; every ``k`` steps the emitted
    update lands the fast params on slow + alpha*(fast_new - slow) and the
    slow weights move there too. Unlike optax.lookahead this needs no
    special param wrapper, so it chains after any inner optimizer.
    """

    def init_fn(params):
        # copy, don't alias: params and opt state may both be donated
        return LookaheadState(
            slow=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
            step=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        step = state.step + 1
        sync = (step % k) == 0

        def leaf(u, p, s):
            fast_new = p + u
            synced = s + alpha * (fast_new - s)
            new_u = jnp.where(sync, synced - p, u)
            new_s = jnp.where(sync, synced, s)
            return new_u, new_s

        flat_u, treedef = jax.tree.flatten(updates)
        flat_p = treedef.flatten_up_to(params)
        flat_s = treedef.flatten_up_to(state.slow)
        out = [leaf(u, p, s) for u, p, s in zip(flat_u, flat_p, flat_s)]
        new_updates = treedef.unflatten([o[0] for o in out])
        new_slow = treedef.unflatten([o[1] for o in out])
        return new_updates, LookaheadState(slow=new_slow, step=step)

    return optax.GradientTransformation(init_fn, update_fn)


def ranger(learning_rate, alpha: float = 0.5, k: int = 6,
           b1: float = 0.95, b2: float = 0.999, eps: float = 1e-5,
           threshold: float = 5.0,
           weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Ranger = GC -> RAdam -> Lookahead (ranger2020.py defaults:
    betas (.95, .999), eps 1e-5, N_sma_threshold 5, k=6, alpha=0.5)."""
    chain = [gradient_centralization()]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.radam(learning_rate, b1=b1, b2=b2, eps=eps,
                             threshold=threshold))
    chain.append(lookahead(k=k, alpha=alpha))
    return optax.chain(*chain)


def make_optimizer(optim_type: str, learning_rate
                   ) -> optax.GradientTransformation:
    """Mirror of the reference's optimizer switch (train.py:79-95)."""
    if optim_type == "Adam":
        return optax.adam(learning_rate)
    if optim_type == "RMSprop":
        return optax.rmsprop(learning_rate)
    if optim_type == "SGD":
        return optax.sgd(learning_rate, momentum=0.8)
    if optim_type == "Ranger":
        return ranger(learning_rate)
    raise ValueError("optim_type is not right!")


def step_decay_schedule(base_lr: float, steps_per_epoch: int,
                        decay_step_epochs: int, gamma: float):
    """StepLR equivalent (train.py:96): lr * gamma^(epoch // decay_step),
    with epoch derived from the global step count."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * jnp.power(gamma, epoch // decay_step_epochs)

    return schedule
