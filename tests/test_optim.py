"""Optimizer components: schedule decay semantics, lookahead sync,
gradient centralization."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from deepsignal_plant_tpu.ops.optim import (gradient_centralization,
                                            lookahead, make_optimizer,
                                            ranger, step_decay_schedule)


def test_step_decay_matches_torch_steplr_semantics():
    """StepLR(step_size=2, gamma=0.1) stepped per epoch: lr is constant
    within an epoch and decays by gamma every 2 epochs (train.py:96,181)."""
    sched = step_decay_schedule(0.001, steps_per_epoch=10,
                                decay_step_epochs=2, gamma=0.1)
    for step, want in [(0, 1e-3), (9, 1e-3), (10, 1e-3), (19, 1e-3),
                       (20, 1e-4), (39, 1e-4), (40, 1e-5)]:
        assert float(sched(step)) == pytest.approx(want, rel=1e-5), step


def test_gradient_centralization_subtracts_channel_mean():
    gc = gradient_centralization()
    state = gc.init(None)
    g2 = jnp.arange(12.0).reshape(3, 4)
    g1 = jnp.arange(5.0)
    (o2, o1), _ = gc.update((g2, g1), state)
    np.testing.assert_allclose(np.asarray(o2).mean(axis=1), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1), np.arange(5.0))  # 1-D: as-is


def test_lookahead_syncs_every_k():
    la = lookahead(k=3, alpha=0.5)
    p = {"w": jnp.zeros(2)}
    state = la.init(p)
    # constant inner update of +1 per step
    u = {"w": jnp.ones(2)}
    traj = []
    for _ in range(6):
        upd, state = la.update(u, state, p)
        p = optax.apply_updates(p, upd)
        traj.append(float(p["w"][0]))
    # steps 1,2 move freely; step 3 snaps to slow + 0.5*(fast-slow)
    assert traj[0] == 1.0 and traj[1] == 2.0
    assert traj[2] == pytest.approx(1.5)       # 0 + .5*(3-0)
    assert traj[5] == pytest.approx(1.5 + 0.5 * (traj[4] + 1 - 1.5))


def test_make_optimizer_variants_step():
    for name in ("Adam", "RMSprop", "SGD", "Ranger"):
        tx = make_optimizer(name, 1e-2)
        p = {"w": jnp.ones((4, 4))}
        s = tx.init(p)
        # non-constant per-channel: gradient centralization (in Ranger)
        # correctly removes the mean of a constant gradient
        g = {"w": jnp.arange(16.0).reshape(4, 4) * 0.01}
        u, s = tx.update(g, s, p)
        p2 = optax.apply_updates(p, u)
        assert np.isfinite(np.asarray(p2["w"])).all()
        assert not np.allclose(np.asarray(p2["w"]), 1.0), name
    with pytest.raises(ValueError):
        make_optimizer("Lion", 1e-2)


def test_ranger_converges_quadratic():
    tx = ranger(0.1)
    p = jnp.zeros(4)
    s = tx.init(p)
    for _ in range(400):
        g = 2 * (p - 3.0)
        u, s = tx.update(g, s, p)
        p = optax.apply_updates(p, u)
    np.testing.assert_allclose(np.asarray(p), 3.0, atol=0.2)
