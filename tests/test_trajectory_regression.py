"""Fixed-seed trajectory regression (BASELINE.md: "fixed-seed dynamics-step
trajectory match"; VERDICT r1 item 10).

A 100-step Hover trajectory (positions + quaternions) under seed 0 with a
deterministic action sequence is snapshotted into tests/golden/ and asserted
bit-stable on the CPU backend — catching silent integrator drift across
refactors of the dynamics/controller/transform stack.
"""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = pathlib.Path(__file__).parent / "golden" / "hover_traj_seed0.npz"


def _rollout():
    from mupe_tpu.envs.hover import Hover, HoverCfg

    env = Hover(HoverCfg(num_envs=4, max_episode_length=1000))
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(key)

    # deterministic smooth CTBR action sequence (exercises rates + thrust)
    t = jnp.arange(100, dtype=jnp.float32)[:, None, None, None]
    actions = 0.3 * jnp.sin(
        t * jnp.asarray([0.07, 0.11, 0.05, 0.03]) + jnp.arange(4)
    )
    actions = jnp.broadcast_to(actions, (100, 4, 1, 4))

    def step(carry, a):
        st, k = carry
        k, ke = jax.random.split(k)
        st, tr = env.step(st, a, ke)
        return (st, k), (st.drone.pos, st.drone.quat)

    (_, _), (pos, quat) = jax.jit(
        lambda c, a: jax.lax.scan(step, c, a)
    )((state, jax.random.PRNGKey(1)), actions)
    return np.asarray(pos), np.asarray(quat)


def test_fixed_seed_trajectory_matches_golden():
    pos, quat = _rollout()
    assert np.isfinite(pos).all() and np.isfinite(quat).all()
    if not GOLDEN.exists():
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(GOLDEN, pos=pos, quat=quat)
        raise AssertionError(
            f"golden file created at {GOLDEN}; commit it and re-run"
        )
    ref = np.load(GOLDEN)
    np.testing.assert_allclose(pos, ref["pos"], rtol=0, atol=0)
    np.testing.assert_allclose(quat, ref["quat"], rtol=0, atol=0)
