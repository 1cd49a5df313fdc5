"""Evader policy and scenario layout tests."""
import jax.numpy as jnp
import numpy as np

from mupe_tpu.envs.prey import prey_force, prey_velocity
from mupe_tpu.envs.scenarios import (
    EVAL_SCENARIOS,
    scenario_cylinders,
    scenario_spawns,
)


def test_prey_flees_from_pursuer():
    drone = jnp.asarray([[[0.5, 0.0, 0.6]]])
    target = jnp.asarray([[[0.0, 0.0, 0.6]]])
    cyl = jnp.full((1, 5, 3), -20.0)
    f = prey_force(drone, target, cyl, 0.1, 0.9, 1.2, 100.0)
    # pursuer at +x pushes target toward −x
    assert float(f[0, 0, 0]) < 0.0


def test_prey_blocked_pursuer_exerts_no_force():
    drone = jnp.asarray([[[0.5, 0.0, 0.6]]])
    target = jnp.asarray([[[-0.5, 0.0, 0.6]]])
    cyl_clear = jnp.full((1, 5, 3), -20.0)
    cyl_block = cyl_clear.at[0, 0].set(jnp.asarray([0.0, 0.0, 0.6]))
    f_clear = prey_force(drone, target, cyl_clear, 0.1, 0.9, 1.2, 100.0)
    f_block = prey_force(drone, target, cyl_block, 0.1, 0.9, 1.2, 100.0)
    # wall force is identical; pursuer force only in the clear case.
    # the blocking cylinder adds its own +(-x) repulsion, so compare the
    # pursuer-specific difference via the cylinder-free wall baseline:
    wall_only = prey_force(
        jnp.asarray([[[50.0, 50.0, 0.6]]]), target, cyl_clear, 0.1, 0.9, 1.2, 1e-6
    )
    pursuer_push_clear = float((f_clear - wall_only)[0, 0, 0])
    assert pursuer_push_clear < -1e-3  # pursuer pushes −x when unblocked


def test_prey_wall_containment():
    drone = jnp.full((1, 3, 3), 50.0)  # far away
    target = jnp.asarray([[[0.88, 0.0, 0.6]]])  # near wall
    cyl = jnp.full((1, 5, 3), -20.0)
    f = prey_force(drone, target, cyl, 0.1, 0.9, 1.2, 100.0)
    assert float(f[0, 0, 0]) < 0.0  # pushed back toward center


def test_prey_force_finite_on_cylinder_wall():
    """Regression: an evader standing EXACTLY on a cylinder wall (d_c =
    cylinder_size − 1e-5, making the repulsion denominator 0) must yield a
    finite force and velocity.  The unguarded 1/x NaN-collapsed a
    275M-frame training run (inf force → inf/inf in prey_velocity; for
    parked cylinders inf·0)."""
    size = 0.1
    d = size - 1e-5  # denominator d_c − size + 1e-5 == 0 exactly
    drone = jnp.asarray([[[5.0, 5.0, 0.6]]])  # far: no pursuer force
    target = jnp.asarray([[[d, 0.0, 0.6]]])
    # one active cylinder at origin + one parked (z < 0) at the same spot
    cyl = jnp.asarray([[[0.0, 0.0, 0.6], [0.0, 0.0, -20.0]]])
    f = prey_force(drone, target, cyl, size, 0.9, 1.2, 100.0)
    assert np.all(np.isfinite(np.asarray(f)))
    v = prey_velocity(f, 1.3)
    assert np.all(np.isfinite(np.asarray(v)))
    # and just inside the wall the evader is pushed back out (+x)
    assert float(f[0, 0, 0]) != 0.0


def test_prey_velocity_componentwise_quirk():
    f = jnp.asarray([[[3.0, -4.0, 0.001]]])
    v = prey_velocity(f, 1.3, componentwise=True)
    # each nonzero component saturates to ±v_prey
    np.testing.assert_allclose(float(v[0, 0, 0]), 1.3, rtol=1e-3)
    np.testing.assert_allclose(float(v[0, 0, 1]), -1.3, rtol=1e-3)
    v2 = prey_velocity(f, 1.3, componentwise=False)
    np.testing.assert_allclose(float(jnp.linalg.norm(v2)), 1.3, rtol=1e-3)


def test_scenario_layouts():
    for flag in EVAL_SCENARIOS:
        cyl, n_active = scenario_cylinders(flag, 6, 0.1, 1.2)
        assert cyl.shape == (6, 3)
        assert (cyl[:n_active, 2] > 0).all()
        assert (cyl[n_active:, 2] < 0).all()
        d, t = scenario_spawns(flag, 3)
        assert d.shape == (3, 3) and t.shape == (1, 3)
    # wall scenario: 4 cylinders in a line at x=0
    cyl, n = scenario_cylinders("wall", 5, 0.1, 1.2)
    assert n == 4
    np.testing.assert_allclose(cyl[:4, 0], 0.0)
