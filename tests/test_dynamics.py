"""Golden tests for the quadrotor dynamics (vs. reference formulas §3.5).

Reference formulas: omni_drones/actuators/rotor_group.py:55-71,
omni_drones/robots/drone/multirotor.py:466-508,599-650.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mupe_tpu.dynamics import (
    DroneState,
    RigidBodyCfg,
    body_wrench,
    downwash_forces,
    hover_state,
    make_params,
    rotor_response,
    step,
)

DT = 0.01


def identity_state(params, batch=(1, 1), pos=(0.0, 0.0, 1.0)):
    p = jnp.broadcast_to(jnp.asarray(pos), batch + (3,))
    q = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0, 0.0]), batch + (4,))
    return hover_state(params, p, q)


def test_rotor_response_golden():
    params = make_params("crazyflie")
    throttle = jnp.zeros((4,))
    cmds = jnp.zeros((4,))  # cmd 0 → target = sqrt(0.5)
    new_throttle, thrusts, moments = rotor_response(params, throttle, cmds, DT)
    target = np.sqrt(0.5)
    expect_throttle = (DT / 0.025) * target  # throttle += dt/τ (target − 0)
    np.testing.assert_allclose(new_throttle, expect_throttle, rtol=1e-6)
    kf = 2315.0**2 * 2.350347298350041e-08
    np.testing.assert_allclose(thrusts, expect_throttle**2 * kf, rtol=1e-5)
    km = 2315.0**2 * 7.24e-10
    np.testing.assert_allclose(
        moments,
        expect_throttle**2 * km * -np.asarray([-1.0, 1.0, -1.0, 1.0]),
        rtol=1e-5,
    )


def test_hover_throttle_equilibrium():
    """At hover throttle with equal cmds, total thrust = m g exactly."""
    params = make_params("crazyflie")
    h = params.hover_throttle
    # command that holds throttle constant: target == throttle → cmd = 2 h² − 1
    cmds = jnp.full((4,), 2.0 * h**2 - 1.0)
    new_throttle, thrusts, _ = rotor_response(
        params, jnp.full((4,), h), cmds, DT
    )
    np.testing.assert_allclose(new_throttle, h, rtol=1e-6)
    np.testing.assert_allclose(jnp.sum(thrusts), params.mass * 9.81, rtol=1e-5)


def test_hover_is_nearly_stationary():
    """A drone at hover throttle under the equilibrium command barely moves.
    Small downward drift is expected (velocity damping), not divergence."""
    params = make_params("crazyflie")
    state = identity_state(params)
    h = params.hover_throttle
    cmds = jnp.full((1, 1, 4), 2.0 * h**2 - 1.0)

    def body(s, _):
        s, _diff = step(params, s, cmds, DT)
        return s, s.pos

    state_f, traj = jax.lax.scan(body, state, None, length=100)
    assert abs(float(state_f.pos[0, 0, 2]) - 1.0) < 0.02
    assert float(jnp.linalg.norm(state_f.vel)) < 0.05
    assert not np.any(np.isnan(np.asarray(traj)))


def test_body_wrench_yaw_torque_sign():
    """Asymmetric rotor speeds create yaw torque with the right sign."""
    params = make_params("crazyflie")
    # spin up rotors 1 and 3 (ccw, direction=+1) harder → net moment from
    # moments_i = −dir_i t KM: ccw rotors contribute negative z-torque
    thrusts = jnp.asarray([0.0, 0.1, 0.0, 0.1])
    t = thrusts / params.kf
    moments = t * params.km * (-params.directions)
    _, torque = body_wrench(params, thrusts, moments)
    assert float(torque[2]) < 0.0


def test_body_wrench_roll_pitch_from_arms():
    params = make_params("crazyflie")
    # rotor 0 at angle 45° (x, y > 0): thrust there pitches (negative torque
    # about y → nose down toward +x? τ = r × f ẑ = f(r_y, −r_x, 0))
    thrusts = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    moments = jnp.zeros((4,))
    _, torque = body_wrench(params, thrusts, moments)
    r0 = params.rotor_pos[0]
    np.testing.assert_allclose(torque[0], r0[1], rtol=1e-5)
    np.testing.assert_allclose(torque[1], -r0[0], rtol=1e-5)


def test_downwash_pushes_lower_drone_down():
    """A drone hovering below another receives a downward force."""
    pos = jnp.asarray([[[0.0, 0.0, 2.0], [0.0, 0.05, 1.0]]])  # j=0 above i=1
    thrust_w = jnp.asarray([[[0.0, 0.0, 0.3], [0.0, 0.0, 0.3]]])
    f = downwash_forces(pos, thrust_w)
    # lower drone (index 1) gets pushed down by upper's wake
    assert float(f[0, 1, 2]) < 0.0
    # upper drone: wake of the lower one goes *down*, z-separation is negative
    # → clipped to 0 → the model's symmetric kernel gives ~0 through r/z→inf
    assert abs(float(f[0, 0, 2])) < abs(float(f[0, 1, 2])) + 1e-9


def test_free_fall_matches_gravity():
    params = make_params("crazyflie")
    state = identity_state(params).replace(throttle=jnp.zeros((1, 1, 4)))
    cmds = jnp.full((1, 1, 4), -1.0)  # motors off
    cfg = RigidBodyCfg(linear_damping=0.0, angular_damping=0.0, ground_collision=False)
    s = state
    for _ in range(10):
        s, _ = step(params, s, cmds, DT, cfg, enable_downwash=False)
    t = 10 * DT
    # semi-implicit Euler free fall: z = z0 − g dt Σk = z0 − g dt² n(n+1)/2
    expected_z = 1.0 - 9.81 * DT * DT * (10 * 11) / 2
    np.testing.assert_allclose(float(s.pos[0, 0, 2]), expected_z, atol=1e-4)
    np.testing.assert_allclose(float(s.vel[0, 0, 2]), -9.81 * t, atol=1e-4)


def test_velocity_clamp():
    params = make_params("crazyflie")
    cfg = RigidBodyCfg(max_linear_velocity=1.0, ground_collision=False)
    state = identity_state(params).replace(
        vel=jnp.asarray([[[10.0, 0.0, 0.0]]])
    )
    cmds = jnp.zeros((1, 1, 4))
    s, _ = step(params, state, cmds, DT, cfg)
    assert float(jnp.linalg.norm(s.vel)) <= 1.0 + 1e-5


def test_ground_collision():
    params = make_params("crazyflie")
    state = identity_state(params, pos=(0.0, 0.0, 0.001)).replace(
        vel=jnp.asarray([[[0.0, 0.0, -5.0]]]), throttle=jnp.zeros((1, 1, 4))
    )
    s, _ = step(params, state, jnp.full((1, 1, 4), -1.0), DT)
    assert float(s.pos[0, 0, 2]) >= 0.0
    assert float(s.vel[0, 0, 2]) >= 0.0


def test_state_vector_layout():
    params = make_params("crazyflie")
    state = identity_state(params, batch=(2, 3))
    sv = state.state_vector()
    assert sv.shape == (2, 3, 23)
    np.testing.assert_allclose(sv[..., 3:7], state.quat)
    np.testing.assert_allclose(sv[..., 19:], state.throttle * 2 - 1)


def test_step_jit_and_vmap():
    params = make_params("crazyflie")
    state = identity_state(params, batch=(64, 3))
    cmds = jnp.zeros((64, 3, 4))
    stepped = jax.jit(lambda s, c: step(params, s, c, DT))(state, cmds)
    assert stepped[0].pos.shape == (64, 3, 3)
    assert not np.any(np.isnan(np.asarray(stepped[0].pos)))
