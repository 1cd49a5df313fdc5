"""Golden tests for the controller layer (L2).

Reference: omni_drones/controllers/lee_position_controller.py:435-550 (PID
rate), :41-203 (Lee), :303-406 (rate P), dsl_pid_controller.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mupe_tpu.controllers import (
    DSLPIDState,
    PIDRateState,
    dsl_pid_control,
    lee_position_control,
    make_mixer,
    pid_rate_control,
    rate_control,
)
from mupe_tpu.core import euler_to_quaternion
from mupe_tpu.dynamics import hover_state, make_params, step

DT = 0.01
IDENTITY_Q = jnp.asarray([1.0, 0.0, 0.0, 0.0])


def test_pid_rate_golden_first_step():
    """Hand-computed single tick from rest with a pure roll-rate setpoint."""
    quat = IDENTITY_Q[None]
    angvel = jnp.zeros((1, 3))
    target_rate = jnp.asarray([[10.0, 0.0, 0.0]])  # deg/s
    thrust = jnp.asarray([[0.5 * 2**16]])
    st = PIDRateState.zeros((1,))
    cmds, ctbr, st2 = pid_rate_control(quat, angvel, target_rate, thrust, st, DT)
    # P = 10·250 = 2500, I = 10·0.01·500 = 50, D = 0 → out_r = 2550, r = 1275
    np.testing.assert_allclose(float(ctbr[0, 0]), 1275.0, rtol=1e-5)
    np.testing.assert_allclose(float(ctbr[0, 3]), 0.5 * 2**16, rtol=1e-6)
    # m1 = T + r, m2 = T + r, m3 = T − r, m4 = T − r (p = y = 0)
    t = 0.5 * 2**16
    expect = np.asarray([t + 1275, t + 1275, t - 1275, t - 1275]) / 2**16 * 2 - 0.9
    np.testing.assert_allclose(np.asarray(cmds[0]), expect, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.integ[0]), [0.1, 0.0, 0.0], rtol=1e-6)


def test_pid_rate_integrator_clamp():
    quat = jnp.broadcast_to(IDENTITY_Q, (1, 4))
    angvel = jnp.zeros((1, 3))
    target = jnp.asarray([[10000.0, 0.0, 0.0]])
    thrust = jnp.asarray([[0.0]])
    st = PIDRateState.zeros((1,))
    for _ in range(100):
        _, _, st = pid_rate_control(quat, angvel, target, thrust, st, DT)
    assert float(st.integ[0, 0]) <= 33.3 + 1e-5


def test_pid_rate_reset():
    st = PIDRateState(
        integ=jnp.ones((4, 3)), last_body_rate=jnp.ones((4, 3))
    )
    mask = jnp.asarray([True, False, True, False])
    st2 = st.reset_where(mask)
    np.testing.assert_allclose(np.asarray(st2.integ[0]), 0.0)
    np.testing.assert_allclose(np.asarray(st2.integ[1]), 1.0)


def test_pid_rate_tracks_setpoint_in_sim():
    """Closed loop: PID rate + dynamics tracks a roll-rate setpoint."""
    params = make_params("crazyflie")
    state = hover_state(
        params, jnp.asarray([[[0.0, 0.0, 1.0]]]), IDENTITY_Q[None, None]
    )
    target_rate = jnp.asarray([[[30.0, 0.0, 0.0]]])  # deg/s roll
    hover_pwm = float(params.hover_throttle) * 2**16
    thrust = jnp.full((1, 1, 1), hover_pwm)
    pid = PIDRateState.zeros((1, 1))

    def body(carry, _):
        s, pid = carry
        cmds, _, pid = pid_rate_control(
            s.quat, s.angvel, target_rate, thrust, pid, DT
        )
        s, _ = step(params, s, cmds, DT)
        return (s, pid), s.body_rate

    (state, pid), rates = jax.lax.scan(body, (state, pid), None, length=100)
    final_deg = float(rates[-1, 0, 0, 0]) * 180.0 / np.pi
    assert abs(final_deg - 30.0) < 3.0, final_deg


def test_lee_position_control_closed_loop():
    """Lee position controller flies the hummingbird to a waypoint."""
    params = make_params("hummingbird")
    mp = make_mixer("hummingbird")
    state = hover_state(
        params, jnp.asarray([[[0.0, 0.0, 1.0]]]), IDENTITY_Q[None, None]
    )
    target = jnp.asarray([[[1.0, 0.5, 1.5]]])

    def body(s, _):
        cmds = lee_position_control(
            mp, s.pos, s.quat, s.vel, s.angvel,
            target_pos=target, target_yaw=jnp.zeros((1, 1, 1)),
        )
        s, _ = step(params, s, cmds, DT)
        return s, None

    state, _ = jax.lax.scan(body, state, None, length=700)
    err = float(jnp.linalg.norm(state.pos - target))
    assert err < 0.1, err


def test_rate_control_zero_error_gives_hover_mix():
    mp = make_mixer("crazyflie")
    quat = jnp.broadcast_to(IDENTITY_Q, (1, 4))
    cmds = rate_control(
        mp, quat, jnp.zeros((1, 3)), jnp.zeros((1, 3)),
        jnp.full((1, 1), float(mp.max_thrusts.sum()) / 2),
    )
    # zero rate error → all rotors at half thrust → cmd = 0
    np.testing.assert_allclose(np.asarray(cmds), 0.0, atol=1e-5)


def test_dsl_pid_runs_and_commands_up_for_below_target():
    st = DSLPIDState.zeros((1,))
    cmds, st2 = dsl_pid_control(
        pos=jnp.asarray([[0.0, 0.0, 0.5]]),
        quat=jnp.broadcast_to(IDENTITY_Q, (1, 4)),
        vel=jnp.zeros((1, 3)),
        target_pos=jnp.asarray([[0.0, 0.0, 1.5]]),
        target_vel=jnp.zeros((1, 3)),
        target_yaw=jnp.zeros((1, 1)),
        state=st,
        dt=DT,
    )
    assert cmds.shape == (1, 4)
    assert not np.any(np.isnan(np.asarray(cmds)))


def test_pid_rate_yaw_mixing_sign():
    """Positive yaw output adds to m1/m3, subtracts from m2/m4
    (lee_position_controller.py:537-542)."""
    quat = IDENTITY_Q[None]
    angvel = jnp.zeros((1, 3))
    target = jnp.asarray([[0.0, 0.0, 10.0]])
    thrust = jnp.asarray([[0.5 * 2**16]])
    st = PIDRateState.zeros((1,))
    cmds, ctbr, _ = pid_rate_control(quat, angvel, target, thrust, st, DT)
    c = np.asarray(cmds[0])
    assert c[0] > c[1] and c[2] > c[3]
    np.testing.assert_allclose(c[0], c[2], rtol=1e-6)
