"""Action adapters: policy action → rotor commands.

Pure-function equivalents of the reference torchrl transforms
(omni_drones/utils/torchrl/transforms.py:303-491).  Each adapter squashes the
raw 4-d policy action, computes the CTBR setpoint and the first-order action
error used by the smoothness reward (transforms.py:437-443), then runs the
matching controller.  Controller carry state and ``prev_action`` live in the
env state and are threaded through explicitly.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..controllers import (
    MixerParams,
    PIDRateState,
    pid_rate_control,
    rate_control,
)
from ..dynamics import DroneState, QuadrotorParams


class CTBRResult(NamedTuple):
    rotor_cmds: jnp.ndarray    # (..., R) in [-1, 1]
    ctbr: jnp.ndarray          # (..., 4) controller-frame [r, p, y, thrust]
    ctbr_action: jnp.ndarray   # (..., 4) normalized [rate₃∈[-1,1], thrust∈[0,ratio]]
    action_error: jnp.ndarray  # (...,)   ‖ctbr_action − prev_action‖
    pid_state: PIDRateState
    target_rate_deg: jnp.ndarray


def pid_rate_transform(
    params: QuadrotorParams,
    drone: DroneState,
    action: jnp.ndarray,
    prev_action: jnp.ndarray,
    pid_state: PIDRateState,
    dt: float,
) -> CTBRResult:
    """The `PIDRateController` transform (transforms.py:404-459) + controller.

    action: (..., 4) raw policy output → tanh → [body-rate setpoint, thrust].
    """
    a = jnp.tanh(action)
    target_rate = a[..., :3]
    target_thrust = jnp.clip((a[..., 3:4] + 1.0) * 0.5, 0.0, params.max_thrust_ratio)
    if params.fixed_yaw:
        target_rate = target_rate.at[..., 2].set(0.0)

    ctbr_action = jnp.concatenate([target_rate, target_thrust], axis=-1)
    action_error = jnp.linalg.norm(ctbr_action - prev_action, axis=-1)

    target_rate_deg = target_rate * 180.0 * params.target_clip
    thrust_pwm = target_thrust * (2.0**16)

    rotor_cmds, ctbr, new_pid = pid_rate_control(
        drone.quat,
        drone.angvel,
        target_rate_deg,
        thrust_pwm,
        pid_state,
        dt,
        max_thrust_ratio=params.max_thrust_ratio,
    )
    rotor_cmds = jnp.nan_to_num(rotor_cmds, nan=0.0)
    return CTBRResult(
        rotor_cmds=rotor_cmds,
        ctbr=ctbr,
        ctbr_action=ctbr_action,
        action_error=action_error,
        pid_state=new_pid,
        target_rate_deg=target_rate_deg,
    )


def rate_transform(
    params: QuadrotorParams,
    mixer: MixerParams,
    drone: DroneState,
    action: jnp.ndarray,
    prev_action: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The `RateController` transform (transforms.py:362-402): tanh, thrust in
    Newtons, rate in rad/s through the proportional rate controller."""
    a = jnp.tanh(action)
    target_rate = a[..., :3]
    target_thrust = (
        jnp.clip((a[..., 3:4] + 1.0) * 0.5, 0.0, params.max_thrust_ratio)
        * jnp.sum(mixer.max_thrusts)
    )
    if params.fixed_yaw:
        target_rate = target_rate.at[..., 2].set(0.0)
    ctbr_action = jnp.concatenate(
        [a[..., :3], jnp.clip((a[..., 3:4] + 1.0) * 0.5, 0.0, params.max_thrust_ratio)],
        axis=-1,
    )
    action_error = jnp.linalg.norm(ctbr_action - prev_action, axis=-1)
    cmds = rate_control(
        mixer,
        drone.quat,
        drone.angvel,
        target_rate * jnp.pi * params.target_clip,
        target_thrust,
    )
    return jnp.nan_to_num(cmds, nan=0.0), ctbr_action, action_error


def hover_prev_action_init(params: QuadrotorParams, throttle: jnp.ndarray) -> jnp.ndarray:
    """Initial `prev_action` after reset (hideandseek.py:714-717): zero rates,
    thrust channel = mean(0.5·(max_thrust_ratio + (2·throttle² − 1)))."""
    cmd_init = 2.0 * jnp.square(throttle) - 1.0
    thrust = jnp.mean(
        0.5 * (params.max_thrust_ratio + cmd_init), axis=-1, keepdims=True
    )
    zeros = jnp.zeros(throttle.shape[:-1] + (3,), throttle.dtype)
    return jnp.concatenate([zeros, thrust], axis=-1)
