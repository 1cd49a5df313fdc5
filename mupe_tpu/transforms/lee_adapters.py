"""Position/velocity/attitude action adapters over the Lee controllers.

Counterparts of the remaining controller transforms
(omni_drones/utils/torchrl/transforms.py): `PosController` (:303-331),
`VelController` (:333-360), `AttitudeController` (:461-491).  Each maps a
high-level policy action to rotor commands through the matching L2
controller; all stateless.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..controllers import MixerParams, attitude_control, lee_position_control
from ..dynamics import DroneState


def pos_controller_transform(
    mixer: MixerParams, drone: DroneState, action: jnp.ndarray
) -> jnp.ndarray:
    """7-d action [Δpos(3), vel(3), yaw(1)] → rotor cmds (transforms.py:319-331).

    Position targets are relative to the current position (the reference
    learns relative setpoints, transforms.py:325).
    """
    target_rpos = action[..., 0:3]
    target_vel = action[..., 3:6]
    target_yaw = action[..., 6:7] * jnp.pi
    cmds = lee_position_control(
        mixer,
        drone.pos,
        drone.quat,
        drone.vel,
        drone.angvel,
        target_pos=drone.pos + target_rpos,
        target_vel=target_vel,
        target_yaw=target_yaw,
    )
    return jnp.nan_to_num(cmds, nan=0.0)


def vel_controller_transform(
    mixer: MixerParams, drone: DroneState, action: jnp.ndarray
) -> jnp.ndarray:
    """4-d action [vel(3), yaw(1)] → rotor cmds (transforms.py:349-360)."""
    target_vel = action[..., 0:3]
    target_yaw = action[..., 3:4] * jnp.pi
    cmds = lee_position_control(
        mixer,
        drone.pos,
        drone.quat,
        drone.vel,
        drone.angvel,
        target_pos=drone.pos,
        target_vel=target_vel,
        target_yaw=target_yaw,
    )
    return jnp.nan_to_num(cmds, nan=0.0)


def attitude_controller_transform(
    mixer: MixerParams, drone: DroneState, action: jnp.ndarray
) -> jnp.ndarray:
    """4-d action [thrust, yaw_rate, roll, pitch] → rotor cmds
    (transforms.py:478-491)."""
    target_thrust = jnp.clip((action[..., 0:1] + 1.0) * 0.5, 0.0, None) * jnp.sum(
        mixer.max_thrusts
    )
    target_yaw_rate = action[..., 1:2] * jnp.pi
    target_roll = action[..., 2:3] * jnp.pi
    target_pitch = action[..., 3:4] * jnp.pi
    cmds = attitude_control(
        mixer,
        drone.quat,
        drone.angvel,
        target_thrust=target_thrust,
        target_yaw_rate=target_yaw_rate,
        target_roll=target_roll,
        target_pitch=target_pitch,
    )
    return jnp.nan_to_num(cmds, nan=0.0)
