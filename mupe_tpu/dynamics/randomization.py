"""Domain randomization of quadrotor parameters, fully on device.

Counterpart of MultirotorBase.setup_randomization/_randomize
(omni_drones/robots/drone/multirotor.py:406-697): per-env scaling of mass,
inertia, thrust-to-weight, force-to-moment, drag, rotor offsets, and rotor
time constants, plus the normalized "intrinsics" vector exposed to
privileged/adaptive policies (multirotor.py:652-697).

Because `QuadrotorParams` is a pytree whose leaves broadcast against the
state, randomization is just: sample per-env leaves with a leading
[num_envs, 1(, R)] shape and `replace` them — no sim-side setters.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .params import QuadrotorParams


@dataclasses.dataclass(frozen=True)
class RandomizationCfg:
    """Uniform scaling ranges, None = not randomized
    (reference cfg/task/Hover.yaml:37-48 randomization block)."""

    mass_scale: Optional[Tuple[float, float]] = None
    inertia_scale: Optional[Tuple[float, float]] = None
    t2w_scale: Optional[Tuple[float, float]] = None      # thrust-to-weight
    f2m_scale: Optional[Tuple[float, float]] = None      # force-to-moment
    drag_coef_scale: Optional[Tuple[float, float]] = None
    rotor_offset_scale: Optional[Tuple[float, float]] = None
    tau_up: Optional[Tuple[float, float]] = None         # absolute, not scale
    tau_down: Optional[Tuple[float, float]] = None


def randomize_params(
    key: jnp.ndarray,
    base: QuadrotorParams,
    cfg: RandomizationCfg,
    num_envs: int,
) -> Tuple[QuadrotorParams, Dict[str, jnp.ndarray]]:
    """Sample per-env params; returns (params with [E, 1, ...] leaves,
    intrinsics dict normalized by defaults as in multirotor.py:659-697)."""
    r = base.num_rotors
    keys = jax.random.split(key, 8)
    e1 = (num_envs, 1)

    def u(k, lo, hi, shape):
        return jax.random.uniform(k, shape, minval=lo, maxval=hi)

    mass = jnp.broadcast_to(base.mass, e1)
    if cfg.mass_scale:
        mass = base.mass * u(keys[0], *cfg.mass_scale, e1)
    inertia = jnp.broadcast_to(base.inertia, e1 + (3,))
    if cfg.inertia_scale:
        inertia = base.inertia * u(keys[1], *cfg.inertia_scale, e1 + (1,))
    kf = jnp.broadcast_to(base.kf, e1 + (r,))
    if cfg.t2w_scale:
        # KF = t2w · m · g (multirotor.py:671-675)
        t2w0 = base.kf / (base.mass * 9.81)
        kf = t2w0 * u(keys[2], *cfg.t2w_scale, e1 + (1,)) * mass[..., None] * 9.81
    km = jnp.broadcast_to(base.km, e1 + (r,))
    if cfg.f2m_scale:
        # KM = KF / f2m (multirotor.py:676-680)
        f2m0 = base.kf / base.km
        km = kf / (f2m0 * u(keys[3], *cfg.f2m_scale, e1 + (1,)))
    drag = jnp.broadcast_to(base.drag_coef, e1)
    if cfg.drag_coef_scale:
        drag = base.drag_coef * u(keys[4], *cfg.drag_coef_scale, e1)
    rotor_pos = jnp.broadcast_to(base.rotor_pos, e1 + (r, 3))
    rotor_offset = jnp.zeros(e1)
    if cfg.rotor_offset_scale:
        rotor_offset = u(keys[5], *cfg.rotor_offset_scale, e1)
        xy = base.rotor_pos[..., :2] * (1.0 + rotor_offset[..., None, None])
        rotor_pos = jnp.concatenate(
            [xy, jnp.broadcast_to(base.rotor_pos[..., 2:], xy.shape[:-1] + (1,))],
            axis=-1,
        )
    tau_up = jnp.broadcast_to(base.tau_up, e1 + (r,))
    if cfg.tau_up:
        tau_up = u(keys[6], *cfg.tau_up, e1 + (r,))
    tau_down = jnp.broadcast_to(base.tau_down, e1 + (r,))
    if cfg.tau_down:
        tau_down = u(keys[7], *cfg.tau_down, e1 + (r,))

    params = base.replace(
        mass=mass,
        inertia=inertia,
        kf=kf,
        km=km,
        drag_coef=drag,
        rotor_pos=rotor_pos,
        tau_up=tau_up,
        tau_down=tau_down,
    )
    intrinsics = {
        "mass": (mass / base.mass)[..., None],
        "inertia": inertia / base.inertia,
        "KF": kf / base.kf,
        "KM": km / base.km,
        "tau_up": tau_up,
        "tau_down": tau_down,
        "drag_coef": drag[..., None],
        "rotor_offset": rotor_offset[..., None],
    }
    return params, intrinsics


def intrinsics_vector(intrinsics: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Flatten the intrinsics dict into the privileged observation vector
    (order fixed to the intrinsics_spec, multirotor.py:78-88)."""
    keys = ["mass", "inertia", "KF", "KM", "tau_up", "tau_down",
            "drag_coef", "rotor_offset"]
    return jnp.concatenate([intrinsics[k] for k in keys], axis=-1)
