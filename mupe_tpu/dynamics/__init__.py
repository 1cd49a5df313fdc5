from .params import DRONE_ZOO, QuadrotorParams, RigidBodyCfg, make_params
from .quadrotor import (
    DroneState,
    body_wrench,
    downwash_forces,
    hover_state,
    integrate,
    rotor_response,
    step,
)

__all__ = [
    "DRONE_ZOO",
    "QuadrotorParams",
    "RigidBodyCfg",
    "make_params",
    "DroneState",
    "body_wrench",
    "downwash_forces",
    "hover_state",
    "integrate",
    "rotor_response",
    "step",
]
