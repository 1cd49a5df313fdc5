"""Sim-free env: run a trained policy with no physics (deployment bridge).

Counterpart of the reference's fake-env harness
(scripts/fake/fake_env.py:37-157, scripts/fake/hover.py:11-104): an env with
the exact observation/action layout of a real task but a trivial `step` that
only recomputes observations — used to exercise the policy + CTBR transform
stack on a machine with no simulator (e.g. an onboard computer), and as a
mock backend for harness tests.

`FakeHideAndSeek.inject` lets a deployment loop feed externally-measured
drone/target states (e.g. from a motion-capture system) and read back CTBR
commands, which is the real-world control path of the paper's sim-to-real
pipeline.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..controllers import PIDRateState
from ..dynamics import hover_state, make_params
from ..transforms.ctbr import hover_prev_action_init, pid_rate_transform
from .base import Transition, register_env
from .hideandseek import HideAndSeek, HideAndSeekCfg, HideAndSeekState


@register_env("FakeHideAndSeek")
class FakeHideAndSeek(HideAndSeek):
    """HideAndSeek with the physics step removed: positions are frozen (or
    injected), observations/stats flow normally."""

    def step(
        self,
        state: HideAndSeekState,
        action: jnp.ndarray,
        key: jnp.ndarray,
        tp_params=None,
    ) -> Tuple[HideAndSeekState, Transition]:
        cfg = self.cfg
        res = pid_rate_transform(
            self.params, state.drone, action, state.prev_action, state.pid,
            cfg.dt,
        )
        progress = state.progress + 1
        new_state = state.replace(
            pid=res.pid_state,
            prev_action=res.ctbr_action,
            progress=jnp.where(
                progress >= cfg.max_episode_length, 0, progress
            ),
        )
        frame = self._tp_frame(new_state)
        new_state = new_state.replace(
            history=jnp.concatenate(
                [state.history[:, 1:], frame[:, None, :]], axis=1
            )
        )
        obs, critic_state = self.observe_full(new_state, tp_params)
        e, n = cfg.num_envs, cfg.num_agents
        done = (progress >= cfg.max_episode_length)[:, None]
        info = {
            "drone_state": new_state.drone.state_vector()[..., :13],
            "ctbr": res.ctbr,
            "rotor_cmds": res.rotor_cmds,
            "prev_action": new_state.prev_action,
            "state": critic_state,
            "tp_input": new_state.history,
            "tp_gt": jnp.zeros((e, 3)),
            "tp_done": jnp.zeros((e, 1)),
        }
        return new_state, Transition(
            obs=obs,
            reward=jnp.zeros((e, n, 1)),
            done=done,
            stats=new_state.stats,
            info=info,
        )

    def inject(
        self,
        state: HideAndSeekState,
        drone_pos: jnp.ndarray,
        drone_quat: jnp.ndarray,
        drone_vel: jnp.ndarray,
        drone_angvel: jnp.ndarray,
        target_pos: jnp.ndarray,
        target_vel: jnp.ndarray,
    ) -> HideAndSeekState:
        """Overwrite kinematic state with externally measured values."""
        return state.replace(
            drone=state.drone.replace(
                pos=drone_pos, quat=drone_quat, vel=drone_vel,
                angvel=drone_angvel,
            ),
            target_pos=target_pos,
            target_vel=target_vel,
        )
