#!/usr/bin/env python
"""Slung-payload transport demo (reference examples/demo_transport.py):
four Firefly drones carry a 2 kg payload on rigid bars, held in place by
the Lee position controller.  Prints the hover trim the assembly settles
into — the drones sag under their payload share until the controller's
position error supplies the extra thrust."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mupe_tpu.controllers.lee import lee_position_control, make_mixer
from mupe_tpu.dynamics.transport import (
    TransportCfg,
    make_transport_params,
    transport_init,
    transport_step,
)


def main():
    cfg = TransportCfg()
    params = make_transport_params(cfg)
    mixer = make_mixer(cfg.drone_model)
    st = transport_init(cfg, params, jnp.asarray([[0.0, 0.0, 1.5]]))
    start = st.drones.pos
    goal = start + jnp.asarray([3.0, 0.0, 0.7])  # demo_transport.py:55-63

    @jax.jit
    def tick(st, frac):
        # ramp the setpoint: a 3 m step saturates the geometric controller
        # and tumbles the slung assembly; real transport flies a trajectory
        targets = start + frac[..., None, None, None] * (goal - start)
        cmds = lee_position_control(
            mixer, st.drones.pos, st.drones.quat, st.drones.vel,
            st.drones.angvel, targets,
        )
        return transport_step(cfg, params, st, cmds, dt=0.016), None

    n_total = 900
    for k in range(9):
        fracs = jnp.clip((jnp.arange(100) + k * 100) / 600.0, 0.0, 1.0)
        st, _ = jax.lax.scan(tick, st, fracs)
        pos = np.asarray(st.drones.pos)[0]
        pay = np.asarray(st.payload_pos)[0]
        err = np.linalg.norm(pos - np.asarray(goal)[0], axis=-1).mean()
        print(
            f"t={(k + 1) * 100 * 0.016:5.1f}s  mean drone target err {err:.3f} m"
            f"  payload at ({pay[0]:+.2f}, {pay[1]:+.2f}, {pay[2]:+.2f})"
        )
    d = np.linalg.norm(
        np.asarray(st.drones.pos)[0]
        - (np.asarray(st.payload_pos)[0] + np.asarray(cfg.anchor_body)),
        axis=-1,
    )
    print(f"rod lengths: {np.round(d, 3)} (bar_length={cfg.bar_length})")


if __name__ == "__main__":
    main()
