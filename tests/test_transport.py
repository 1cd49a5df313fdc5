"""TransportationGroup assembly (reference
omni_drones/robots/assembly/transportation_group.py + demo_transport.py):
4 drones + slung payload via compliant rods, closed-loop with the Lee
position controller."""
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


def test_transport_init_geometry():
    cfg = TransportCfg()
    params = make_transport_params(cfg)
    st = transport_init(cfg, params, jnp.asarray([[0.0, 0.0, 1.5]]))
    assert st.drones.pos.shape == (1, 4, 3)
    np.testing.assert_allclose(np.asarray(st.payload_pos), [[0.0, 0.0, 0.4]])
    # rods start taut: |drone - anchor| == bar_length
    anchors = np.asarray(st.payload_pos)[:, None] + np.asarray(cfg.anchor_body)
    d = np.linalg.norm(np.asarray(st.drones.pos) - anchors, axis=-1)
    np.testing.assert_allclose(d, cfg.bar_length, atol=1e-6)


def test_transport_hover_closed_loop_stable():
    """Lee controller holds the group; the slung payload stays suspended,
    rods stay near length, nothing diverges (demo_transport.py:52-77)."""
    cfg = TransportCfg()
    params = make_transport_params(cfg)
    mixer = make_mixer(cfg.drone_model)
    e = 2
    origin = jnp.asarray([[0.0, 0.0, 1.5], [1.0, 0.0, 1.5]])
    st = transport_init(cfg, params, origin)
    targets = st.drones.pos  # hold spawn positions

    def tick(st, _):
        cmds = lee_position_control(
            mixer, st.drones.pos, st.drones.quat, st.drones.vel,
            st.drones.angvel, targets,
        )
        return transport_step(cfg, params, st, cmds, dt=0.016), None

    st, _ = jax.lax.scan(jax.jit(tick), st, None, length=400)

    pos = np.asarray(st.drones.pos)
    pay = np.asarray(st.payload_pos)
    assert np.isfinite(pos).all() and np.isfinite(pay).all()
    # payload still suspended BELOW the drones, above the floor
    assert (pay[:, 2] > -0.5).all()
    assert (pos[..., 2].min(axis=-1) > pay[:, 2]).all()
    # rods stretched at most a few cm beyond the bar length
    anchors = pay[:, None] + np.asarray(
        jax.vmap(lambda q, a: a)(st.payload_quat, jnp.broadcast_to(
            cfg.anchor_body, (e, 4, 3)))
    )
    d = np.linalg.norm(pos - anchors, axis=-1)
    assert (np.abs(d - cfg.bar_length) < 0.1).all(), d
    # drones sag under the load but stay bounded near their targets
    assert (np.abs(pos - np.asarray(targets))[..., :2] < 0.5).all()
    assert (np.abs(pos[..., 2] - np.asarray(targets)[..., 2]) < 1.5).all()
    # payload roughly level (compliant rods, symmetric load)
    assert abs(float(st.payload_quat[0, 0])) > 0.95


def test_transport_payload_couples_dynamics():
    """Cutting thrust makes the whole assembly (incl. payload) fall —
    the rods really transmit force both ways."""
    cfg = TransportCfg(substeps=2)
    params = make_transport_params(cfg)
    st = transport_init(cfg, params, jnp.asarray([[0.0, 0.0, 3.0]]))
    z0 = float(st.payload_pos[0, 2])
    cmds = -jnp.ones((1, 4, int(np.asarray(st.drones.throttle.shape[-1]))))  # min throttle

    def tick(st, _):
        return transport_step(cfg, params, st, cmds, dt=0.016), None

    st, _ = jax.lax.scan(jax.jit(tick), st, None, length=60)
    assert float(st.payload_pos[0, 2]) < z0 - 1.0
    assert np.isfinite(np.asarray(st.drones.pos)).all()
