"""Dragon articulated multi-link drone (dynamics/dragon.py) vs the
reference's Dragon robot (omni_drones/robots/drone/dragon.py:45-244):
action/state layout parity and physical sanity of the compliant-joint
chain."""
import jax
import jax.numpy as jnp
import numpy as np

from mupe_tpu.dynamics.dragon import (
    DragonCfg,
    dragon_init,
    dragon_state_vector,
    dragon_step,
)

CFG = DragonCfg()
DT = 0.01


def _rollout(action_fn, steps=200, e=4):
    cfg = CFG
    state = dragon_init(cfg, jnp.zeros((e, 3)).at[:, 2].set(1.0))

    def body(s, i):
        s = dragon_step(cfg, s, action_fn(i, s), DT)
        return s, s.pos

    state, traj = jax.lax.scan(body, state, jnp.arange(steps))
    return state, traj


def test_layout_matches_reference():
    # dragon.py:92 action split / :96-101 observation dim for 4 links
    assert CFG.action_split == (8, 8, 6)
    assert CFG.action_dim == 22
    assert CFG.state_dim == 98
    state = dragon_init(CFG, jnp.zeros((3, 3)))
    sv = dragon_state_vector(CFG, state)
    assert sv.shape == (3, 98)
    assert np.all(np.isfinite(np.asarray(sv)))


def test_hover_is_stable_and_chain_holds():
    """Zero commands at hover throttle: no blow-up, links stay chained at
    ~link_spacing, altitude roughly held over 2 s."""
    hover_cmd = 2.0 * jnp.square(
        jnp.sqrt(CFG.link_mass * 9.81 / (2.0 * CFG.kf))
    ) - 1.0

    def act(i, s):
        a = jnp.zeros((4, CFG.action_dim))
        return a.at[:, : CFG.num_rotors].set(hover_cmd)

    state, traj = _rollout(act, steps=200)
    pos = np.asarray(state.pos)
    assert np.all(np.isfinite(pos))
    gaps = np.linalg.norm(pos[:, 1:] - pos[:, :-1], axis=-1)
    assert np.all(np.abs(gaps - CFG.link_spacing) < 0.1)
    assert np.all(np.abs(pos[..., 2] - 1.0) < 0.5)


def test_gimbal_tilt_produces_lateral_motion():
    """Tilting every gimbal forward at hover thrust accelerates the chain
    along +x (thrust vectoring — the point of the gimbal modules)."""
    hover_cmd = 2.0 * jnp.square(
        jnp.sqrt(CFG.link_mass * 9.81 / (2.0 * CFG.kf))
    ) - 1.0

    def act(i, s):
        a = jnp.zeros((4, CFG.action_dim))
        a = a.at[:, : CFG.num_rotors].set(hover_cmd * 1.02)
        # gimbal velocity targets: tilt about link y
        gim = a[:, CFG.num_rotors : CFG.num_rotors + 8].reshape(4, 4, 2)
        gim = gim.at[..., 0].set(0.5)
        return a.at[:, CFG.num_rotors : CFG.num_rotors + 8].set(
            gim.reshape(4, 8)
        )

    state, _ = _rollout(act, steps=150)
    vx = float(np.asarray(state.vel)[..., 0].mean())
    assert vx > 0.05


def test_link_joint_drive_bends_chain():
    """Commanding the link joints bends the chain: the end-to-end distance
    shrinks below the straight-line length."""
    hover_cmd = 2.0 * jnp.square(
        jnp.sqrt(CFG.link_mass * 9.81 / (2.0 * CFG.kf))
    ) - 1.0

    def act(i, s):
        a = jnp.zeros((4, CFG.action_dim))
        a = a.at[:, : CFG.num_rotors].set(hover_cmd)
        # bend every joint about z
        lnk = a[:, CFG.num_rotors + 8 :].reshape(4, 3, 2)
        lnk = lnk.at[..., 1].set(0.6)
        return a.at[:, CFG.num_rotors + 8 :].set(lnk.reshape(4, 6))

    state, _ = _rollout(act, steps=300)
    pos = np.asarray(state.pos)
    end_to_end = np.linalg.norm(pos[:, -1] - pos[:, 0], axis=-1)
    straight = CFG.link_spacing * (CFG.num_links - 1)
    assert np.all(end_to_end < straight - 0.05)
    assert np.all(np.isfinite(pos))


def test_jit_and_vmap_clean():
    """The step is jit/scan-safe with no recompiles across batch sizes
    (static shapes only)."""
    cfg = CFG
    step = jax.jit(lambda s, a: dragon_step(cfg, s, a, DT))
    s = dragon_init(cfg, jnp.zeros((2, 3)))
    a = jnp.zeros((2, cfg.action_dim))
    s2 = step(s, a)
    assert s2.pos.shape == s.pos.shape
