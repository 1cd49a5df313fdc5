"""Eval-consistent exposure + scene-fallback stat + AEG starvation fallback
(round-4 additions closing the r3 scenario-transfer gap; eval geometry from
omni_drones/envs/hide_and_seek/hideandseek.py:480-531,632-682)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mupe_tpu.envs.hideandseek import HideAndSeek, HideAndSeekCfg
from mupe_tpu.envs.scenarios import EVAL_SCENARIOS, scenario_spawns


def _scene(cfg, seed=0):
    env = HideAndSeek(cfg)
    return env, env._sample_scene(jax.random.PRNGKey(seed))


def test_default_has_no_mixing_and_fallback_stat():
    cfg = HideAndSeekCfg(num_envs=64, num_agents=3)
    env = HideAndSeek(cfg)
    state = env.reset(jax.random.PRNGKey(0))
    assert "scene_fallback" in state.stats
    # default settings: feasibility re-draws should almost never exhaust
    assert float(jnp.mean(state.stats["scene_fallback"])) < 0.05


def test_eval_spawn_ratio_mixes_fixed_tables():
    """With rotation off, mixed envs must sit exactly on one of the fixed
    eval spawn tables; with ratio 1.0 every env is mixed."""
    cfg = HideAndSeekCfg(
        num_envs=32, num_agents=3,
        eval_spawn_ratio=1.0, eval_mix_rotate=False,
    )
    env, (d, q, t, cyl, fb, _dg) = _scene(cfg)
    tabs_d = np.stack([scenario_spawns(f, 3)[0] for f in EVAL_SCENARIOS])
    tabs_t = np.stack([scenario_spawns(f, 3)[1] for f in EVAL_SCENARIOS])
    d, t = np.asarray(d), np.asarray(t)
    for i in range(cfg.num_envs):
        err_d = np.abs(tabs_d - d[i]).max(axis=(1, 2))
        err_t = np.abs(tabs_t - t[i]).max(axis=(1, 2))
        # the same scenario index must match BOTH tables
        assert ((err_d < 1e-5) & (err_t < 1e-5)).any(), i


def test_eval_spawn_ratio_rotation_preserves_radii():
    cfg = HideAndSeekCfg(
        num_envs=64, num_agents=3,
        eval_spawn_ratio=1.0, eval_mix_rotate=True,
    )
    env, (d, q, t, cyl, fb, _dg) = _scene(cfg)
    tabs_d = np.stack([scenario_spawns(f, 3)[0] for f in EVAL_SCENARIOS])
    radii = np.linalg.norm(np.asarray(d)[..., :2], axis=-1)  # [E, n]
    tab_radii = np.linalg.norm(tabs_d[..., :2], axis=-1)     # [S, n]
    for i in range(cfg.num_envs):
        err = np.abs(tab_radii - radii[i]).max(axis=1)
        assert (err < 1e-5).any(), i
    # z untouched by the yaw rotation
    assert np.allclose(np.asarray(d)[..., 2], 0.5, atol=1e-5)


def test_eval_scenario_ratio_mixes_cylinders_and_spawns():
    """Scenario mixing replaces cylinders AND spawns together; the wall
    scenario's 4-cylinder line must appear among mixed envs."""
    cfg = HideAndSeekCfg(
        num_envs=64, num_agents=3,
        eval_scenario_ratio=1.0, eval_mix_rotate=False,
    )
    env, (d, q, t, cyl, fb, _dg) = _scene(cfg)
    from mupe_tpu.envs.scenarios import scenario_cylinders

    cyl = np.asarray(cyl)
    # only scenarios whose layout fits num_cylinders participate
    assert set(env._mix_full_scenarios) == {"empty", "wall", "narrow_gap"}
    found = 0
    for f in env._mix_full_scenarios:
        tab, _ = scenario_cylinders(
            f, cfg.num_cylinders, cfg.cylinder_size, cfg.max_height
        )
        match = np.abs(cyl - tab[None]).max(axis=(1, 2)) < 1e-5
        found += int(match.sum())
    assert found == cfg.num_envs
    # mixed envs are flagged non-fallback
    assert float(jnp.max(fb)) == 0.0


def test_partial_ratio_mixes_a_fraction():
    cfg = HideAndSeekCfg(
        num_envs=256, num_agents=3,
        eval_spawn_ratio=0.25, eval_mix_rotate=False,
    )
    env, (d, q, t, cyl, fb, _dg) = _scene(cfg)
    tabs_d = np.stack([scenario_spawns(f, 3)[0] for f in EVAL_SCENARIOS])
    d = np.asarray(d)
    mixed = 0
    for i in range(cfg.num_envs):
        err_d = np.abs(tabs_d - d[i]).max(axis=(1, 2))
        mixed += int((err_d < 1e-5).any())
    assert 0.10 * cfg.num_envs < mixed < 0.45 * cfg.num_envs, mixed


def test_mixing_step_runs_and_is_finite():
    cfg = HideAndSeekCfg(
        num_envs=8, num_agents=3, max_episode_length=8,
        eval_spawn_ratio=0.3, eval_scenario_ratio=0.3,
    )
    env = HideAndSeek(cfg)
    key = jax.random.PRNGKey(0)
    state = env.reset(key)
    tp_params = env.tp_net.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, cfg.history_step, cfg.tp_input_dim)),
    )
    stepf = jax.jit(env.step)
    for i in range(9):
        key, k1, k2 = jax.random.split(key, 3)
        action = jax.random.normal(k1, (8, 3, 4)) * 0.1
        state, tr = stepf(state, action, k2, tp_params)
        assert np.isfinite(np.asarray(tr.reward)).all()
    assert np.isfinite(np.asarray(state.drone.pos)).all()


def test_aeg_starvation_boosts_ratio_unif():
    """dry_cycles accumulates on zero-ingestion cycles and the effective
    ratio_unif rises to starve_ratio_unif once the threshold is hit."""
    from mupe_tpu.envs.genbuffer import GenBufferState
    from mupe_tpu.envs.hideandseek_envgen import (
        HideAndSeekEnvgen,
        HideAndSeekEnvgenCfg,
    )

    cfg = HideAndSeekEnvgenCfg(
        num_envs=4, num_agents=3, max_episode_length=4, eval_iter=1,
        starve_cycles=2, starve_ratio_unif=0.9, ratio_unif=0.3,
        # keep success at 0 (no captures with random actions) and the
        # ingestion band unreachable → every cycle is dry
        r_min=0.5, r_max=0.9,
    )
    env = HideAndSeekEnvgen(cfg)
    key = jax.random.PRNGKey(0)
    state = env.reset(key)
    tp_params = env.tp_net.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, cfg.history_step, cfg.tp_input_dim)),
    )
    stepf = jax.jit(env.step)
    ratio_seen = []
    for i in range(3 * cfg.max_episode_length):
        key, k1, k2 = jax.random.split(key, 3)
        action = jax.random.normal(k1, (4, 3, 4)) * 0.1
        state, tr = stepf(state, action, k2, tp_params)
        if bool(tr.done.any()):
            ratio_seen.append(float(tr.stats["ratio_unif"].mean()))
    assert int(state.gen.dry_cycles) >= 2
    assert ratio_seen[-1] >= 0.9 - 1e-6, ratio_seen
    assert ratio_seen[0] <= 0.3 + 1e-6, ratio_seen  # boost not active at start


def test_eval_mix_scenarios_restriction():
    """eval_mix_scenarios limits the mixed tables to the named layouts."""
    cfg = HideAndSeekCfg(
        num_envs=32, num_agents=3,
        eval_scenario_ratio=1.0, eval_mix_rotate=False,
        eval_mix_scenarios=("empty",),
    )
    env = HideAndSeek(cfg)
    assert env._mix_full_scenarios == ("empty",)
    d, q, t, cyl, fb, _dg = env._sample_scene(jax.random.PRNGKey(0))
    # empty layout: every cylinder parked underground
    assert float(jnp.max(np.asarray(cyl)[..., 2])) < 0.0
    import pytest

    with pytest.raises(ValueError):
        HideAndSeek(
            HideAndSeekCfg(
                num_envs=4, eval_spawn_ratio=0.5,
                eval_mix_scenarios=("nope",),
            )
        )



def test_eval_jitter_produces_distinct_trials():
    """Jittered eval (round-4 VERDICT missing #2): with jitter on, the
    fixed-scenario spawns become per-env DISTINCT (fractional capture
    rates); with the default jitter 0, the exact deterministic protocol
    is bit-preserved."""
    base = dict(
        num_envs=16, num_agents=3, use_random_cylinder=False,
        use_eval=True, scenario_flag="wall", max_cylinders=6,
    )
    env0 = HideAndSeek(HideAndSeekCfg(**base))
    d0, q0, t0, *_ = env0._sample_scene(jax.random.PRNGKey(0))
    # deterministic default: every env identical, zero attitude
    assert float(jnp.max(jnp.abs(d0 - d0[:1]))) == 0.0
    assert float(jnp.max(jnp.abs(q0[..., 1:]))) == 0.0  # identity quat

    envj = HideAndSeek(HideAndSeekCfg(
        **base, eval_jitter_xy=0.05, eval_jitter_z=0.1,
        eval_jitter_rpy=0.05,
    ))
    dj, qj, tj, *_ = envj._sample_scene(jax.random.PRNGKey(0))
    # per-env distinct spawns, bounded by the jitter amplitudes
    assert float(jnp.max(jnp.abs(dj - dj[:1]))) > 0.0
    assert float(jnp.max(jnp.abs(dj - d0))) <= 0.1 + 1e-6
    assert float(jnp.max(jnp.abs(dj[..., :2] - d0[..., :2]))) <= 0.05 + 1e-6
    assert float(jnp.max(jnp.abs(tj - t0))) <= 0.1 + 1e-6
    # attitude jittered but small
    assert float(jnp.max(jnp.abs(qj[..., 1:]))) > 0.0
    # the scenario cylinders are untouched by jitter
    _, _, _, cylj, *_ = envj._sample_scene(jax.random.PRNGKey(0))
    _, _, _, cyl0, *_ = env0._sample_scene(jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(cylj - cyl0))) == 0.0


def test_eval_spawn_mix_keeps_cylinders():
    """Root cause of round-4's 22% forced-empty arenas: the fixed eval
    spawn tables sit near the arena rim, whose cells the conservative
    grid-circle mask calls 'outside', so feasibility failed at EVERY
    cylinder count and the fallback emptied the scene.  With endpoint
    projection (placement.feasible_layout), eval-spawn-mixed resets keep
    their sampled cylinders: fallback ~0, degradation rare."""
    cfg = HideAndSeekCfg(
        num_envs=256, num_agents=3, eval_spawn_ratio=1.0,
        eval_mix_rotate=True, max_cylinders=6,
    )
    env = HideAndSeek(cfg)
    d, q, t, cyl, fb, dg = env._sample_scene(jax.random.PRNGKey(3))
    assert float(jnp.mean(fb)) < 0.02, float(jnp.mean(fb))
    active = jnp.sum(np.asarray(cyl)[..., 2] > 0.0, axis=-1)
    assert float(jnp.mean(active >= cfg.min_cylinders)) > 0.9
