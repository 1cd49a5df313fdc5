"""Placement / GenBuffer / FPS tests."""
import jax
import jax.numpy as jnp
import numpy as np

from mupe_tpu.envs.genbuffer import (
    GenBufferState,
    insert_weights,
    sample_history,
    sample_nearby,
    update_history,
    _sanity_check,
)
from mupe_tpu.envs.placement import (
    continuous_to_grid,
    flood_fill_reachable,
    grid_to_continuous,
    has_feasible_path,
    make_grid,
    occupancy_from_points,
    outside_circle_mask,
    sample_cylinders,
    sample_free_cells,
)
from mupe_tpu.ops.fps import farthest_point_sampling


GRID = make_grid(arena_size=0.9, cylinder_size=0.1)


def test_grid_round_trip():
    assert GRID.num_grid == 9
    cells = jnp.asarray([[4, 4], [0, 4], [8, 8]])
    xy = grid_to_continuous(cells, GRID)
    np.testing.assert_allclose(np.asarray(xy[0]), [0.0, 0.0], atol=1e-6)
    back = continuous_to_grid(xy, GRID)
    # clamping to boundary may move edge cells inward by ≤1
    assert np.abs(np.asarray(back) - np.asarray(cells)).max() <= 1


def test_outside_circle_mask_matches_reference_loop():
    m = outside_circle_mask(9)
    r = 4
    for i in range(9):
        for j in range(9):
            expected = np.sqrt((i - r) ** 2 + (j - r) ** 2) >= r
            assert m[i, j] == expected


def test_sample_free_cells_distinct_and_free():
    occ = jnp.asarray(outside_circle_mask(9))[None].repeat(16, axis=0)
    xy = sample_free_cells(jax.random.PRNGKey(0), occ, 5, GRID)
    cells = np.asarray(continuous_to_grid(xy, GRID))
    m = np.asarray(outside_circle_mask(9))
    for e in range(16):
        cs = cells[e]
        assert len(np.unique(cs, axis=0)) == 5  # distinct
        assert not m[cs[:, 0], cs[:, 1]].any()  # free


def test_sample_cylinders_avoids_agents():
    key = jax.random.PRNGKey(3)
    drone_xy = jnp.zeros((32, 3, 2))  # all drones at center cell
    target_xy = jnp.full((32, 1, 2), 0.2)
    xy, active = sample_cylinders(
        key, drone_xy, target_xy, GRID, 5, 4, 5
    )
    cells = np.asarray(continuous_to_grid(xy, GRID))
    assert not ((cells == [4, 4]).all(-1)).any()  # not on the drones' cell
    assert np.all((np.asarray(active) >= 4) & (np.asarray(active) <= 5))


def test_flood_fill_and_feasible_path():
    # wall of obstacles splitting the grid, with no gap
    free = np.ones((9, 9), dtype=bool)
    free[:, 4] = False
    start = jnp.asarray([0, 0])
    goals = jnp.asarray([[0, 8]])
    ok = has_feasible_path(
        jnp.asarray(free)[None], start[None], goals[None], num_iters=41
    )
    assert not bool(ok[0])
    free[0, 4] = True  # open a gap
    ok = has_feasible_path(
        jnp.asarray(free)[None], start[None], goals[None], num_iters=41
    )
    assert bool(ok[0])


def test_fps_spreads_points():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(size=(100, 2)).astype(np.float32))
    idx = np.asarray(farthest_point_sampling(pts, 10))
    assert len(np.unique(idx)) == 10
    # FPS min pairwise distance should beat random selection on average
    sel = np.asarray(pts)[idx]
    d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
    d += np.eye(10) * 1e9
    rnd = np.asarray(pts)[rng.choice(100, 10, replace=False)]
    dr = np.linalg.norm(rnd[:, None] - rnd[None], axis=-1) + np.eye(10) * 1e9
    assert d.min() > dr.min() * 0.9


def test_fps_respects_valid_mask():
    pts = jnp.asarray(np.linspace(0, 1, 50)[:, None].astype(np.float32))
    valid = jnp.arange(50) < 25
    idx = np.asarray(farthest_point_sampling(pts, 10, valid=valid))
    assert (idx < 25).all()


def _make_gb(num_envs=8, task_dim=24, cap=16):
    return GenBufferState.create(cap, num_envs, task_dim, ratio_unif=0.3)


def test_genbuffer_weight_cycle():
    gb = _make_gb()
    gb = gb.replace(eval_tasks=jnp.ones((8, 24)))
    for _ in range(3):
        gb = insert_weights(gb, jnp.full((8,), 0.7))
    gb2, added = update_history(gb, r_min=0.5, r_max=0.9)
    assert int(added) == 8  # all within band
    assert int(gb2.history_len) == 8
    assert float(gb2.weight_sum.sum()) == 0.0
    # out-of-band weights don't enter
    gb3 = _make_gb()
    for _ in range(3):
        gb3 = insert_weights(gb3, jnp.ones((8,)))  # success = 1 > R_max
    gb3, added3 = update_history(gb3, 0.5, 0.9)
    assert int(added3) == 0


def test_genbuffer_fps_downsampling():
    gb = _make_gb(num_envs=16, task_dim=4, cap=8)
    rng = np.random.default_rng(0)
    gb = gb.replace(
        history=jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)),
        history_len=jnp.asarray(8, jnp.int32),
        eval_tasks=jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32)),
    )
    for _ in range(2):
        gb = insert_weights(gb, jnp.full((16,), 0.7))
    gb2, added = update_history(gb, 0.5, 0.9)
    assert int(added) == 16
    assert int(gb2.history_len) == 8  # capped via FPS


def test_sample_nearby_valid_tasks():
    n_agents, n_cyl = 3, 5
    task_dim = 3 * n_agents + 3 + 3 * n_cyl
    # build one known-valid task: entities on distinct inside cells
    cells = np.asarray(
        [[3, 3], [3, 5], [5, 3], [5, 5], [4, 2], [2, 4], [4, 6], [6, 4], [4, 4]]
    )
    xy = np.asarray(grid_to_continuous(jnp.asarray(cells), GRID))
    task = np.zeros((task_dim,), np.float32)
    for i in range(4):  # 3 drones + target
        task[3 * i : 3 * i + 2] = xy[i]
        task[3 * i + 2] = 0.6
    for c in range(n_cyl):
        base = 12 + 3 * c
        task[base : base + 2] = xy[4 + c]
        task[base + 2] = 0.6
    assert bool(_sanity_check(jnp.asarray(task), GRID, n_agents, n_cyl))
    gb = GenBufferState.create(16, 8, task_dim, 0.3).replace(
        history=jnp.broadcast_to(jnp.asarray(task), (16, task_dim)),
        history_len=jnp.asarray(16, jnp.int32),
    )
    out = sample_nearby(
        jax.random.PRNGKey(0), gb, 8, GRID, n_agents, n_cyl,
        expand_step=0.1, expand_cylinders=False, arena_size=0.9, max_height=1.2,
    )
    assert out.shape == (8, task_dim)
    ok = _sanity_check(out, GRID, n_agents, n_cyl)
    assert bool(jnp.all(ok))


def test_sample_history_prefix_only():
    gb = _make_gb(cap=16)
    gb = gb.replace(
        history=jnp.arange(16)[:, None].repeat(24, 1).astype(jnp.float32),
        history_len=jnp.asarray(4, jnp.int32),
    )
    out = sample_history(jax.random.PRNGKey(0), gb, 64)
    assert float(out.max()) <= 3.0


def test_feasible_layout_detects_enclosure():
    from mupe_tpu.envs.placement import feasible_layout

    # target at center, ring of active cylinders around its cell
    target_xy = jnp.zeros((1, 1, 2))
    drone_xy = jnp.asarray([[[0.6, 0.0], [-0.6, 0.0], [0.0, -0.6]]])
    ring = jnp.asarray(
        [[[0.2, 0.0], [-0.2, 0.0], [0.0, 0.2], [0.0, -0.2],
          [0.2, 0.2], [-0.2, -0.2], [0.2, -0.2], [-0.2, 0.2]]]
    )
    active = jnp.ones((1, 8), bool)
    ok = feasible_layout(drone_xy, target_xy, ring, active, GRID)
    assert not bool(ok[0])
    # deactivate the ring → feasible
    ok2 = feasible_layout(
        drone_xy, target_xy, ring, jnp.zeros((1, 8), bool), GRID
    )
    assert bool(ok2[0])


def test_sampled_scenes_always_feasible():
    """Property (VERDICT item 4): every task produced by `_sample_scene`
    has a feasible drone→target path (reference placement.py:692-865)."""
    from mupe_tpu.envs.hideandseek import HideAndSeek, HideAndSeekCfg
    from mupe_tpu.envs.placement import feasible_layout
    from mupe_tpu.envs.scenarios import INVALID_Z

    cfg = HideAndSeekCfg(num_envs=512, use_cl_spawn=True, cl_bound=3)
    env = HideAndSeek(cfg)
    for seed in (0, 1):
        d, _, t, cyl, _fb, _dg = jax.jit(env._sample_scene)(
            jax.random.PRNGKey(seed)
        )
        ok = feasible_layout(
            d[..., :2], t[..., :2], cyl[..., :2], cyl[..., 2] > 0.0, env.grid
        )
        assert bool(jnp.all(ok)), f"seed {seed}: infeasible scenes sampled"
        # and not via the degenerate fallback everywhere: most envs keep
        # their cylinders
        active_counts = jnp.sum(cyl[..., 2] > 0.0, axis=-1)
        assert float(jnp.mean(active_counts >= cfg.min_cylinders)) > 0.9


def test_sanity_check_rejects_infeasible_expansion():
    # task layout: 3 drones + target + 8 cylinders enclosing the target
    n, c = 3, 8
    drone = np.array([[0.6, 0.0, 0.6], [-0.6, 0.0, 0.6], [0.0, -0.6, 0.6]])
    target = np.array([[0.0, 0.0, 0.6]])
    ring = np.array(
        [[0.2, 0.0], [-0.2, 0.0], [0.0, 0.2], [0.0, -0.2],
         [0.2, 0.2], [-0.2, -0.2], [0.2, -0.2], [-0.2, 0.2]]
    )
    cyl = np.concatenate([ring, np.full((c, 1), 0.6)], axis=-1)
    task = jnp.asarray(
        np.concatenate([drone.ravel(), target.ravel(), cyl.ravel()])
    )[None]
    assert not bool(_sanity_check(task, GRID, n, c)[0])
    # parked cylinders (z<0) are inactive → feasible
    cyl_parked = cyl.copy()
    cyl_parked[:, 2] = -20.0
    task2 = jnp.asarray(
        np.concatenate([drone.ravel(), target.ravel(), cyl_parked.ravel()])
    )[None]
    assert bool(_sanity_check(task2, GRID, n, c)[0])


def test_largest_feasible_prefix_degrades_gracefully():
    """Feasibility-exhaustion degradation (round-4 VERDICT weak #1): an
    infeasible draw keeps its largest feasible cylinder PREFIX instead of
    cliff-dropping to an empty arena.  The degradation order is pinned:
    cylinders are dropped from the END (highest index first)."""
    from mupe_tpu.envs.placement import (
        feasible_layout,
        largest_feasible_prefix,
    )

    target_xy = jnp.zeros((1, 1, 2))
    drone_xy = jnp.asarray([[[0.6, 0.0], [-0.6, 0.0], [0.0, -0.6]]])
    # first 4 cylinders: a harmless far arc; last 4 complete an enclosing
    # ring around the target → full layout infeasible, any prefix ≤ 6 is
    # feasible (ring incomplete)
    cyl = jnp.asarray(
        [[[0.2, 0.0], [-0.2, 0.0], [0.0, 0.2], [0.0, -0.2],
          [0.2, 0.2], [-0.2, -0.2], [0.2, -0.2], [-0.2, 0.2]]]
    )
    active = jnp.full((1, 1), 8, jnp.int32)
    assert not bool(
        feasible_layout(drone_xy, target_xy, cyl, jnp.ones((1, 8), bool), GRID)[0]
    )
    best = largest_feasible_prefix(drone_xy, target_xy, cyl, active, GRID)
    b = int(best[0])
    assert 1 <= b < 8, b
    # pinned order: the result is a PREFIX — re-checking feasibility with
    # exactly the first b cylinders passes, with b+1 fails
    idx = jnp.arange(8)[None, :]
    assert bool(
        feasible_layout(drone_xy, target_xy, cyl, idx < b, GRID)[0]
    )
    assert not bool(
        feasible_layout(drone_xy, target_xy, cyl, idx < (b + 1), GRID)[0]
    )
    # never exceeds the sampled count
    best2 = largest_feasible_prefix(
        drone_xy, target_xy, cyl, jnp.full((1, 1), 3, jnp.int32), GRID
    )
    assert int(best2[0]) == 3  # 3-cylinder prefix is feasible → keep all 3
    # feasible full layout → untouched
    far = jnp.asarray([[[0.5, 0.5], [-0.5, 0.5], [0.5, -0.5], [-0.5, -0.5],
                        [0.4, 0.0], [-0.4, 0.0], [0.0, 0.4], [0.0, -0.4]]])
    best3 = largest_feasible_prefix(
        drone_xy, target_xy, far, jnp.full((1, 1), 8, jnp.int32), GRID
    )
    assert int(best3[0]) == 8
