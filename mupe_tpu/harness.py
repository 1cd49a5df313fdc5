"""Experiment harness: build env+policy from config, run the training loop.

Counterpart of the reference entry scripts
(scripts/train.py:88-327, train_generator.py, train_deploy.py, eval.py)
— one shared implementation parameterized by task/algo config sections.
Publishes the same headline metrics (`rollout_fps`, `env_frames`, episode
stats) under the same names.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from .envs import ENV_REGISTRY
from .envs.hover import Hover, HoverCfg
from .envs.hideandseek import HideAndSeek, HideAndSeekCfg
from .envs.hideandseek_envgen import HideAndSeekEnvgen, HideAndSeekEnvgenCfg
from .learning import (MAPPOCfg, MAPPOPolicy, init_carry,
                       make_split_train_iter, make_train_iter)
from .parallel import make_mesh, shard_carry
from .utils.checkpoint import load_checkpoint, save_checkpoint
from .utils.config import RunCfg, apply_overrides, parse_cli
from .utils.logging import RunLogger, config_dict

TASK_CFGS = {
    "Hover": (Hover, HoverCfg),
    "HideAndSeek": (HideAndSeek, HideAndSeekCfg),
    "HideAndSeek_envgen": (HideAndSeekEnvgen, HideAndSeekEnvgenCfg),
}


def build(
    task: str,
    env_overrides: Optional[Dict[str, Any]] = None,
    algo_overrides: Optional[Dict[str, Any]] = None,
):
    """Instantiate (env, policy, env_cfg, algo_cfg) for a task name."""
    env_cls, cfg_cls = TASK_CFGS[task]
    env_cfg = apply_overrides(cfg_cls(), env_overrides or {})
    env = env_cls(env_cfg)

    algo_cfg = MAPPOCfg()
    is_multi = getattr(env, "provides_tp", False)
    if is_multi:
        algo_cfg = dataclasses.replace(
            algo_cfg,
            use_tp_net=env_cfg.use_tp_net,
            future_prediction_step=env_cfg.future_prediction_step,
            window_step=env_cfg.window_step,
        )
    algo_cfg = apply_overrides(algo_cfg, algo_overrides or {})

    policy = MAPPOPolicy(
        algo_cfg,
        n_agents=env.num_agents,
        action_dim=env.action_dim,
        obs_is_dict=is_multi,
        tp_input_dim=env_cfg.tp_input_dim if is_multi else None,
    )
    return env, policy, env_cfg, algo_cfg


def train(
    argv: Sequence[str],
    default_task: str = "HideAndSeek",
    deploy_stage: bool = False,
) -> Dict[str, float]:
    """The main training loop (reference scripts/train.py:88-327).

    `deploy_stage=True` replicates train_deploy.py: threads the training
    epoch into the env so the smoothness-reward coefficient ramps
    (train_deploy.py:270, hideandseek.py:986-989).
    """
    sections, top = parse_cli(argv)
    run_cfg = apply_overrides(RunCfg(task=default_task), top)
    env, policy, env_cfg, algo_cfg = build(
        run_cfg.task, sections.get("env"), sections.get("algo")
    )
    if deploy_stage and hasattr(env_cfg, "use_deployment"):
        env_cfg = dataclasses.replace(env_cfg, use_deployment=True)
        env = type(env)(env_cfg)

    logger = RunLogger(
        run_cfg.run_dir,
        run_cfg.run_name,
        wandb_mode=run_cfg.wandb_mode,
        wandb_project=run_cfg.wandb_project,
        wandb_entity=run_cfg.wandb_entity,
        config=config_dict(run_cfg, env_cfg, algo_cfg),
    )

    key = jax.random.PRNGKey(run_cfg.seed)
    carry = init_carry(env, policy, key)
    if run_cfg.model_dir:
        carry = carry.replace(
            ts=load_checkpoint(run_cfg.model_dir, target=carry.ts)
        )
    mesh = make_mesh()
    if mesh.devices.size > 1:
        carry = shard_carry(carry, mesh)
    # split rollout/update programs: bounded compile time on the TPU
    # relay backend (see learning/rollout.py)
    train_iter = make_split_train_iter(env, policy)

    frames_per_iter = env.num_envs * algo_cfg.train_every
    if run_cfg.max_iters > 0:
        num_iters = run_cfg.max_iters
    else:
        num_iters = max(1, run_cfg.total_frames // frames_per_iter)

    env_frames = 0
    last_metrics: Dict[str, float] = {}
    t_start = time.time()
    t_block = t_start
    for i in range(num_iters):
        if deploy_stage:
            carry = carry.replace(
                env_state=carry.env_state.replace(
                    update_epoch=jax.numpy.asarray(float(i))
                )
            )
        carry, metrics, ep_stats = train_iter(carry)
        env_frames += frames_per_iter
        if (i + 1) % run_cfg.log_interval == 0 or i == num_iters - 1:
            jax.block_until_ready(metrics["policy_loss"])
            now = time.time()
            fps = frames_per_iter * run_cfg.log_interval / max(now - t_block, 1e-9)
            t_block = now
            row = {
                **{k: np.asarray(v) for k, v in metrics.items()},
                **{f"stats/{k}": np.asarray(v) for k, v in ep_stats.items()},
                "rollout_fps": fps,
                "env_frames": env_frames,
            }
            logger.log(row, step=env_frames)
            last_metrics = {k: float(np.asarray(v)) for k, v in row.items()}
        if run_cfg.save_interval > 0 and (i + 1) % run_cfg.save_interval == 0:
            save_checkpoint(logger.dir / "checkpoints", i + 1, carry.ts)
    save_checkpoint(logger.dir / "checkpoints", num_iters, carry.ts)
    logger.close()
    last_metrics["total_time_s"] = time.time() - t_start
    return last_metrics


def evaluate(argv: Sequence[str]) -> Dict[str, float]:
    """Deterministic evaluation rollout (reference scripts/eval.py:82-264):
    one episode on the configured fixed scenario, per-episode stats."""
    sections, top = parse_cli(argv)
    run_cfg = apply_overrides(RunCfg(task="HideAndSeek"), top)
    env_over = dict(sections.get("env", {}))
    env_over.setdefault("use_eval", True)
    env, policy, env_cfg, algo_cfg = build(
        run_cfg.task, env_over, sections.get("algo")
    )
    key = jax.random.PRNGKey(run_cfg.seed)
    carry = init_carry(env, policy, key)
    if run_cfg.model_dir:
        carry = carry.replace(
            ts=load_checkpoint(run_cfg.model_dir, target=carry.ts)
        )

    render_keys = ("target_pos", "cylinders", "capture")
    want_video = bool(run_cfg.video)

    def eval_step(carry_in, _):
        (ts, env_state, obs, state, key) = carry_in
        key, k_act, k_env = jax.random.split(key, 3)
        action, _, _ = policy.act(ts, obs, k_act, deterministic=True, state=state)
        if getattr(env, "provides_tp", False):
            env_state, tr = env.step(env_state, action, k_env, ts.tp_params)
        else:
            env_state, tr = env.step(env_state, action, k_env)
        nxt = tr.info.get("state") if isinstance(tr.info, dict) else None
        out = (tr.done, tr.stats)
        if want_video:
            frame = {"drone_pos": tr.info["drone_state"][..., :3]}
            frame.update({k: tr.info[k] for k in render_keys if k in tr.info})
            out = out + (frame,)
        return (ts, env_state, tr.obs, nxt, key), out

    length = env.cfg.max_episode_length

    @jax.jit
    def run_episode(carry_in):
        return jax.lax.scan(
            eval_step,
            (carry_in.ts, carry_in.env_state, carry_in.obs, carry_in.state,
             carry_in.key),
            None,
            length=length,
        )

    if want_video:
        _, (dones, stats, frames) = run_episode(carry)
        from .utils.render import episode_video

        host_frames = {k: np.asarray(v) for k, v in frames.items()}
        if "target_pos" in host_frames:
            episode_video(
                host_frames, env.cfg, run_cfg.video,
                env_index=run_cfg.video_env_index,
            )
            print(f"video: {run_cfg.video}")
        else:
            print("video: task provides no render info; skipped")
    else:
        _, (dones, stats) = run_episode(carry)
    dones = np.asarray(dones)  # [T, E, 1]
    n_done = dones.sum()
    result = {}
    for k, v in stats.items():
        v = np.asarray(v)
        result[k] = float((v * dones).sum() / max(n_done, 1))
    result["episodes"] = float(n_done)
    for k in sorted(result):
        print(f"{k}: {result[k]:.4f}")
    return result
