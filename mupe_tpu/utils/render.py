"""Arena rendering for evaluation videos and visual debugging.

TPU-native stand-in for the reference's render stack: the Isaac
replicator RGB annotator that feeds eval videos
(reference: omni_drones/envs/isaac_env.py:329-376, scripts/train.py:256-262)
and the `omni.isaac.debug_draw` overlays — court circle, evader-prediction
points, capture/blocked coloring
(reference: omni_drones/envs/hide_and_seek/draw.py:33-226,
draw_circle.py:33-93, hideandseek.py:1144-1245).

Rendering is host-side matplotlib (Agg) over trajectories gathered from the
device in one transfer — it never touches the compiled step.  Output is
uint8 RGB frames; `save_gif` writes an animated GIF via PIL (no ffmpeg
dependency in the image).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

_DRONE_COLORS = ("#1f77b4", "#2ca02c", "#9467bd", "#8c564b")


def _get_canvas(figsize, dpi):
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def render_frame(
    drone_pos: np.ndarray,          # [n, 3]
    target_pos: np.ndarray,         # [3]
    cylinders: np.ndarray,          # [C, 3] (inactive parked at z < 0)
    arena_size: float = 0.9,
    max_height: float = 1.2,
    cylinder_size: float = 0.1,
    catch_radius: float = 0.3,
    captured: bool = False,
    predicted: Optional[np.ndarray] = None,   # [K, 3] TP-net waypoints
    drone_trail: Optional[np.ndarray] = None,  # [T, n, 3]
    target_trail: Optional[np.ndarray] = None,  # [T, 3]
    title: str = "",
    dpi: int = 72,
) -> np.ndarray:
    """Render one top-down + side-elevation frame → uint8 [H, W, 3].

    Mirrors the debug-draw overlays: arena circle (draw_circle.py:33-93),
    cylinders, pursuers with capture-radius circles colored by capture
    state (hideandseek.py:1210-1245), the evader, and the TP-net's
    predicted evader waypoints (hideandseek.py:1144-1208).
    """
    plt = _get_canvas((8, 4.5), dpi)
    fig, (ax, axz) = plt.subplots(
        1, 2, figsize=(8, 4.5), dpi=dpi, width_ratios=[1.0, 0.45]
    )
    drone_pos = np.asarray(drone_pos)
    target_pos = np.asarray(target_pos).reshape(3)
    cylinders = np.asarray(cylinders)

    # --- top-down panel ---------------------------------------------------
    ax.add_patch(
        plt.Circle((0, 0), arena_size, fill=False, color="0.4", lw=1.5)
    )
    active = cylinders[:, 2] > 0.0
    for cx, cy, _ in cylinders[active]:
        ax.add_patch(
            plt.Circle((cx, cy), cylinder_size, color="0.65", zorder=2)
        )
    if target_trail is not None and len(target_trail):
        tt = np.asarray(target_trail)
        ax.plot(tt[:, 0], tt[:, 1], color="#d62728", lw=0.8, alpha=0.5)
    catch_color = "#d62728" if captured else "#1f77b4"
    for i in range(drone_pos.shape[0]):
        c = _DRONE_COLORS[i % len(_DRONE_COLORS)]
        if drone_trail is not None and len(drone_trail):
            dt = np.asarray(drone_trail)
            ax.plot(dt[:, i, 0], dt[:, i, 1], color=c, lw=0.8, alpha=0.5)
        ax.plot(*drone_pos[i, :2], marker="o", ms=7, color=c, zorder=4)
        ax.add_patch(
            plt.Circle(
                tuple(drone_pos[i, :2]), catch_radius, fill=False,
                color=catch_color, lw=0.8, alpha=0.7, zorder=3,
            )
        )
    ax.plot(
        target_pos[0], target_pos[1], marker="*", ms=14,
        color="#d62728", zorder=5,
    )
    if predicted is not None and len(predicted):
        pred = np.asarray(predicted)
        ax.plot(
            pred[:, 0], pred[:, 1], marker="x", ms=5, ls=":",
            color="#ff7f0e", zorder=5,
        )
    lim = arena_size * 1.15
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")
    ax.set_title(title or ("CAPTURED" if captured else ""))
    ax.set_xticks(())
    ax.set_yticks(())

    # --- side elevation ----------------------------------------------------
    axz.axhline(0.0, color="0.4", lw=1.0)
    axz.axhline(max_height, color="0.4", lw=1.0, ls="--")
    for cx, _, _ in cylinders[active]:
        axz.add_patch(
            plt.Rectangle(
                (cx - cylinder_size, 0.0), 2 * cylinder_size, max_height,
                color="0.85", zorder=1,
            )
        )
    for i in range(drone_pos.shape[0]):
        axz.plot(
            drone_pos[i, 0], drone_pos[i, 2], marker="o", ms=6,
            color=_DRONE_COLORS[i % len(_DRONE_COLORS)], zorder=4,
        )
    axz.plot(target_pos[0], target_pos[2], marker="*", ms=12, color="#d62728")
    axz.set_xlim(-lim, lim)
    axz.set_ylim(-0.05, max_height * 1.2)
    axz.set_xticks(())
    axz.set_title("side")

    fig.tight_layout()
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def render_trajectory(
    drone_pos: np.ndarray,           # [T, n, 3]
    target_pos: np.ndarray,          # [T, 3] (or [T, 1, 3])
    cylinders: np.ndarray,           # [C, 3] or [T, C, 3]
    captured: Optional[np.ndarray] = None,   # [T] bool
    predicted: Optional[np.ndarray] = None,  # [T, K, 3]
    every: int = 2,
    trail: int = 120,
    **kwargs,
) -> List[np.ndarray]:
    """Render every `every`-th step of one episode (the reference records
    every 2nd frame: scripts/eval.py:209 `Every(record_frame, 2)`)."""
    drone_pos = np.asarray(drone_pos)
    target_pos = np.asarray(target_pos).reshape(len(drone_pos), 3)
    cylinders = np.asarray(cylinders)
    frames = []
    for t in range(0, len(drone_pos), every):
        cyl = cylinders[t] if cylinders.ndim == 3 else cylinders
        lo = max(0, t - trail)
        frames.append(
            render_frame(
                drone_pos[t],
                target_pos[t],
                cyl,
                captured=bool(captured[t]) if captured is not None else False,
                predicted=predicted[t] if predicted is not None else None,
                drone_trail=drone_pos[lo : t + 1],
                target_trail=target_pos[lo : t + 1],
                title=f"t={t}",
                **kwargs,
            )
        )
    return frames


def save_gif(frames: Sequence[np.ndarray], path: str, fps: float = 25.0) -> str:
    """Write frames as an animated GIF (the eval-video sink; the reference
    uploads wandb.Video at fps = 0.5/dt, scripts/eval.py:245-251)."""
    from PIL import Image

    imgs = [Image.fromarray(np.asarray(f)) for f in frames]
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=max(1, int(1000.0 / fps)),
        loop=0,
    )
    return path


def episode_video(
    rollout_info: Dict[str, np.ndarray],
    env_cfg,
    path: str,
    env_index: int = 0,
    fps: float = 25.0,
    every: int = 2,
) -> str:
    """Convenience: turn per-step eval info (as stacked host arrays) into a
    GIF for one arena. Expects keys 'drone_pos' [T,E,n,3], 'target_pos'
    [T,E,1,3], 'cylinders' [T,E,C,3]; optional 'capture' [T,E,1] and
    'tp_pred' [T,E,K,3]."""
    e = env_index
    frames = render_trajectory(
        rollout_info["drone_pos"][:, e],
        rollout_info["target_pos"][:, e, 0],
        rollout_info["cylinders"][:, e],
        captured=(
            rollout_info["capture"][:, e, 0]
            if "capture" in rollout_info else None
        ),
        predicted=(
            rollout_info["tp_pred"][:, e] if "tp_pred" in rollout_info else None
        ),
        every=every,
        arena_size=env_cfg.arena_size,
        max_height=env_cfg.max_height,
        cylinder_size=env_cfg.cylinder_size,
        catch_radius=env_cfg.catch_radius,
    )
    return save_gif(frames, path, fps=fps)
