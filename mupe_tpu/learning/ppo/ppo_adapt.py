"""RMA-style adaptive PPO: privileged intrinsics encoder + adaptation module.

Counterpart of omni_drones/learning/ppo/ppo_adapt.py:144-666
(`PPOAdaptivePolicy`): three training phases
  * "encoder"    — PPO with a privileged context  z = E(intrinsics);
  * "adaptation" — freeze the policy; train a TConv module A(obs history)
                   to reproduce z (losses: MSE on z, action-distribution
                   divergence, value deviation — ppo_adapt.py:454-617);
  * "finetune"   — act from  ẑ = A(history)  and finetune the policy.
Conditioning is concat or FiLM (ppo_adapt.py:131,178-181).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..mappo import MAPPOCfg, MAPPOPolicy
from ..modules.distributions import DiagGaussianHead, Gaussian
from ..modules.networks import MLP
from .ppo_tconv import TConvEncoder


@dataclasses.dataclass(frozen=True)
class PPOAdaptCfg(MAPPOCfg):
    phase: str = "encoder"        # encoder | adaptation | finetune
    context_dim: int = 64
    condition_mode: str = "cat"   # cat | film
    adaptation_loss: str = "mse"  # mse | action | value
    adaptation_lr: float = 3e-4
    gamma: float = 0.99
    use_tp_net: bool = False


class IntrinsicsEncoder(nn.Module):
    """LayerNorm → MLP[64,64] → context (ppo_adapt.py, the `encoder` branch)."""

    context_dim: int = 64

    @nn.compact
    def __call__(self, intrinsics: jnp.ndarray) -> jnp.ndarray:
        return MLP((64, self.context_dim))(nn.LayerNorm()(intrinsics))


class AdaptationModule(nn.Module):
    """TConv over the obs history → predicted context (ppo_adapt.py TConv
    adaptation module)."""

    context_dim: int = 64

    @nn.compact
    def __call__(self, obs_history: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.context_dim)(TConvEncoder()(obs_history))


class _CondBody(nn.Module):
    """Obs features conditioned on a context, by concat or FiLM."""

    condition_mode: str = "cat"

    @nn.compact
    def __call__(self, obs: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        feats = MLP((128, 128))(obs)
        if self.condition_mode == "film":
            gamma = nn.Dense(feats.shape[-1])(context)
            beta = nn.Dense(feats.shape[-1])(context)
            x = feats * (1.0 + gamma) + beta
        else:
            x = jnp.concatenate([feats, context], axis=-1)
        return MLP((256, 256))(x)


class _AdaptActor(nn.Module):
    action_dim: int
    condition_mode: str

    @nn.compact
    def __call__(self, obs, context) -> Gaussian:
        return DiagGaussianHead(self.action_dim)(
            _CondBody(self.condition_mode)(obs, context)
        )


class _AdaptCritic(nn.Module):
    condition_mode: str

    @nn.compact
    def __call__(self, obs, context) -> jnp.ndarray:
        return nn.Dense(1, kernel_init=nn.initializers.orthogonal(0.01))(
            _CondBody(self.condition_mode)(obs, context)
        )


class _ContextActorWrapper(nn.Module):
    """Adapts the (obs dict) → Gaussian interface expected by MAPPOPolicy:
    context comes from intrinsics (encoder/finetune phases use different
    sources at act time, chosen by the policy)."""

    action_dim: int
    condition_mode: str
    context_dim: int
    use_adaptation: bool

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray]) -> Gaussian:
        if self.use_adaptation:
            context = AdaptationModule(self.context_dim, name="adaptation")(
                obs["observation_h"]
            )
        else:
            context = IntrinsicsEncoder(self.context_dim, name="encoder")(
                obs["intrinsics"]
            )
        return _AdaptActor(self.action_dim, self.condition_mode)(
            obs["observation"], context
        )


class _ContextCriticWrapper(nn.Module):
    condition_mode: str
    context_dim: int

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        context = IntrinsicsEncoder(self.context_dim, name="encoder")(
            obs["intrinsics"]
        )
        return _AdaptCritic(self.condition_mode)(obs["observation"], context)


class PPOAdaptivePolicy(MAPPOPolicy):
    """Observations: {"observation": flat, "intrinsics": flat,
    "observation_h": (..., T, D) history} (the History transform provides
    observation_h).  PPO machinery is inherited; the adaptation phase adds
    `update_adaptation`."""

    def __init__(
        self,
        cfg: PPOAdaptCfg = PPOAdaptCfg(),
        n_agents: int = 1,
        action_dim: int = 4,
    ):
        self.adapt_cfg = cfg
        use_adaptation = cfg.phase in ("adaptation", "finetune")
        super().__init__(
            cfg,
            n_agents=n_agents,
            action_dim=action_dim,
            obs_is_dict=True,
            actor_module=_ContextActorWrapper(
                action_dim, cfg.condition_mode, cfg.context_dim, use_adaptation
            ),
            critic_module=_ContextCriticWrapper(cfg.condition_mode, cfg.context_dim),
        )
        self.encoder = IntrinsicsEncoder(cfg.context_dim)
        self.adaptation = AdaptationModule(cfg.context_dim)
        self.adapt_tx = optax.adam(cfg.adaptation_lr)

    def update_adaptation(
        self,
        adaptation_params,
        adapt_opt,
        encoder_params,
        obs_history: jnp.ndarray,
        intrinsics: jnp.ndarray,
    ) -> Tuple[dict, dict, jnp.ndarray]:
        """Phase-2 supervised step: Â(history) ≈ E(intrinsics)
        (ppo_adapt.py:454-479 MSE loss)."""
        target = self.encoder.apply(encoder_params, intrinsics)

        def loss_fn(p):
            pred = self.adaptation.apply(p, obs_history)
            return jnp.mean(jnp.square(pred - jax.lax.stop_gradient(target)))

        loss, grads = jax.value_and_grad(loss_fn)(adaptation_params)
        updates, adapt_opt = self.adapt_tx.update(grads, adapt_opt, adaptation_params)
        adaptation_params = optax.apply_updates(adaptation_params, updates)
        return adaptation_params, adapt_opt, loss
