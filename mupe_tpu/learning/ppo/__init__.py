from .ppo import PPOCfg, PPOPolicy
from .ppo_tconv import PPOTConvPolicy, TConvEncoder
from .ppo_sdf_nav import PPOSDFNavPolicy, PointNetEncoder
from .transformer import TransformerPPOPolicy, TransformerEncoder
from .ppo_rnn import PPORNNPolicy
from .ppo_adapt import AdaptationModule, PPOAdaptivePolicy

__all__ = [
    "PPOCfg",
    "PPOPolicy",
    "PPOTConvPolicy",
    "TConvEncoder",
    "PPOSDFNavPolicy",
    "PointNetEncoder",
    "TransformerPPOPolicy",
    "TransformerEncoder",
    "PPORNNPolicy",
    "AdaptationModule",
    "PPOAdaptivePolicy",
]
