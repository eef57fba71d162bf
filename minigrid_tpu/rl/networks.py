"""Actor-critic network over MiniGrid symbolic observations.

The reference ships **no model code at all** (SURVEY.md §2.6) — training is
left to external libraries.  The TPU build makes the learner a first-class
component: a flax actor-critic whose design targets the MXU.

TPU-first choices:
  * The (V, V, 3) uint8 obs is *categorical*, not pixel data — we embed
    (type, color, state) per cell with learned tables and sum, instead of
    one-hotting into a 47-wide float tensor (reference
    wrappers.py:121-158 one-hots on the host).  An embedding gather is one
    HBM-light lookup; the resulting [V, V, C] activations are dense and
    bf16-friendly.
  * All matmuls/convs run in bfloat16 with float32 params and float32
    accumulation (``preferred_element_type``/``dtype`` split below) — the
    MXU's native mode.
  * Channel widths are multiples of 128 by default so XLA tiles every
    contraction onto the 128×128 systolic array without padding waste.
  * The whole forward is shape-static; it jits once per (B, V) and fuses the
    embedding, convs, and heads into a handful of kernels.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.step import NUM_ACTIONS

NUM_TYPES = max(C.OBJECT_TO_IDX.values()) + 1
NUM_CELL_STATES = 4  # door open/closed/locked + headroom
MISSION_VOCAB = 64  # packed mission codes are small ints (template + slots)


class ObsEncoder(nn.Module):
    """Embeds the symbolic obs dict into a single feature vector."""

    embed_dim: int = 16
    conv_features: Sequence[int] = (128, 128)
    out_features: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: dict) -> jnp.ndarray:
        img = obs["image"].astype(jnp.int32)  # [B, V, V, 3]
        typ = nn.Embed(NUM_TYPES, self.embed_dim, dtype=self.dtype)(img[..., 0])
        col = nn.Embed(C.NUM_COLORS, self.embed_dim, dtype=self.dtype)(img[..., 1])
        sta = nn.Embed(NUM_CELL_STATES, self.embed_dim, dtype=self.dtype)(
            jnp.clip(img[..., 2], 0, NUM_CELL_STATES - 1)
        )
        x = typ + col + sta  # [B, V, V, E]

        for feats in self.conv_features:
            x = nn.Conv(feats, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)  # [B, V*V*C]

        # Direction as a learned embedding (obs['direction'] in 0..3).
        d = nn.Embed(4, self.embed_dim, dtype=self.dtype)(
            obs["direction"].astype(jnp.int32)
        )
        # Mission: packed int32[B, K] code — embed each slot, sum.  The string
        # surface stays on the host (registry detok); the network sees the
        # same information content as the reference's token pipeline
        # (wrappers.py:286-403) without host-side tokenization.
        m = nn.Embed(MISSION_VOCAB, self.embed_dim, dtype=self.dtype)(
            jnp.clip(obs["mission"].astype(jnp.int32), 0, MISSION_VOCAB - 1)
        ).sum(axis=-2)

        x = jnp.concatenate([x, d, m], axis=-1)
        x = nn.Dense(self.out_features, dtype=self.dtype)(x)
        x = nn.relu(x)
        return x


class ActorCritic(nn.Module):
    """Policy + value heads over the shared encoder.

    Returns (logits float32[B, A], value float32[B]) — heads are computed in
    float32 for numerically stable softmax/log-prob and value regression.
    """

    num_actions: int = NUM_ACTIONS
    embed_dim: int = 16
    conv_features: Sequence[int] = (128, 128)
    hidden: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
        x = ObsEncoder(
            embed_dim=self.embed_dim,
            conv_features=tuple(self.conv_features),
            out_features=self.hidden,
            dtype=self.dtype,
        )(obs)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.relu(x)
        logits = nn.Dense(
            self.num_actions,
            dtype=jnp.float32,
            kernel_init=nn.initializers.orthogonal(0.01),
        )(x.astype(jnp.float32))
        value = nn.Dense(
            1,
            dtype=jnp.float32,
            kernel_init=nn.initializers.orthogonal(1.0),
        )(x.astype(jnp.float32))
        return logits, value.squeeze(-1)
