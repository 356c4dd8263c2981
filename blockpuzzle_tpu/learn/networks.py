"""Policy/value networks for the on-device learners (SURVEY.md §7.1 PR4).

Small CNN torso over the board + an embedding of the piece queue, with policy
and value heads.  The reference has no learner (it is an environment; the
learner is a BASELINE target capability, configs 4-5), so this architecture is
free to be TPU-idiomatic:

  * bfloat16 activations (MXU-native), float32 params and logits.
  * Dense layers carry named partitioning metadata on a spare "tp" mesh axis
    (Megatron column/row split) so oversized-model experiments can shard them
    via ``blockpuzzle_tpu.dist`` rules (SURVEY.md §2.3 "Tensor parallelism");
    at the default sizes they simply replicate.
  * Illegal actions are masked to a large negative logit — masking lives in
    the network so every consumer (PPO, DQN, eval) gets it fused.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from blockpuzzle_tpu.config import EnvConfig

NEG_INF = -1e9


class Torso(nn.Module):
    """Shared representation: board features ⊕ queue features.

    ``arch="conv"`` (default): small CNN over the board.  ``arch="mlp"``:
    flatten the board into a single wide matmul — on TPU the 10×10 spatial
    convs tile the MXU poorly, so the MLP torso trades parameter count for
    pure-matmul throughput (selected per-experiment; both are parity-free
    learner internals).

    ``queue_mode`` selects the hand representation:
      * "embed": learned id embedding (``nn.Embed``) concatenated onto the
        board features.  The embed lookup is a (small) gather.
      * "planes": spatialize the hand via ``one_hot(queue) @ plane_table``
        (``rules.piece_plane_table`` — MXU matmul, gather-free) and feed the
        planes as EXTRA INPUT CHANNELS alongside the board (conv arch) or as
        extra flattened inputs (mlp arch).  The policy then sees board and
        hand in the same spatial frame — the network-internal analogue of
        the ``EnvConfig.obs_planes`` observation variant.
    """

    cfg: EnvConfig
    num_pieces: int
    channels: Tuple[int, ...] = (32, 64)
    hidden: int = 256
    embed_dim: int = 16
    arch: str = "conv"
    mlp_width: int = 512
    queue_mode: str = "embed"

    @nn.compact
    def __call__(self, board: jax.Array, queue: jax.Array) -> jax.Array:
        if self.queue_mode == "planes":
            from blockpuzzle_tpu import rules

            # (P, H*W) host constant; one-hot of the empty sentinel is the
            # zero vector, so empty slots become all-zero planes
            table = jnp.asarray(
                rules.piece_plane_table(self.cfg), dtype=jnp.bfloat16
            )
            onehot = (
                queue[..., None]
                == jnp.arange(self.num_pieces, dtype=queue.dtype)
            ).astype(jnp.bfloat16)                      # (..., S, P)
            planes = jax.lax.dot_general(
                onehot, table,
                (((onehot.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )                                           # (..., S, H*W)
        elif self.queue_mode != "embed":
            raise ValueError(f"unknown queue_mode {self.queue_mode!r}")

        h, w = self.cfg.height, self.cfg.width
        if self.arch == "mlp":
            x = board.astype(jnp.bfloat16).reshape(*board.shape[:-2], -1)
            if self.queue_mode == "planes":
                flat_planes = planes.reshape(*planes.shape[:-2], -1)
                x = jnp.concatenate([x, flat_planes], axis=-1)
            # column-parallel like hidden_proj: the (cells, width) kernel is
            # the mlp torso's dominant matmul — without the annotation it
            # silently replicates under tp>1 (GSPMD all-gathers the sharded
            # activation before hidden_proj; correct either way)
            x = nn.Dense(
                self.mlp_width,
                dtype=jnp.bfloat16,
                kernel_init=nn.with_partitioning(
                    nn.initializers.he_normal(), (None, "tp")
                ),
                name="mlp_0",
            )(x)
            x = nn.relu(x)
        elif self.arch == "conv":
            # board (..., H, W) uint8 -> (..., H, W, 1) bf16
            x = board.astype(jnp.bfloat16)[..., None]
            if self.queue_mode == "planes":
                # (..., S, H*W) -> (..., H, W, S) input channels
                s = planes.shape[-2]
                chan = jnp.moveaxis(
                    planes.reshape(*planes.shape[:-2], s, h, w), -3, -1
                )
                x = jnp.concatenate([x, chan], axis=-1)
            for ch in self.channels:
                x = nn.Conv(
                    ch,
                    (3, 3),
                    padding="SAME",
                    dtype=jnp.bfloat16,
                    kernel_init=nn.initializers.he_normal(),
                )(x)
                x = nn.relu(x)
            x = x.reshape(*x.shape[:-3], -1)
        else:
            raise ValueError(f"unknown torso arch {self.arch!r}")

        if self.queue_mode == "embed":
            # queue (..., S) int32 -> (..., S * embed_dim); empty sentinel
            # gets its own embedding row (num_pieces + 1 rows total).
            emb = nn.Embed(
                self.num_pieces + 1, self.embed_dim, dtype=jnp.bfloat16
            )(queue)
            emb = emb.reshape(*emb.shape[:-2], -1)
            x = jnp.concatenate([x, emb], axis=-1)
        # column-parallel candidate: (in, hidden) partitioned (None, "tp");
        # explicit name keeps the tp partition rules arch-independent
        x = nn.Dense(
            self.hidden,
            dtype=jnp.bfloat16,
            kernel_init=nn.with_partitioning(
                nn.initializers.he_normal(), (None, "tp")
            ),
            name="hidden_proj",
        )(x)
        return nn.relu(x)


class MXUDense(nn.Module):
    """Dense with bf16 MXU inputs and float32 accumulation.

    ``nn.Dense(dtype=f32)`` runs the matmul at the TPU's (slow) emulated-f32
    rate; ``dtype=bf16`` runs at full MXU rate but rounds the OUTPUT to bf16
    (~3 significant digits — too coarse for PPO logits, whose clipped ratios
    are exp of logit differences).  The TPU recipe is bf16 operands +
    ``preferred_element_type=f32``: full MXU rate, f32 accumulation/output.
    """

    features: int
    kernel_partition: Tuple[Optional[str], ...] = (None, None)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.with_partitioning(
                nn.initializers.lecun_normal(), self.kernel_partition
            ),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        y = jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            kernel.astype(jnp.bfloat16),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y + bias


class ActorCritic(nn.Module):
    """Masked-policy + value network (PPO / A2C / eval)."""

    cfg: EnvConfig
    num_pieces: int
    channels: Tuple[int, ...] = (32, 64)
    hidden: int = 256
    arch: str = "conv"
    mlp_width: int = 512
    queue_mode: str = "embed"

    @nn.compact
    def __call__(
        self, board: jax.Array, queue: jax.Array, action_mask: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (masked_logits (..., A) f32, value (...,) f32)."""
        h = Torso(
            self.cfg, self.num_pieces, self.channels, self.hidden,
            arch=self.arch, mlp_width=self.mlp_width,
            queue_mode=self.queue_mode,
        )(board, queue)
        # row-parallel candidate: (hidden, A) partitioned ("tp", None)
        logits = MXUDense(
            self.cfg.num_actions(), kernel_partition=("tp", None)
        )(h)
        logits = jnp.where(action_mask, logits, NEG_INF)
        value = MXUDense(1)(h)
        return logits, value[..., 0]


class QNetwork(nn.Module):
    """Masked Q-network (DQN): illegal actions pinned to NEG_INF.

    ``dueling=True`` splits the head into state-value + advantage streams
    (Wang et al. 2016), with the advantage mean taken over LEGAL actions
    only — with masking, centering on illegal slots would let unused
    logits shift the legal Q-values.  Both streams are MXU-rate matmuls;
    the combine is fused elementwise work.
    """

    cfg: EnvConfig
    num_pieces: int
    channels: Tuple[int, ...] = (32, 64)
    hidden: int = 256
    arch: str = "conv"
    mlp_width: int = 512
    queue_mode: str = "embed"
    dueling: bool = False

    @nn.compact
    def __call__(
        self, board: jax.Array, queue: jax.Array, action_mask: jax.Array
    ) -> jax.Array:
        h = Torso(
            self.cfg, self.num_pieces, self.channels, self.hidden,
            arch=self.arch, mlp_width=self.mlp_width,
            queue_mode=self.queue_mode,
        )(board, queue)
        if self.dueling:
            v = MXUDense(1, kernel_partition=("tp", None))(h)      # (..., 1)
            adv = MXUDense(
                self.cfg.num_actions(), kernel_partition=("tp", None)
            )(h)
            legal = action_mask.astype(jnp.float32)
            n_legal = jnp.maximum(legal.sum(axis=-1, keepdims=True), 1.0)
            adv_mean = (adv * legal).sum(axis=-1, keepdims=True) / n_legal
            q = v + adv - adv_mean
        else:
            q = MXUDense(
                self.cfg.num_actions(), kernel_partition=("tp", None)
            )(h)
        return jnp.where(action_mask, q, NEG_INF)


def reroot_key(key: jax.Array, impl: str = "rbg") -> jax.Array:
    """Re-root a PRNG key under ``impl`` (shared by PPO/DQN init).

    ``rbg`` is the fast path for per-step sampling (~25% cheaper end-to-end
    than threefry on v5e — docs/ARCHITECTURE.md), but JAX documents its
    output as unstable across different shardings of the same computation;
    pass ``impl="threefry2x32"`` where sharded-vs-unsharded runs must agree
    bit-for-bit (e.g. the multichip dryrun's equivalence check).  Jitted:
    eager key ops dispatch tiny remote compiles on the tunnel platform.
    """
    return jax.jit(
        lambda k: jax.random.key(
            jax.random.bits(k, (), dtype=jnp.uint32), impl=impl
        )
    )(key)


def masked_categorical(key: jax.Array, logits: jax.Array) -> jax.Array:
    """Sample actions from masked logits."""
    return jax.random.categorical(key, logits, axis=-1)


def select_along_last(values: jax.Array, index: jax.Array) -> jax.Array:
    """``values[..., index]`` without a gather.

    ``jnp.take_along_axis`` lowers to a scalar-core gather on TPU
    (~100-130 us per 16K rows — see docs/ARCHITECTURE.md); the hot-path rule
    (CLAUDE.md) is one-hot select instead, which XLA fuses into the
    surrounding elementwise work on the VPU.
    """
    iota = jax.lax.broadcasted_iota(
        index.dtype, values.shape, len(values.shape) - 1
    )
    return jnp.sum(
        jnp.where(iota == index[..., None], values, 0.0), axis=-1
    )


def log_prob(logits: jax.Array, action: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return select_along_last(logp, action)


def masked_entropy(logits: jax.Array) -> jax.Array:
    """Entropy of the masked distribution; NEG_INF slots contribute 0."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1)
