"""Partition-spec rules for train state pytrees (SURVEY.md §2.3).

Regex-over-parameter-path rules (the standard JAX "match partition rules"
pattern) mapped onto our (dp, tp) mesh:

  * env state, rollout batches, replay buffers: leading axis on ``dp``.
  * Dense kernels flagged by ``nn.with_partitioning`` in the networks carry
    their own ("tp",) metadata — honored via flax's logical partitioning.
  * everything else (small conv kernels, biases, opt scalars): replicated.

At default model sizes tp=1 and every param replicates; the rules exist so
the same program scales when tp>1.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blockpuzzle_tpu.dist.mesh import ENV_AXIS

# (regex over '/'-joined param path, PartitionSpec) — first match wins.
# NOTE: kernels flagged by nn.with_partitioning flatten as
# ".../kernel/value" (flax boxes them in Partitioned), so rules must not
# anchor on "kernel$".
PARAM_RULES = [
    # column-parallel hidden projection: (in, hidden) -> shard hidden
    (r"Torso_0/hidden_proj/kernel", P(None, "tp")),
    # column-parallel mlp-torso input matmul: (cells, width) -> shard width
    (r"Torso_0/mlp_0/kernel", P(None, "tp")),
    # row-parallel output heads: (hidden, out) -> shard hidden
    # (MXUDense = bf16-operand/f32-accumulate dense, learn/networks.py).
    # \d+ because flax auto-numbers instances: the dueling QNetwork builds
    # MXUDense_0 (value) AND MXUDense_1 (advantage), and anchoring on _0
    # silently replicated the advantage kernel at tp>1 (ADVICE r3).
    (r"MXUDense_\d+/kernel", P("tp", None)),
    (r".*", P()),
]


def param_spec(params: Any) -> Any:
    """Pytree of PartitionSpec for a flax param tree, via PARAM_RULES."""
    flat = traverse_util.flatten_dict(params, sep="/")
    specs = {}
    for path, leaf in flat.items():
        # nn.with_partitioning boxes kernels in flax Partitioned (no .ndim);
        # look through the box or every tp-flagged leaf silently gets P()
        leaf = getattr(leaf, "value", leaf)
        spec = P()
        if hasattr(leaf, "ndim") and leaf.ndim > 1:
            for rule, s in PARAM_RULES:
                if re.search(rule, path):
                    spec = s
                    break
        specs[path] = spec
    return traverse_util.unflatten_dict(specs, sep="/")


def batched_spec(pytree: Any) -> Any:
    """PartitionSpec pytree sharding every non-scalar leaf's axis 0 on dp."""

    def leaf_spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return P(ENV_AXIS)
        return P()

    return jax.tree.map(leaf_spec, pytree)


def train_state_spec(train_state: Any, params_field: str = "params") -> Any:
    """Sharding spec for a PPO/DQN TrainState-like pytree.

    params + opt_state follow PARAM_RULES (they mirror the param tree);
    env_state / obs / replay shard on dp; scalars and keys replicate.
    """

    def spec_for(path_parts, leaf):
        path = "/".join(str(p) for p in path_parts)
        if path.startswith(("params", "opt_state", "target_params")):
            if hasattr(leaf, "ndim") and leaf.ndim > 1:
                for rule, s in PARAM_RULES:
                    if re.search(rule, path):
                        return s
            return P()
        if path.startswith(("key", "update_count", "iter_count", "grad_count")):
            return P()
        if path.endswith(("cursor", "filled")):
            return P()
        if path.startswith("pending"):
            # DQN n-step window: (n-1, N, ...) — env axis is AXIS 1 (time
            # window leads); the (n-1,) validity vector replicates
            if hasattr(leaf, "ndim") and leaf.ndim >= 2:
                return P(None, ENV_AXIS)
            return P()
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return P(ENV_AXIS)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(train_state)[0]
    treedef = jax.tree_util.tree_structure(train_state)
    specs = []
    for keypath, leaf in flat:
        parts = []
        for k in keypath:
            if hasattr(k, "name"):
                parts.append(k.name)
            elif hasattr(k, "key"):
                parts.append(k.key)
            else:
                parts.append(str(k))
        specs.append(spec_for(parts, leaf))
    return jax.tree_util.tree_unflatten(treedef, specs)


def to_named(mesh: Mesh, spec_tree: Any) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )
