"""Device mesh + sharding utilities — the genuinely new TPU subsystem.

The reference is single-device PyTorch with no distributed code at all
(reference survey §2.13: no DDP/NCCL/process groups anywhere in src/).
Here parallelism comes from *sharding, not code*: a `jax.sharding.Mesh`
with axes ``('data', 'model')``; batches are sharded along ``data``
(pure DP with gradient psum over ICI inserted by XLA), while ``model``
carries tensor-parallel shards of wide MLPs/attention heads and the
expert dimension of MoE layers (expert parallelism).

Param placement is rule-based (t5x-style): a list of
``(path-regex, PartitionSpec)`` pairs matched against the flattened
parameter path. Anything unmatched is replicated.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vivqa_tpu.config.base import ConfigBase

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig(ConfigBase):
    """Mesh shape. ``data_axis=-1`` means "all remaining devices"."""
    data_axis: int = -1
    model_axis: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model_axis)
        data = self.data_axis
        if data in (-1, 0):
            assert n_devices % model == 0, (
                f"{n_devices} devices not divisible by model_axis={model}")
            data = n_devices // model
        assert data * model == n_devices, (
            f"mesh {data}x{model} != {n_devices} devices")
        return data, model


def create_mesh(config: MeshConfig | None = None,
                devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a 2-D ('data', 'model') mesh over the available devices."""
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    data, model = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches are sharded on the leading (batch) dimension over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Rule-based parameter partitioning
# ---------------------------------------------------------------------------
# Path regexes are matched (re.search) against '/'-joined parameter paths,
# e.g. "decoder/layers_3/mlp/wi/kernel". First match wins.
#
# Tensor-parallel layout convention (Megatron-style):
#   - MLP up-projection kernel  (d_model, d_ff):      shard d_ff    -> P(None, 'model')
#   - MLP down-projection kernel (d_ff, d_model):     shard d_ff    -> P('model', None)
#   - attention qkv kernels     (d_model, d_model):   shard heads   -> P(None, 'model')
#   - attention out kernel      (d_model, d_model):   shard input   -> P('model', None)
#   - MoE stacked expert weights (E, ...):            shard experts -> P('model', ...)
DEFAULT_PARTITION_RULES: tuple[tuple[str, P], ...] = (
    # MoE experts: leading expert axis sharded over 'model' (expert
    # parallel). Matches both nested ("moe/experts/w_in") and inlined
    # ("moe/experts_w_in") stacked-weight layouts.
    (r"experts?[/_].*w_in", P(MODEL_AXIS, None, None)),
    (r"experts?[/_].*w_out", P(MODEL_AXIS, None, None)),
    (r"experts?[/_].*w_gate", P(MODEL_AXIS, None, None)),
    (r"experts?[/_].*(bias_in|bias_out|bias_gate)", P(MODEL_AXIS, None)),
    # Attention projections
    (r"(self_attn|cross_attn|attention|attn)/(query|key|value|q_proj|k_proj|v_proj)/kernel", P(None, MODEL_AXIS)),
    (r"(self_attn|cross_attn|attention|attn)/(out|o_proj|out_proj)/kernel", P(MODEL_AXIS, None)),
    # Transformer MLPs
    (r"(mlp|ffn|feed_forward)/(wi|fc1|up|gate)/kernel", P(None, MODEL_AXIS)),
    (r"(mlp|ffn|feed_forward)/(wo|fc2|down)/kernel", P(MODEL_AXIS, None)),
    # Embeddings: shard vocab dim over model axis
    (r"(token_embed|embedding|shared_embedding)/embedding", P(MODEL_AXIS, None)),
)


def _spec_fits(spec: P, shape: tuple[int, ...], mesh: Mesh) -> bool:
    """A PartitionSpec only applies if rank matches and every sharded dim
    divides evenly by its mesh axis size."""
    if len(spec) > len(shape):
        return False
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        size = mesh.shape[axis]
        if dim % size != 0:
            return False
    return True


def spec_for_path(path: str, shape: tuple[int, ...], mesh: Mesh,
                  rules: Sequence[tuple[str, P]] = DEFAULT_PARTITION_RULES) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            if _spec_fits(spec, shape, mesh):
                return spec
            return P()  # rule matched but doesn't divide — replicate
    return P()


def _flatten_paths(tree: Any) -> list[tuple[tuple, str]]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for keypath, leaf in flat:
        parts = []
        for k in keypath:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        out.append(("/".join(parts), leaf))
    return out


def shard_pytree_by_rules(tree: Any, mesh: Mesh,
                          rules: Sequence[tuple[str, P]] = DEFAULT_PARTITION_RULES):
    """Return a pytree of NamedShardings matching ``tree``'s structure."""
    paths = _flatten_paths(tree)
    specs = []
    for path, leaf in paths:
        shape = getattr(leaf, "shape", ())
        specs.append(NamedSharding(mesh, spec_for_path(path, tuple(shape), mesh, rules)))
    treedef = jax.tree_util.tree_structure(tree)
    return jax.tree_util.tree_unflatten(treedef, specs)


def logical_to_mesh(tree: Any, mesh: Mesh, rules=DEFAULT_PARTITION_RULES):
    """Place an existing host pytree onto the mesh according to the rules."""
    shardings = shard_pytree_by_rules(tree, mesh, rules)
    return jax.device_put(tree, shardings)
