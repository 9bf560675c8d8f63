"""Device mesh + sharding rules.

The reference declares (but never exercises) HF TP plans
(configuration_qwen3_tts.py:354-367: q/k/v/gate/up colwise, o/down rowwise).
Here they become real: a `("dp", "tp")` jax.sharding.Mesh with NamedShardings
over the stacked-layer parameter pytree; XLA/GSPMD inserts the ICI
collectives.  DP shards the batch; TP shards attention heads and FFN.

Weights keep torch (out, in) layout, so:
  colwise  -> shard axis -2 (out features) over "tp"
  rowwise  -> shard axis -1 (in features) over "tp"
Stacked layer params have a leading layer axis (replicated).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    arr = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# Path-pattern -> PartitionSpec for the *prepared* talker param tree
# (prepare_talker_params layout).  Mirrors the reference TP plan.
_TALKER_RULES = [
    # talker rules anchored at the tree root so the code_predictor rules
    # below are reachable (re.search on an unanchored "layers/..." would
    # shadow them)
    (r"^layers/self_attn/qkv_proj/weight$", P(None, "tp", None)),
    (r"^layers/self_attn/o_proj/weight$", P(None, None, "tp")),
    (r"^layers/mlp/gate_up_proj/weight$", P(None, "tp", None)),
    (r"^layers/mlp/down_proj/weight$", P(None, None, "tp")),
    (r"codec_head$", P("tp", None)),           # colwise_rep -> shard vocab
    (r"codec_embedding$", P(None, None)),
    (r"text_embedding$", P(None, None)),
    (r"code_predictor/layers/self_attn/qkv_proj/weight$", P(None, "tp", None)),
    (r"code_predictor/layers/self_attn/o_proj/weight$", P(None, None, "tp")),
    (r"code_predictor/layers/mlp/gate_up_proj/weight$", P(None, "tp", None)),
    (r"code_predictor/layers/mlp/down_proj/weight$", P(None, None, "tp")),
    (r"code_predictor/lm_heads$", P(None, "tp", None)),
    (r"code_predictor/embeddings$", P(None, None, None)),
]


def _spec_for(path: str, rules) -> P:
    # int8-quantized leaves live one level below the weight: .../weight/q
    # carries the weight's spec, .../weight/s (per-output-row scales, last
    # weight axis dropped) carries the spec minus its last entry
    base, is_scale = path, False
    if path.endswith("/q"):
        base = path[:-2]
    elif path.endswith("/s"):
        base, is_scale = path[:-2], True
    for pat, spec in rules:
        if re.search(pat, base):
            return P(*tuple(spec)[:-1]) if is_scale else spec
    return P()  # replicate


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}/{k}" if prefix else k)
    else:
        yield prefix, tree


def talker_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a prepared talker param tree."""
    def assign(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: assign(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        if tree is None:
            return None
        return _spec_for(prefix, _TALKER_RULES)

    return assign(params)


def shard_talker_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a prepared talker param tree onto the mesh."""
    specs = talker_param_specs(params)

    def place(x, spec):
        if x is None:
            return None
        # guard: only shard axes divisible by the mesh axis size
        spec = _validate_spec(x, spec, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params, specs,
                                  is_leaf=lambda x: x is None)


def _validate_spec(x, spec: P, mesh: Mesh) -> P:
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    parts = []
    for dim, name in enumerate(spec):
        if name is None:
            parts.append(None)
            continue
        if x.shape[dim] % sizes.get(name, 1) != 0:
            parts.append(None)  # fall back to replication on this axis
        else:
            parts.append(name)
    return P(*parts)


def batch_spec() -> P:
    return P("dp")


def shard_slot_state(state, mesh: Mesh):
    """Place a serving SlotState onto the mesh with slots (and staging rows)
    sharded over "dp" — one continuous-batching engine spanning multiple
    chips, each holding its share of the slot KV cache.

    Cross-shard scheduling (free-slot argmax in the install loop, the packed
    aux concatenation) lowers to GSPMD collectives; decode itself stays
    per-shard local. Axes not divisible by the dp size fall back to
    replication (guarded per leaf).
    """
    # fields with a leading layer axis shard the SECOND dim (slots/rows);
    # everything else shards the first, except the replicated pad embedding
    layer_leading = {"staged_k", "staged_v", "staged_k_scale",
                     "staged_v_scale"}
    replicated = {"tts_pad"}

    def spec_for(name: str, x) -> P:
        if name in replicated:
            return P()
        if name == "cache":  # handled per sub-leaf below
            return None
        if name in layer_leading:
            return P(None, "dp")
        return P("dp")

    def place(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh,
                                               _validate_spec(x, spec, mesh)))

    out = {}
    for name in state._fields:
        x = getattr(state, name)
        if name == "cache":
            out[name] = type(x)(*[
                None if leaf is None else place(leaf, P(None, "dp"))
                for leaf in x])
        elif x is None:
            out[name] = None
        else:
            out[name] = place(x, spec_for(name, x))
    return type(state)(**out)
