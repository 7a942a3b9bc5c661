"""PyTorch checkpoint importer: reference .pth -> flax variable trees.

Handles the reference's key-prefix conventions (SURVEY.md §5.4):
``module.`` (DDP), ``MAE_encoder.`` / ``base_model.`` strips
(``models/Point_MAE.py:511-543``, ``main_finetune.py:297-324``) and both ckpt
dict layouts ({'base_model': ...} and {'state_dict'/'model'/...}).

Weight-layout rules:
  torch Linear  (out, in)      -> flax Dense kernel (in, out)       [transpose]
  torch Conv1d  (out, in, 1)   -> flax Dense kernel (in, out)       [squeeze+T]
  torch LN/BN   weight/bias    -> flax scale/bias
  torch BN running_mean/var    -> flax batch_stats mean/var
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

# torch module path -> (flax path, kind). Paths are relative to the model
# root after prefix stripping. {i} expands per block index.
_COMMON_ENCODER = {
    # mini-PointNet patch embed (models/Point_MAE.py:16-47)
    "encoder.first_conv.0": ("encoder/conv1", "conv"),
    "encoder.first_conv.1": ("encoder/bn1", "bn"),
    "encoder.first_conv.3": ("encoder/conv2", "conv"),
    "encoder.second_conv.0": ("encoder/conv3", "conv"),
    "encoder.second_conv.1": ("encoder/bn2", "bn"),
    "encoder.second_conv.3": ("encoder/conv4", "conv"),
    # pos embed MLP
    "pos_embed.0": ("pos_embed/fc1", "linear"),
    "pos_embed.2": ("pos_embed/fc2", "linear"),
    # transformer blocks (models/Point_MAE.py:128-165)
    "blocks.blocks.{i}.norm1": ("blocks/block{i}/norm1", "ln"),
    "blocks.blocks.{i}.norm2": ("blocks/block{i}/norm2", "ln"),
    "blocks.blocks.{i}.attn.qkv": ("blocks/block{i}/attn/qkv", "linear"),
    "blocks.blocks.{i}.attn.proj": ("blocks/block{i}/attn/proj", "linear"),
    "blocks.blocks.{i}.mlp.fc1": ("blocks/block{i}/mlp/fc1", "linear"),
    "blocks.blocks.{i}.mlp.fc2": ("blocks/block{i}/mlp/fc2", "linear"),
    "norm": ("norm", "ln"),
    "norm_p": ("norm", "ln"),
}

POINT_TRANSFORMER_MAP = dict(_COMMON_ENCODER)
POINT_TRANSFORMER_MAP.update(
    {
        "cls_head_finetune.0": ("cls_head_finetune/fc1", "linear"),
        "cls_head_finetune.1": ("cls_head_finetune/bn1", "bn"),
        "cls_head_finetune.4": ("cls_head_finetune/fc2", "linear"),
        "cls_head_finetune.5": ("cls_head_finetune/bn2", "bn"),
        "cls_head_finetune.8": ("cls_head_finetune/fc3", "linear"),
    }
)

POINT_MAE_MAP = {
    "MAE_encoder." + k: ("MAE_encoder/" + v, kind) for k, (v, kind) in _COMMON_ENCODER.items()
}
POINT_MAE_MAP.update(
    {
        "decoder_pos_embed.0": ("decoder_pos_embed/fc1", "linear"),
        "decoder_pos_embed.2": ("decoder_pos_embed/fc2", "linear"),
        "MAE_decoder.blocks.{i}.norm1": ("MAE_decoder/block{i}/norm1", "ln"),
        "MAE_decoder.blocks.{i}.norm2": ("MAE_decoder/block{i}/norm2", "ln"),
        "MAE_decoder.blocks.{i}.attn.qkv": ("MAE_decoder/block{i}/attn/qkv", "linear"),
        "MAE_decoder.blocks.{i}.attn.proj": ("MAE_decoder/block{i}/attn/proj", "linear"),
        "MAE_decoder.blocks.{i}.mlp.fc1": ("MAE_decoder/block{i}/mlp/fc1", "linear"),
        "MAE_decoder.blocks.{i}.mlp.fc2": ("MAE_decoder/block{i}/mlp/fc2", "linear"),
        "MAE_decoder.norm": ("MAE_decoder/norm", "ln"),
        "increase_dim.0": ("increase_dim", "conv"),
    }
)
# Export-direction disambiguation: the inverted table is last-wins per flax
# path. The teacher's encoder norm is ``MAE_encoder.norm``
# (models/Point_MAE.py:252) while PointTransformer (:482) and the GM3D student
# MaskTransformer (...feature_besed.py:1356) call theirs ``norm_p``; re-insert
# the right torch key last so exports round-trip into each torch model.
POINT_MAE_MAP["MAE_encoder.norm"] = POINT_MAE_MAP.pop("MAE_encoder.norm")

# GM3D student (``MaskedAutoencoderViT``, ...feature_besed.py:849-937):
# encoder + dual decoders + two mask tokens + feature/coordinate heads.
GM3D_STUDENT_MAP = {
    "MAE_encoder." + k: ("MAE_encoder/" + v, kind) for k, (v, kind) in _COMMON_ENCODER.items()
}
GM3D_STUDENT_MAP.update(
    {
        "decoder_pos_embed.0": ("decoder_pos_embed/fc1", "linear"),
        "decoder_pos_embed.2": ("decoder_pos_embed/fc2", "linear"),
        # feature head ``increase_dim_2`` (:912-918)
        "increase_dim_2.0": ("head_fc1", "conv"),
        "increase_dim_2.1": ("head_bn", "bn"),
        "increase_dim_2.3": ("head_fc2", "conv"),
        # coordinate head (:920-927)
        "increase_dim_just_network_without_feature.0": ("coord_head", "conv"),
    }
)
for _dec in ("MAE_decoder", "MAE_decoder_loss_pred"):
    GM3D_STUDENT_MAP.update(
        {
            f"{_dec}.blocks.{{i}}.norm1": (f"{_dec}/block{{i}}/norm1", "ln"),
            f"{_dec}.blocks.{{i}}.norm2": (f"{_dec}/block{{i}}/norm2", "ln"),
            f"{_dec}.blocks.{{i}}.attn.qkv": (f"{_dec}/block{{i}}/attn/qkv", "linear"),
            f"{_dec}.blocks.{{i}}.attn.proj": (f"{_dec}/block{{i}}/attn/proj", "linear"),
            f"{_dec}.blocks.{{i}}.mlp.fc1": (f"{_dec}/block{{i}}/mlp/fc1", "linear"),
            f"{_dec}.blocks.{{i}}.mlp.fc2": (f"{_dec}/block{{i}}/mlp/fc2", "linear"),
            f"{_dec}.norm": (f"{_dec}/norm", "ln"),
        }
    )
# last-wins for export: the student's encoder norm is ``norm_p``
GM3D_STUDENT_MAP["MAE_encoder.norm_p"] = GM3D_STUDENT_MAP.pop("MAE_encoder.norm_p")

# Older GM3D student variant (``models_mae_learn_loss.py:30-846``, driven by
# ``main_pretrain_multi_gpu.py``/``engine_pretrain.py``): encoder-INLINE
# design — the point-cloud encoder lives flat at the module root
# (``encoder`` / ``pos_embed`` / ``blocks`` / ``norm_p``) instead of under a
# ``MAE_encoder`` submodule, the encoder's ``pos_embed`` doubles as the
# decoder pos embed (no ``decoder_pos_embed``), and there is no
# ``mask_token_loss_pred`` (both decoders share ``mask_token``). Maps onto
# ``GM3DStudent(mode='usual', shared_pos_embed=True)`` +
# ``shared_learnable_tokens``.
GM3D_MULTIGPU_MAP = {
    k: ("MAE_encoder/" + v, kind) for k, (v, kind) in _COMMON_ENCODER.items()
}
GM3D_MULTIGPU_MAP.update(
    {
        "increase_dim_2.0": ("head_fc1", "conv"),
        "increase_dim_2.1": ("head_bn", "bn"),
        "increase_dim_2.3": ("head_fc2", "conv"),
        "increase_dim_just_network_without_feature.0": ("coord_head", "conv"),
    }
)
for _dec in ("MAE_decoder", "MAE_decoder_loss_pred"):
    GM3D_MULTIGPU_MAP.update(
        {
            f"{_dec}.blocks.{{i}}.norm1": (f"{_dec}/block{{i}}/norm1", "ln"),
            f"{_dec}.blocks.{{i}}.norm2": (f"{_dec}/block{{i}}/norm2", "ln"),
            f"{_dec}.blocks.{{i}}.attn.qkv": (f"{_dec}/block{{i}}/attn/qkv", "linear"),
            f"{_dec}.blocks.{{i}}.attn.proj": (f"{_dec}/block{{i}}/attn/proj", "linear"),
            f"{_dec}.blocks.{{i}}.mlp.fc1": (f"{_dec}/block{{i}}/mlp/fc1", "linear"),
            f"{_dec}.blocks.{{i}}.mlp.fc2": (f"{_dec}/block{{i}}/mlp/fc2", "linear"),
            f"{_dec}.norm": (f"{_dec}/norm", "ln"),
        }
    )
# export direction: the older model's used encoder norm is ``norm_p`` (its
# bare ``self.norm`` was commented out, ``models_mae_learn_loss.py:67``)
GM3D_MULTIGPU_MAP["norm_p"] = GM3D_MULTIGPU_MAP.pop("norm_p")


def strip_prefixes(key: str) -> str:
    """``module.`` / ``base_model.`` strip (NOT ``MAE_encoder.`` — that one is
    meaningful for pretrain models and only stripped when importing into the
    bare PointTransformer, handled by the caller)."""
    for prefix in ("module.", "base_model."):
        if key.startswith(prefix):
            key = key[len(prefix):]
    return key


def torch_key_to_flax(key: str, table: Dict[str, Tuple[str, str]]) -> Optional[Tuple[str, str, str]]:
    """Map a torch state-dict key to (flax_path, param_name, kind)."""
    key = strip_prefixes(key)
    if key in ("cls_token", "cls_pos", "mask_token", "mask_token_loss_pred"):
        return (key, key, "param3d")
    m = re.match(r"^(.*)\.(weight|bias|running_mean|running_var|num_batches_tracked)$", key)
    if not m:
        return None
    module_path, leaf = m.group(1), m.group(2)
    if leaf == "num_batches_tracked":
        return None
    generic = re.sub(r"\.(\d+)\.", lambda mm: ".{i}.", module_path, count=0)
    # try direct, then block-index template
    if module_path in table:
        flax_path, kind = table[module_path]
    else:
        tm = re.match(r"^(.*?)(\d+)(\..*)$", module_path)
        found = None
        if tm:
            for pat, (fp, kind_) in table.items():
                if "{i}" in pat:
                    idx_match = re.match("^" + re.escape(pat).replace(r"\{i\}", r"(\d+)") + "$", module_path)
                    if idx_match:
                        found = (fp.replace("{i}", idx_match.group(1)), kind_)
                        break
        if found is None:
            return None
        flax_path, kind = found
    del generic
    return flax_path, leaf, kind


def _convert(leaf: str, kind: str, value: np.ndarray):
    if kind in ("linear", "conv") and leaf == "weight":
        w = value
        if kind == "conv":
            w = w[..., 0]  # (out, in, 1) -> (out, in)
        return "kernel", np.ascontiguousarray(w.T)
    if kind in ("linear", "conv") and leaf == "bias":
        return "bias", value
    if kind in ("ln", "bn") and leaf == "weight":
        return "scale", value
    if kind in ("ln", "bn") and leaf == "bias":
        return "bias", value
    if kind == "bn" and leaf == "running_mean":
        return ("batch_stats", "mean"), value
    if kind == "bn" and leaf == "running_var":
        return ("batch_stats", "var"), value
    if kind == "param3d":
        return leaf, value
    return None, None


def import_torch_checkpoint(
    state_dict: Dict[str, Any],
    table: Dict[str, Tuple[str, str]],
    strip_mae_encoder: bool = False,
) -> Dict[str, Any]:
    """Convert a torch state-dict (tensors or numpy) into nested flax
    variables {'params': ..., 'batch_stats': ...}.

    ``strip_mae_encoder=True`` reproduces the fine-tune surgery that loads a
    pretrain encoder into PointTransformer (``models/Point_MAE.py:518-524``).
    """
    variables: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    unmatched = []
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        k = strip_prefixes(key)
        if strip_mae_encoder and k.startswith("MAE_encoder."):
            k = k[len("MAE_encoder."):]
        mapped = torch_key_to_flax(k, table)
        if mapped is None:
            unmatched.append(key)
            continue
        flax_path, leaf, kind = mapped
        name, conv = _convert(leaf, kind, arr)
        if name is None:
            unmatched.append(key)
            continue
        if isinstance(name, tuple):  # batch_stats
            coll, name = name
        else:
            coll = "params"
        node = variables[coll]
        parts = flax_path.split("/")
        for p in parts[:-1] if kind == "param3d" and len(parts) == 1 else parts:
            node = node.setdefault(p, {})
        if kind == "param3d":
            variables[coll][flax_path] = conv
        else:
            node[name] = conv
    if not variables["batch_stats"]:
        variables.pop("batch_stats")
    variables["_unmatched"] = unmatched
    return variables


def export_torch_checkpoint(
    variables: Dict[str, Any], table: Dict[str, Tuple[str, str]]
) -> Dict[str, Any]:
    """Inverse of :func:`import_torch_checkpoint`: flax variables -> a torch
    state dict (numpy values) using the same mapping table, so checkpoints
    trained here can be consumed by reference-style torch code."""
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, p))
            else:
                out[p] = np.asarray(v)
        return out

    flat_p = flatten(params)
    flat_bs = flatten(batch_stats)

    # invert the table: flax path -> (torch module path, kind)
    inv = {}
    for torch_path, (flax_path, kind) in table.items():
        inv[flax_path] = (torch_path, kind)

    def lookup(flax_path):
        if flax_path in inv:
            return inv[flax_path]
        m = re.match(r"^(.*?)(\d+)(.*)$", flax_path)
        # try block-index templates
        for fp, (tp, kind) in [(fp, v) for fp, v in inv.items() if "{i}" in fp]:
            mm = re.match("^" + re.escape(fp).replace(r"\{i\}", r"(\d+)") + "$", flax_path)
            if mm:
                return tp.replace("{i}", mm.group(1)), kind
        del m
        return None

    sd: Dict[str, Any] = {}
    for path, value in flat_p.items():
        parts = path.rsplit("/", 1)
        if len(parts) == 1 or parts[0] == "":
            # top-level param3d tokens
            sd[path] = value
            continue
        module, leaf = parts
        hit = lookup(module)
        if hit is None:
            continue
        torch_path, kind = hit
        if leaf == "kernel":
            w = value.T
            if kind == "conv":
                w = w[..., None]  # (out, in) -> (out, in, 1)
            sd[f"{torch_path}.weight"] = np.ascontiguousarray(w)
        elif leaf == "scale":
            sd[f"{torch_path}.weight"] = value
        elif leaf == "bias":
            sd[f"{torch_path}.bias"] = value
    for path, value in flat_bs.items():
        module, leaf = path.rsplit("/", 1)
        hit = lookup(module)
        if hit is None:
            continue
        torch_path, _ = hit
        name = "running_mean" if leaf == "mean" else "running_var"
        sd[f"{torch_path}.{name}"] = value
    return sd


def load_torch_file(path: str) -> Dict[str, Any]:
    """Load a reference .pth and pull out the model weights, trying the known
    layouts in order (``base_model``, ``state_dict``, ``model``, raw)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("base_model", "state_dict", "model", "ema_state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            return ckpt[key]
    return ckpt


def import_clip_visual(state_dict: Dict[str, Any]):
    """CLIP checkpoint -> (tower_config, flax params) for CLIPVisionTower.

    Mirrors the reference's ``build_model`` config inference
    (``models_clip.py:406-420``: patch from conv1, grid from the positional
    embedding, heads = width // 64) and accepts either a full CLIP state dict
    (``visual.*`` keys, the ``--clip_path`` file) or a bare visual tower.
    """
    sd = {}
    for k, v in state_dict.items():
        k = strip_prefixes(k)
        if k.startswith("visual."):
            sd[k[len("visual."):]] = v
        elif not ("transformer" in k and "resblocks" in k and "visual" not in k):
            sd.setdefault(k, v)

    def arr(key):
        return np.asarray(sd[key].float().cpu() if hasattr(sd[key], "float") else sd[key])

    conv1 = arr("conv1.weight")  # (width, 3, P, P)
    width, _, patch, _ = conv1.shape
    grid2 = arr("positional_embedding").shape[0] - 1
    layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")})
    out_dim = arr("proj").shape[1]
    cfg = dict(
        input_resolution=int(round(grid2**0.5)) * patch,
        patch_size=patch,
        width=width,
        layers=layers,
        heads=width // 64,
        output_dim=out_dim,
    )

    params = {
        "conv1": {"kernel": np.ascontiguousarray(conv1.transpose(2, 3, 1, 0))},
        "class_embedding": arr("class_embedding"),
        "positional_embedding": arr("positional_embedding"),
        "proj": arr("proj"),
        "ln_pre": {"scale": arr("ln_pre.weight"), "bias": arr("ln_pre.bias")},
        "ln_post": {"scale": arr("ln_post.weight"), "bias": arr("ln_post.bias")},
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}."
        params[f"block{i}"] = {
            "ln_1": {"scale": arr(p + "ln_1.weight"), "bias": arr(p + "ln_1.bias")},
            "ln_2": {"scale": arr(p + "ln_2.weight"), "bias": arr(p + "ln_2.bias")},
            "attn": {
                "qkv": {
                    "kernel": np.ascontiguousarray(arr(p + "attn.in_proj_weight").T),
                    "bias": arr(p + "attn.in_proj_bias"),
                },
                "out": {
                    "kernel": np.ascontiguousarray(arr(p + "attn.out_proj.weight").T),
                    "bias": arr(p + "attn.out_proj.bias"),
                },
            },
            "c_fc": {
                "kernel": np.ascontiguousarray(arr(p + "mlp.c_fc.weight").T),
                "bias": arr(p + "mlp.c_fc.bias"),
            },
            "c_proj": {
                "kernel": np.ascontiguousarray(arr(p + "mlp.c_proj.weight").T),
                "bias": arr(p + "mlp.c_proj.bias"),
            },
        }
    return cfg, {"params": params}
