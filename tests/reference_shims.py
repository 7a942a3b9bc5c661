"""Shims that let the ACTUAL reference torch code run on CPU.

``timm``, ``knn_cuda``, ``pointnet2_ops``, ``extensions.chamfer_dist`` and
``easydict`` are not installed in this image, and the CUDA extensions would
not run here anyway.  This module provides numerically faithful CPU
replacements with the exact interfaces the reference imports, so
``tests/test_reference_parity.py`` can execute the reference model code
ITSELF (``/root/reference/Point-MAE_SA3D``) — not a re-written oracle — and
compare it step-by-step against the rebuild with identical weights.

Interface notes (what each shim must reproduce):

- ``timm.models.vision_transformer.Block``: pre-norm ViT block,
  ``x + drop_path(attn(norm1(x)))`` then ``x + drop_path(mlp(norm2(x)))``,
  attention scale ``head_dim ** -0.5`` (``qk_scale`` None everywhere in the
  reference), exact (erf) GELU.  Parameter names must match timm
  (``attn.qkv``, ``attn.proj``, ``mlp.fc1``, ``mlp.fc2``) because checkpoint
  key layouts depend on them.
- ``knn_cuda.KNN(k, transpose_mode=True)``: called as ``knn(ref, query)`` with
  (B, N, 3) / (B, M, 3), returns (dist, idx) with idx (B, M, k), neighbours
  sorted by ascending distance.
- ``pointnet2_ops.pointnet2_utils.furthest_point_sample``: CUDA FPS semantics —
  start from point index 0, squared euclidean distances, argmax first-match.
- ``extensions.chamfer_dist``: the extension source is NOT shipped in the
  reference tree.  Its semantics are pinned per-point (``dist1 + dist2``,
  squared for L2), the only convention consistent with BOTH call sites:
  ``tools/runner_pretrain.py:143`` (``loss = loss.mean()`` — non-scalar
  return) and ``...feature_besed.py:996-997``
  (``.reshape(N, PP, -1).mean(-1)`` — per-point matrix).  This matches the
  rebuild's ``gm3d_tpu.ops.chamfer`` (see its module docstring).
"""

from __future__ import annotations

import importlib
import sys
import types

REFERENCE_ROOT = "/root/reference/Point-MAE_SA3D"

_installed = False


def _build_timm_shim():
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        """Stochastic depth; identity in eval mode (all parity runs are eval)."""

        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = float(drop_prob or 0.0)

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x * mask / keep

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, qk_scale=None,
                     attn_drop=0.0, proj_drop=0.0):
            super().__init__()
            self.num_heads = num_heads
            head_dim = dim // num_heads
            self.scale = qk_scale or head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = self.attn_drop(attn.softmax(dim=-1))
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj_drop(self.proj(x))

    class Block(nn.Module):
        def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                     qk_scale=None, drop=0.0, attn_drop=0.0, drop_path=0.0,
                     act_layer=nn.GELU, norm_layer=nn.LayerNorm, **kwargs):
            super().__init__()
            self.norm1 = norm_layer(dim)
            self.attn = Attention(dim, num_heads=num_heads, qkv_bias=qkv_bias,
                                  qk_scale=qk_scale, attn_drop=attn_drop,
                                  proj_drop=drop)
            self.drop_path = DropPath(drop_path) if drop_path > 0.0 else nn.Identity()
            self.norm2 = norm_layer(dim)
            self.mlp = Mlp(dim, int(dim * mlp_ratio), act_layer=act_layer, drop=drop)

        def forward(self, x):
            x = x + self.drop_path(self.attn(self.norm1(x)))
            x = x + self.drop_path(self.mlp(self.norm2(x)))
            return x

    class PatchEmbed(nn.Module):
        """Image patch embed — constructed by the reference's dead image-domain
        classes; never exercised by the point-cloud parity tests."""

        def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768):
            super().__init__()
            self.img_size = (img_size, img_size)
            self.patch_size = (patch_size, patch_size)
            self.num_patches = (img_size // patch_size) ** 2
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class VisionTransformer(nn.Module):
        """Image-ViT base subclassed by the reference's dead image-domain
        ``models_vit.py`` (imported at module level by main_knn/main_linprob)
        — never instantiated by the point-cloud parity tests."""

        def __init__(self, *a, **k):
            super().__init__()
            raise NotImplementedError("image ViT is out of scope")

    timm = types.ModuleType("timm")
    # main_knn.py:19 / main_linprob.py hard-assert the MAE-era pin
    timm.__version__ = "0.3.2"
    timm_models = types.ModuleType("timm.models")
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.PatchEmbed = PatchEmbed
    vit.Block = Block
    vit.DropPath = DropPath
    vit.Mlp = Mlp
    vit.Attention = Attention
    vit.VisionTransformer = VisionTransformer
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.Mlp = Mlp
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    timm.models = timm_models
    timm_models.vision_transformer = vit
    timm_models.layers = layers
    return {
        "timm": timm,
        "timm.models": timm_models,
        "timm.models.vision_transformer": vit,
        "timm.models.layers": layers,
    }


def _build_cuda_ext_shims():
    import torch
    import torch.nn as nn

    class KNN(nn.Module):
        def __init__(self, k, transpose_mode=True):
            super().__init__()
            assert transpose_mode, "reference always uses transpose_mode=True"
            self.k = k

        def forward(self, ref, query):
            # ref (B, N, D), query (B, M, D) -> dist/idx (B, M, k)
            d = torch.cdist(query.float(), ref.float())
            dist, idx = torch.topk(d, self.k, dim=-1, largest=False)
            return dist, idx.int()

    def furthest_point_sample(xyz, npoint):
        B, N, _ = xyz.shape
        idx = torch.zeros(B, npoint, dtype=torch.int32, device=xyz.device)
        dist = torch.full((B, N), float("inf"), device=xyz.device)
        farthest = torch.zeros(B, dtype=torch.long, device=xyz.device)
        rows = torch.arange(B, device=xyz.device)
        for i in range(npoint):
            idx[:, i] = farthest.int()
            centroid = xyz[rows, farthest].unsqueeze(1)  # (B, 1, 3)
            d = ((xyz.float() - centroid.float()) ** 2).sum(-1)
            dist = torch.minimum(dist, d)
            farthest = dist.argmax(-1)
        return idx

    def gather_operation(features, idx):
        # features (B, C, N), idx (B, M) -> (B, C, M)
        gather = idx.long().unsqueeze(1).expand(-1, features.shape[1], -1)
        return torch.gather(features, 2, gather)

    class _Chamfer(nn.Module):
        squared = True

        def cuda(self, *args, **kwargs):  # reference calls .cuda() at build
            return self

        def forward(self, x, y):
            # x (B, N, 3), y (B, M, 3) -> per-point dist1 + dist2 (requires
            # N == M, true at every reference call site). See module docstring
            # for why the absent extension is pinned to this convention.
            d = torch.cdist(x.float(), y.float()) ** 2
            d1 = d.min(dim=-1).values  # (B, N)
            d2 = d.min(dim=-2).values  # (B, M)
            if not self.squared:
                d1, d2 = torch.sqrt(d1), torch.sqrt(d2)
            return d1 + d2

    class ChamferDistanceL2(_Chamfer):
        squared = True

    class ChamferDistanceL1(_Chamfer):
        squared = False

    knn_cuda = types.ModuleType("knn_cuda")
    knn_cuda.KNN = KNN
    pointnet2_ops = types.ModuleType("pointnet2_ops")
    pn2_utils = types.ModuleType("pointnet2_ops.pointnet2_utils")
    pn2_utils.furthest_point_sample = furthest_point_sample
    pn2_utils.gather_operation = gather_operation
    pointnet2_ops.pointnet2_utils = pn2_utils
    extensions = types.ModuleType("extensions")
    chamfer_dist = types.ModuleType("extensions.chamfer_dist")
    chamfer_dist.ChamferDistanceL1 = ChamferDistanceL1
    chamfer_dist.ChamferDistanceL2 = ChamferDistanceL2
    extensions.chamfer_dist = chamfer_dist
    return {
        "knn_cuda": knn_cuda,
        "pointnet2_ops": pointnet2_ops,
        "pointnet2_ops.pointnet2_utils": pn2_utils,
        "extensions": extensions,
        "extensions.chamfer_dist": chamfer_dist,
    }


def _build_engine_shims():
    """Extra shims to execute the reference ENGINE code itself
    (``engine_pretrain_Classifier_SVM.py``) on CPU:

    - ``torch._six`` (removed in torch 2.x; ``util/misc.py:20`` imports inf),
    - ``torchvision.transforms.Compose`` (only Compose is used, engine :28),
    - ``timm.utils.ModelEma`` — timm's legacy deepcopy EMA with the exact
      update rule the engine mutates (``.decay`` set per epoch, engine :60-65;
      update ``ema = decay*ema + (1-decay)*model`` over state_dict incl.
      buffers),
    - ``timm.optim.optim_factory.add_weight_decay`` — timm's rule: no decay
      for 1-d params / ``.bias`` (``main_pretrain.py:396``).
    """
    import copy

    import torch
    import torch.nn as nn  # noqa: F401

    six = types.ModuleType("torch._six")
    six.inf = float("inf")

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    tvt.Compose = Compose
    tv.transforms = tvt
    # util/datasets.py (pulled in by main_knn/main_linprob) does
    # `from torchvision import datasets, transforms` — the image-domain
    # dataset builders are never exercised by the parity tests
    tvd = types.ModuleType("torchvision.datasets")
    tvd.__path__ = []  # mark as package: util/datasets.py imports .folder
    tvdf = types.ModuleType("torchvision.datasets.folder")

    def default_loader(path):  # image loader, never exercised
        raise NotImplementedError("image datasets are out of scope")

    tvdf.default_loader = default_loader
    tvd.folder = tvdf

    class ImageFolder:  # subclassed by util/datasets.py, never exercised
        def __init__(self, *a, **k):
            raise NotImplementedError("image datasets are out of scope")

    tvd.ImageFolder = ImageFolder
    tv.datasets = tvd
    # util/crop.py (main_linprob) imports transforms.functional; the image
    # crop transform is never exercised by the point-cloud parity tests
    tvtf = types.ModuleType("torchvision.transforms.functional")
    tvt.__path__ = []
    tvt.functional = tvtf

    class RandomResizedCrop:  # subclassed by util/crop.py, never exercised
        def __init__(self, *a, **k):
            pass

    tvt.RandomResizedCrop = RandomResizedCrop

    class ModelEma:
        def __init__(self, model, decay=0.9999, device="", resume=""):
            self.ema = copy.deepcopy(model)
            self.ema.eval()
            self.decay = decay
            self.device = device
            if device:
                self.ema.to(device=device)
            for p in self.ema.parameters():
                p.requires_grad_(False)

        def update(self, model):
            with torch.no_grad():
                msd = model.state_dict()
                for k, ema_v in self.ema.state_dict().items():
                    model_v = msd[k].detach()
                    if ema_v.dtype.is_floating_point:
                        ema_v.copy_(ema_v * self.decay + (1.0 - self.decay) * model_v)
                    else:
                        # integer buffers (num_batches_tracked): timm's float
                        # multiply + copy_ truncates; the buffer is unused at
                        # fixed BN momentum, keep them in sync instead
                        ema_v.copy_(model_v)

    def add_weight_decay(model, weight_decay=1e-5, skip_list=()):
        decay, no_decay = [], []
        for name, param in model.named_parameters():
            if not param.requires_grad:
                continue
            if len(param.shape) == 1 or name.endswith(".bias") or name in skip_list:
                no_decay.append(param)
            else:
                decay.append(param)
        return [
            {"params": no_decay, "weight_decay": 0.0},
            {"params": decay, "weight_decay": weight_decay},
        ]

    def accuracy(output, target, topk=(1,)):
        # timm.utils.accuracy (engine_finetune.py:18; used by evaluate only)
        maxk = max(topk)
        _, pred = output.topk(maxk, 1, True, True)
        pred = pred.t()
        correct = pred.eq(target.reshape(1, -1).expand_as(pred))
        return [
            correct[:k].reshape(-1).float().sum(0) * 100.0 / target.size(0)
            for k in topk
        ]

    timm_utils = types.ModuleType("timm.utils")
    timm_utils.ModelEma = ModelEma
    timm_utils.accuracy = accuracy
    timm_data = types.ModuleType("timm.data")
    timm_data.Mixup = type("Mixup", (), {})  # imported by engine_finetune.py:18, never used (mixup_fn=None)
    # util/datasets.py (main_knn/main_linprob) image-transform imports —
    # point-cloud parity never builds image datasets
    timm_data.__path__ = []
    timm_data.create_transform = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError("image transforms are out of scope"))
    timm_data_constants = types.ModuleType("timm.data.constants")
    timm_data_constants.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    timm_data_constants.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    timm_data.constants = timm_data_constants
    timm_optim = types.ModuleType("timm.optim")
    optim_factory = types.ModuleType("timm.optim.optim_factory")
    optim_factory.add_weight_decay = add_weight_decay
    timm_optim.optim_factory = optim_factory

    # the engine calls torch.cuda.synchronize() each iteration (:269) — a
    # no-op stand-in when CUDA is absent (this image ships CPU-only torch).
    # engine_finetune moves batches with .cuda() (engine_finetune.py:105-106)
    # rather than .to(device): identity on CPU.
    if not torch.cuda.is_available():
        torch.cuda.synchronize = lambda *a, **k: None
        torch.Tensor.cuda = lambda self, *a, **k: self

    return {
        "torch._six": six,
        "torchvision": tv,
        "torchvision.transforms": tvt,
        "torchvision.datasets": tvd,
        "torchvision.datasets.folder": tvdf,
        "torchvision.transforms.functional": tvtf,
        "timm.utils": timm_utils,
        "timm.data": timm_data,
        "timm.data.constants": timm_data_constants,
        "timm.optim": timm_optim,
        "timm.optim.optim_factory": optim_factory,
    }


def _build_easydict_shim():
    class EasyDict(dict):
        """Attribute-access dict (the pypi ``easydict`` the reference configs use)."""

        def __init__(self, d=None, **kwargs):
            super().__init__()
            d = dict(d or {}, **kwargs)
            for k, v in d.items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            super().__setitem__(k, v)
            super().__setattr__(k, v)

        __setattr__ = __setitem__

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    mod = types.ModuleType("easydict")
    mod.EasyDict = EasyDict
    return {"easydict": mod}


def install():
    """Idempotently register all shims in sys.modules."""
    global _installed
    if _installed:
        return
    shims = {}
    shims.update(_build_timm_shim())
    shims.update(_build_cuda_ext_shims())
    shims.update(_build_easydict_shim())
    shims.update(_build_engine_shims())
    for name, mod in shims.items():
        sys.modules.setdefault(name, mod)
    # attach the submodules onto the parent timm shim so attribute access
    # (timm.utils / timm.optim) resolves after `import timm`
    sys.modules["timm"].utils = sys.modules["timm.utils"]
    sys.modules["timm"].optim = sys.modules["timm.optim"]
    sys.modules["timm"].data = sys.modules["timm.data"]
    _installed = True


def _import_from_reference(name: str):
    install()
    if name in sys.modules:
        return sys.modules[name]
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        return importlib.import_module(name)
    finally:
        # keep the reference root off sys.path outside the import so its
        # top-level package names (models, utils, datasets...) can't shadow
        # anything else in the test process; imported modules stay cached.
        sys.path.remove(REFERENCE_ROOT)


def load_student_module():
    """The active GM3D student file (feature mode)."""
    return _import_from_reference("models_mae_learn_loss_Classifier_SVM_feature_besed")


def load_usual_student_module():
    """The usual-mode twin (``--mode usual``): coordinate pix_pred, depth-4
    loss-pred decoder, Chamfer-only loss matrix."""
    return _import_from_reference("models_mae_learn_loss_Classifier_SVM")


def load_older_student_module():
    """The OLDER GM3D student variant (``models_mae_learn_loss.py:30-846``) —
    the model ``main_pretrain_multi_gpu.py:166-413`` actually builds:
    encoder-inline design, shared encoder/decoder pos embed, single shared
    mask token for both decoders."""
    return _import_from_reference("models_mae_learn_loss")


def load_older_engine_module():
    """``engine_pretrain.py`` (``train_one_epoch`` :38-271) — the multi-GPU
    main's engine: Chamfer-only loss path by default
    (``learn_feature_loss='none'``), hardcoded 13.889*MSE(=0) + 1*CD mix at
    every epoch (the ``epoch < -1`` branch is dead, :144-153); the scaler's
    default clip-5 applies (:196 omits ``clip_grad``; ``util/misc.py:256``)."""
    return _import_from_reference("engine_pretrain")


def load_teacher_module():
    """``models.Point_MAE`` (frozen distillation teacher / legacy pretrain)."""
    return _import_from_reference("models.Point_MAE")


def load_engine_module():
    """The ACTUAL reference pretrain engine
    (``engine_pretrain_Classifier_SVM.py``: ``train_one_epoch`` shared-opt,
    ``train_one_epoch_seperated``) — executed directly by the
    training-trajectory parity tests."""
    return _import_from_reference("engine_pretrain_Classifier_SVM")


def load_finetune_engine_module():
    """The ACTUAL reference finetune engine (``engine_finetune.py``:
    ``train_one_epoch`` FPS->subsample->augment->CE under the AMP scaler) —
    executed directly by the finetune trajectory parity test."""
    return _import_from_reference("engine_finetune")


def load_lrd_module():
    """``util.lr_decay`` — ``param_groups_lrd`` / ``get_layer_id_for_vit``
    (the layer-wise LR decay groups ``main_finetune.py:359-366`` feeds
    AdamW)."""
    return _import_from_reference("util.lr_decay")


def load_lr_sched_module():
    """``util.lr_sched`` — ``adjust_learning_rate`` (per-iteration half-cosine
    with linear warmup, honours per-group ``lr_scale``)."""
    return _import_from_reference("util.lr_sched")


def make_teacher_config(mask_ratio=0.0, group_size=32, num_group=64, loss="cdl2"):
    """Teacher build config mirroring ``config_m.yaml`` (mask_ratio 0)."""
    from easydict import EasyDict  # the shim

    return EasyDict(
        {
            "group_size": group_size,
            "num_group": num_group,
            "loss": loss,
            "transformer_config": {
                "mask_ratio": mask_ratio,
                "mask_type": "rand",
                "trans_dim": 384,
                "encoder_dims": 384,
                "depth": 12,
                "num_heads": 6,
                "decoder_depth": 4,
                "decoder_num_heads": 6,
                "drop_path_rate": 0.1,
            },
        }
    )
