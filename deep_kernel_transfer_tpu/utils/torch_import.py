"""Import the reference's torch checkpoints into this framework.

The reference stores `torch.save({'epoch': E, 'state': model.state_dict()})`
at `<ckpt_dir>/{best_model,EPOCH}.tar` (reference train.py:57-65) and, for
regression, `{'gp': ..., 'likelihood': ..., 'net': ...}` (reference
methods/DKT_regression.py:99-104). A user switching from the reference has
directories full of those files; this module converts them into this
repo's param pytrees so trained reference models evaluate/serve on TPU
without retraining:

  * conv kernels: torch [O, I, kh, kw] -> flax HWIO [kh, kw, I, O];
  * BatchNorm: weight/bias/running_mean/running_var -> scale/bias +
    batch_stats {mean, var};
  * flattened-feature heads (bncossim's trunk bn_out, baseline softmax /
    distLinear classifiers, spectral ARD lengthscales): torch flattens
    conv maps channel-major [C, H, W] while this repo is NHWC -> [H, W, C],
    so per-feature vectors/matrix columns are permuted with
    `chw_to_hwc_perm`;
  * GP hyperparameters (reference methods/DKT.py:337-378 ExactGPLayer):
    gpytorch stores softplus-constrained raw values, the same
    parameterisation as gp/kernels.py, so raw values transfer directly —
    except the likelihood noise, whose gpytorch constraint is
    GreaterThan(1e-4) (value = softplus(raw) + 1e-4): that one is
    converted through the VALUE;
  * the n_way per-way GPs of `IndependentModelList`
    (`model.models.{w}.*`) stack into this repo's leading-n_way-axis gp
    params.

Key layout learned from reference backbone.py / methods/DKT.py: ConvBlock
registers its conv twice ('trunk.{i}.C.*' and the Sequential alias
'trunk.{i}.trunk.0.*'); only the named attribute keys are read here.

Torch is CPU-only in this image; tensors are materialised as numpy and
never touch the device until the caller jits.
"""
from __future__ import annotations

import zipfile
from typing import Any

import numpy as np

__all__ = [
    "is_torch_checkpoint",
    "load_torch_state",
    "chw_to_hwc_perm",
    "import_backbone",
    "import_dkt",
    "import_baseline",
    "import_protonet",
    "import_maml",
    "import_matchingnet",
    "import_relationnet",
    "import_feature_only",
    "import_feature_transfer",
    "import_dkt_regression",
    "import_method_checkpoint",
]


# --------------------------------------------------------------------------
# detection + loading
# --------------------------------------------------------------------------


def is_torch_checkpoint(path: str) -> bool:
    """True for a torch-serialised file, False for this repo's npz payload.
    Modern torch archives are zips containing `data.pkl`; ours are np.savez
    zips containing `__epoch__.npy`. A non-zip file can only be a LEGACY
    (pre-torch-1.6) pickle checkpoint — this repo never writes non-zip
    payloads — so it routes to torch.load too."""
    try:
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
    except zipfile.BadZipFile:
        return True  # legacy torch pickle (our payloads are always zips)
    except OSError:
        return False
    return any(n.endswith("data.pkl") for n in names)


def load_torch_state(path: str) -> tuple[dict[str, np.ndarray], int]:
    """(flat state_dict as numpy, epoch). Accepts the classification layout
    {'epoch', 'state'}, the regression layout {'gp','likelihood','net'}
    (flattened with those prefixes), or a bare state_dict."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    epoch = -1
    if isinstance(blob, dict) and "state" in blob:
        epoch = int(blob.get("epoch", -1))
        state = blob["state"]
    elif isinstance(blob, dict) and "net" in blob and "gp" in blob:
        state = {}
        for part in ("gp", "likelihood", "net"):
            for k, v in blob.get(part, {}).items():
                state[f"{part}.{k}"] = v
    elif isinstance(blob, dict) and "feature_extractor" in blob:
        # FeatureTransfer regression layout (reference
        # feature_transfer_regression.py:82-83)
        state = {}
        for part in ("feature_extractor", "model"):
            for k, v in blob.get(part, {}).items():
                state[f"{part}.{k}"] = v
    else:
        state = blob
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out, epoch


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------


def flatten_perm(backbone, image_size: int) -> np.ndarray:
    """Permutation mapping torch's flattened trunk features to ours.

    Reshape-flattened maps (ConvNet/Conv3: our flatten is HWC-order, the
    reference's is CHW) need chw_to_hwc_perm; POOLED trunks (ResNet:
    global avg pool on both sides) emit channel-ordered vectors on both
    sides, so the perm is the identity even though the pre-pool map has
    h*w > 1 — indexing a [C]-sized head with an h*w*C perm would crash."""
    from ..models import backbones as B

    h, w, c = _conv_out_hwc(backbone, image_size)
    if isinstance(backbone, B.ResNet) or h * w == 1:
        return np.arange(c)
    return chw_to_hwc_perm(h, w, c)


def chw_to_hwc_perm(h: int, w: int, c: int) -> np.ndarray:
    """perm such that v_hwc = v_chw[perm]: torch flattens [C, H, W]
    channel-major, this repo flattens [H, W, C]."""
    idx = np.arange(c * h * w).reshape(c, h, w)  # torch flat index layout
    return idx.transpose(1, 2, 0).reshape(-1)  # read out in H, W, C order


def _conv(state: dict, key: str) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(state[key], (2, 3, 1, 0)).astype(np.float32)


def _bn(state: dict, prefix: str) -> tuple[dict, dict]:
    """(params {scale, bias}, batch_stats {mean, var}) from a torch
    BatchNorm prefix."""
    return (
        {"scale": state[f"{prefix}.weight"].astype(np.float32),
         "bias": state[f"{prefix}.bias"].astype(np.float32)},
        {"mean": state[f"{prefix}.running_mean"].astype(np.float32),
         "var": state[f"{prefix}.running_var"].astype(np.float32)},
    )


def _softplus(x):
    return np.logaddexp(0.0, x)


def _inv_softplus(y):
    # stable softplus^-1: y + log(1 - exp(-y))
    y = np.asarray(y, np.float64)
    return (y + np.log1p(-np.exp(-y))).astype(np.float32)


def _scalar(state: dict, *keys: str) -> np.ndarray:
    """First present key, squeezed to a scalar (gpytorch raw params carry
    stray size-1 batch axes, e.g. raw_lengthscale is [1, 1])."""
    for k in keys:
        if k in state:
            return np.float32(np.asarray(state[k]).reshape(()))
    raise KeyError(f"none of {keys} in checkpoint "
                   f"(have e.g. {sorted(state)[:8]}...)")


# --------------------------------------------------------------------------
# backbones
# --------------------------------------------------------------------------


def _import_convnet(state: dict, prefix: str, depth: int) -> dict:
    """ConvNet/ConvNetS/ConvNet*Nopool trunks: torch keys
    `{prefix}trunk.{i}.{C,BN}.*` (reference backbone.py:105-132, 250-328)."""
    params, stats = {}, {}
    for i in range(depth):
        cp, sp = _bn(state, f"{prefix}trunk.{i}.BN")
        params[f"ConvBlock_{i}"] = {
            "Conv_0": {
                "kernel": _conv(state, f"{prefix}trunk.{i}.C.weight"),
                "bias": state[f"{prefix}trunk.{i}.C.bias"].astype(np.float32),
            },
            "EpisodicBatchNorm_0": cp,
        }
        stats[f"ConvBlock_{i}"] = {"EpisodicBatchNorm_0": sp}
    return {"params": params, "batch_stats": stats}


def _import_resnet(state: dict, prefix: str, num_layers, bottleneck: bool) -> dict:
    """ResNet trunks: torch trunk indices 0=conv1, 1=bn1, blocks from 4
    (reference backbone.py:330-376)."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    cp, sp = _bn(state, f"{prefix}trunk.1")
    params["Conv_0"] = {"kernel": _conv(state, f"{prefix}trunk.0.weight")}
    params["EpisodicBatchNorm_0"] = cp
    stats["EpisodicBatchNorm_0"] = sp
    block_name = "BottleneckBlock" if bottleneck else "SimpleBlock"
    t = 4  # torch Sequential index of the first residual block
    b = 0  # flax block counter
    for stage_layers in num_layers:
        for _ in range(stage_layers):
            p: dict[str, Any] = {}
            s: dict[str, Any] = {}
            n_convs = 3 if bottleneck else 2
            for ci in range(n_convs):
                ck = f"{prefix}trunk.{t}.C{ci + 1}"
                conv = {"kernel": _conv(state, f"{ck}.weight")}
                if f"{ck}.bias" in state:  # bottleneck's 3x3 keeps its bias
                    conv["bias"] = state[f"{ck}.bias"].astype(np.float32)
                p[f"Conv_{ci}"] = conv
                bp, bs = _bn(state, f"{prefix}trunk.{t}.BN{ci + 1}")
                p[f"EpisodicBatchNorm_{ci}"] = bp
                s[f"EpisodicBatchNorm_{ci}"] = bs
            if f"{prefix}trunk.{t}.shortcut.weight" in state:
                p[f"Conv_{n_convs}"] = {
                    "kernel": _conv(state, f"{prefix}trunk.{t}.shortcut.weight")
                }
                if not bottleneck:  # SimpleBlock shortcut has a BN
                    bp, bs = _bn(state, f"{prefix}trunk.{t}.BNshortcut")
                    p[f"EpisodicBatchNorm_{n_convs}"] = bp
                    s[f"EpisodicBatchNorm_{n_convs}"] = bs
            params[f"{block_name}_{b}"] = p
            stats[f"{block_name}_{b}"] = s
            t += 1
            b += 1
    return {"params": params, "batch_stats": stats}


def _import_conv3(state: dict, prefix: str) -> dict:
    """QMUL Conv3 trunk (reference backbone.py:379-402): layer{1,2,3}."""
    params = {}
    for i in range(3):
        params[f"Conv_{i}"] = {
            "kernel": _conv(state, f"{prefix}layer{i + 1}.weight"),
            "bias": state[f"{prefix}layer{i + 1}.bias"].astype(np.float32),
        }
    return {"params": params}


def import_backbone(state: dict, backbone, prefix: str = "feature.") -> dict:
    """Flax variables for one of this repo's backbone modules from the
    torch state_dict keys under `prefix`. Dispatches on module type."""
    from ..models import backbones as B

    if isinstance(backbone, (B.ConvNet, B.ConvNetS, B.ConvNetNopool,
                             B.ConvNetSNopool)):
        return _import_convnet(state, prefix, backbone.depth)
    if isinstance(backbone, B.ResNet):
        return _import_resnet(state, prefix, backbone.num_layers,
                              bottleneck=(backbone.block is B.BottleneckBlock))
    if isinstance(backbone, B.Conv3):
        return _import_conv3(state, prefix)
    raise NotImplementedError(
        f"torch import for backbone {type(backbone).__name__} is not "
        "supported (supported: ConvNet/ConvNetS/NP variants, ResNet, Conv3)")


def _conv_out_hwc(backbone, image_size: int) -> tuple[int, int, int]:
    """Final feature-map [H, W, C] of a trunk at `image_size` (needed for
    the CHW->HWC flatten permutation), via shape-only evaluation."""
    import jax
    import jax.numpy as jnp

    from ..models import backbones as B

    if isinstance(backbone, B.Conv3):
        # flattens internally; conv arithmetic: 3x3 dilation-2 (receptive
        # field 5) stride-2 VALID per layer (backbones.py Conv3)
        s = image_size
        for _ in range(3):
            s = (s - 5) // 2 + 1
        return s, s, 36

    bb = backbone
    if hasattr(bb, "flatten") and bb.flatten:
        bb = bb.clone(flatten=False)

    def shape_fn():
        x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        vs = bb.init(jax.random.PRNGKey(0), x)
        return bb.apply(vs, x, train=False)

    out = jax.eval_shape(shape_fn)
    if len(out.shape) != 4:
        raise ValueError(f"expected a 4-D feature map, got {out.shape}")
    return out.shape[1], out.shape[2], out.shape[3]


# --------------------------------------------------------------------------
# methods
# --------------------------------------------------------------------------


def _merge_feature(params: dict, fvars: dict) -> dict:
    """Replace the backbone leaves inside params['feature'] (which nests the
    backbone under DKTFeature/'backbone' for DKT, or IS the trunk vars for
    methods that use the bare backbone)."""
    feat = dict(params["feature"])
    if "backbone" in feat.get("params", {}):
        new = {
            "params": {**feat["params"], "backbone": fvars["params"]},
        }
        if "batch_stats" in feat:
            new["batch_stats"] = {**feat.get("batch_stats", {}),
                                  "backbone": fvars.get("batch_stats", {})}
        return {**params, "feature": new}
    merged = dict(feat)
    merged["params"] = fvars["params"]
    if "batch_stats" in fvars:
        merged["batch_stats"] = fvars["batch_stats"]
    return {**params, "feature": merged}


def _gp_scalars_per_way(state: dict, n_way: int, kernel_type: str) -> dict:
    """Stack the per-way ExactGPLayer hyperparameters
    (`model.models.{w}.*`, reference methods/DKT.py:337-378) into this
    repo's leading-n_way-axis gp params."""
    means, outs, lens, offs = [], [], [], []
    for w in range(n_way):
        p = f"model.models.{w}."
        means.append(_scalar(state, f"{p}mean_module.raw_constant",
                             f"{p}mean_module.constant"))
        outs.append(_scalar(state, f"{p}covar_module.raw_outputscale"))
        if kernel_type in ("rbf", "matern"):
            lens.append(_scalar(
                state, f"{p}covar_module.base_kernel.raw_lengthscale"))
        elif kernel_type in ("poli1", "poli2"):
            offs.append(_scalar(
                state, f"{p}covar_module.base_kernel.raw_offset"))
        elif kernel_type == "linear":
            lens.append(_scalar(
                state, f"{p}covar_module.base_kernel.raw_variance"))
    gp: dict[str, Any] = {
        "mean": {"constant": np.stack(means)},
        "kernel": {"raw_outputscale": np.stack(outs)},
    }
    if kernel_type in ("rbf", "matern"):
        gp["kernel"]["base"] = {"raw_lengthscale": np.stack(lens)}
    elif kernel_type in ("poli1", "poli2"):
        gp["kernel"]["base"] = {"raw_offset": np.stack(offs)}
    elif kernel_type == "linear":
        gp["kernel"]["base"] = {"raw_variance": np.stack(lens)}
    # cossim/bncossim: variance frozen at 1.0 -> no base params (our layout)
    return gp


def _retree(template, new):
    """new (numpy pytree with the same structure as template, matched by
    path) cast onto template's dtypes; leaves missing from new keep the
    template's value. Imported leaves whose path does NOT exist in the
    template are a hard error: silently dropping them would leave the
    corresponding module randomly initialised (e.g. a softmax baseline
    checkpoint imported into a baseline++ model, or a key typo in an
    import function) and evaluate at chance with no diagnostic."""
    import jax

    flat_new = {
        jax.tree_util.keystr(p): l
        for p, l in jax.tree_util.tree_flatten_with_path(new)[0]
    }
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    consumed = set()
    for p, leaf in paths:
        key = jax.tree_util.keystr(p)
        if key in flat_new:
            consumed.add(key)
            arr = np.asarray(flat_new[key])
            want = np.shape(leaf)
            if arr.shape != want:
                raise ValueError(
                    f"torch import: leaf {key} shape {arr.shape} != {want}")
            leaves.append(arr.astype(np.asarray(leaf).dtype))
        else:
            leaves.append(leaf)
    unconsumed = sorted(set(flat_new) - consumed)
    if unconsumed:
        raise ValueError(
            "torch import: imported leaves with no destination in the "
            f"model's parameter tree (head/type mismatch?): {unconsumed[:8]}"
            + (" ..." if len(unconsumed) > 8 else ""))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def import_dkt(state: dict, model, params: dict, image_size: int) -> dict:
    """Full DKT import: trunk + (bncossim) permuted trunk bn_out + per-way
    GP hyperparameters. `model` is methods.DKT, `params` its current
    params pytree (shapes/dtypes template)."""
    bb = model.feature.backbone
    fvars = import_backbone(state, bb, prefix="feature.")
    new = _merge_feature(params, fvars)
    if model.kernel_type == "bncossim":
        # trunk-appended BatchNorm1d over CHW-flattened features
        # (reference methods/DKT.py:45-48) -> permute to our HWC flatten
        perm = flatten_perm(bb, image_size)
        bp, bs = _bn(state, "feature.trunk.bn_out")
        bp = {k: v[perm] for k, v in bp.items()}
        bs = {k: v[perm] for k, v in bs.items()}
        feat = dict(new["feature"])
        feat["params"] = {**feat["params"], "EpisodicBatchNorm_0": bp}
        feat["batch_stats"] = {**feat.get("batch_stats", {}),
                               "EpisodicBatchNorm_0": bs}
        new = {**new, "feature": feat}
    gp = _gp_scalars_per_way(state, model.n_way, model.kernel_type)
    new = {**new, "gp": gp}
    return _retree(params, new)


def import_baseline(state: dict, model, params: dict,
                    image_size: int) -> dict:
    """BaselineTrain import: trunk + classifier head into the
    {'net': {'params': {'backbone', <head>}, 'batch_stats': ...}} layout
    (methods/baseline.BaselineClassifier). The torch softmax head is
    `classifier.{weight,bias}`; distLinear (baseline++) is WeightNorm'd
    `classifier.L.{weight_g,weight_v}` (reference backbone.py:22-44).
    Heads over flattened conv features get the CHW->HWC input
    permutation."""
    bb = model.net.backbone
    fvars = import_backbone(state, bb, prefix="feature.")

    perm = flatten_perm(bb, image_size)

    if "classifier.weight" in state:  # softmax head: torch [out, in]
        head_key = "Dense_0"
        head = {"kernel": state["classifier.weight"].T[perm].astype(np.float32),
                "bias": state["classifier.bias"].astype(np.float32)}
    elif "classifier.L.weight_v" in state:  # distLinear (baseline++)
        head_key = "DistLinear_0"
        head = {"v": state["classifier.L.weight_v"].T[perm].astype(np.float32),
                "g": state["classifier.L.weight_g"].reshape(-1).astype(np.float32)}
    else:
        raise KeyError("no classifier head found in checkpoint")

    net = dict(params["net"])
    new_net = {"params": {**net["params"], "backbone": fvars["params"],
                          head_key: head}}
    if "batch_stats" in net:
        new_net["batch_stats"] = {**net["batch_stats"],
                                  "backbone": fvars.get("batch_stats", {})}
    return _retree(params, {**params, "net": new_net})


def _lstm_cell_params(state: dict, prefix: str, perm_in: np.ndarray,
                      perm_h: np.ndarray, suffix: str = "") -> dict:
    """One torch LSTM(-Cell)'s stacked-gate tensors -> flax
    OptimizedLSTMCell params. Torch stacks gates (i, f, g, o) along the
    first axis of `weight_ih [4H, In]` / `weight_hh [4H, H]` and keeps two
    bias vectors; flax holds per-gate denses `i{g}` (no bias) and `h{g}`
    (bias), so flax bias = b_ih + b_hh. MatchingNet's LSTMs run directly
    in flattened-feature space (reference matchingnet.py:19-20: hidden
    size == feat_dim, residual-summed with features), so BOTH the input
    axis (`perm_in`) and the hidden axis (`perm_h`) are permuted from
    torch's CHW flatten order to this repo's HWC."""
    W_ih = state[f"{prefix}weight_ih{suffix}"]
    W_hh = state[f"{prefix}weight_hh{suffix}"]
    b = (state[f"{prefix}bias_ih{suffix}"]
         + state[f"{prefix}bias_hh{suffix}"])
    H = W_hh.shape[1]
    out: dict[str, Any] = {}
    for gi, g in enumerate(("i", "f", "g", "o")):
        rows = slice(gi * H, (gi + 1) * H)
        out[f"i{g}"] = {
            "kernel": W_ih[rows].T[perm_in][:, perm_h].astype(np.float32)}
        out[f"h{g}"] = {
            "kernel": W_hh[rows].T[perm_h][:, perm_h].astype(np.float32),
            "bias": b[rows][perm_h].astype(np.float32)}
    return out


def import_matchingnet(state: dict, model, params: dict,
                       image_size: int) -> dict:
    """MatchingNet import: trunk + the two LSTM heads (reference
    methods/matchingnet.py:19-20): `G_encoder` (bidirectional nn.LSTM,
    keys `G_encoder.weight_ih_l0{,_reverse}` ...) -> our GEncoder's
    OptimizedLSTMCell_{0,1} (fwd, bwd), and `FCE.lstmcell` (nn.LSTMCell
    over cat(f, r)) -> FullyContextualEmbedding's cell. All operate in
    flattened-feature space -> CHW->HWC permutation on input and hidden
    axes (both halves of the FCE concat input)."""
    bb = model.feature
    fvars = import_backbone(state, bb, prefix="feature.")
    new = _merge_feature(params, fvars)

    perm = flatten_perm(bb, image_size)
    d = perm.shape[0]
    perm2 = np.concatenate([perm, perm + d])  # cat(f, r) halves
    new = {**new,
           "FCE": {"params": {"OptimizedLSTMCell_0": _lstm_cell_params(
               state, "FCE.lstmcell.", perm2, perm)}},
           "G": {"params": {
               "OptimizedLSTMCell_0": _lstm_cell_params(
                   state, "G_encoder.", perm, perm, suffix="_l0"),
               "OptimizedLSTMCell_1": _lstm_cell_params(
                   state, "G_encoder.", perm, perm, suffix="_l0_reverse"),
           }}}
    return _retree(params, new)


def import_maml(state: dict, model, params: dict, image_size: int) -> dict:
    """MAML import: trunk + the `classifier` Linear_fw head (reference
    methods/maml.py:16-17) into MAMLNet's Dense_0. The head reads
    CHW-flattened features -> input-axis permutation."""
    bb = model.net.backbone
    fvars = import_backbone(state, bb, prefix="feature.")

    perm = flatten_perm(bb, image_size)
    head = {"kernel": state["classifier.weight"].T[perm].astype(np.float32),
            "bias": state["classifier.bias"].astype(np.float32)}

    net = dict(params["net"])
    new_net: dict[str, Any] = {"params": {**net["params"],
                                          "backbone": fvars["params"],
                                          "Dense_0": head}}
    if "batch_stats" in net:
        new_net["batch_stats"] = {**net["batch_stats"],
                                  "backbone": fvars.get("batch_stats", {})}
    return _retree(params, {**params, "net": new_net})


def import_relationnet(state: dict, model, params: dict) -> dict:
    """RelationNet import: NP trunk + the relation scorer (reference
    relationnet.py:107-154): `relation_module.layer{1,2}.{C,BN}` -> our
    RelationConvBlock_{0,1}, `fc1`/`fc2` -> Dense_0/Dense_1. The convs
    see channel-concatenated MAPS (proto first, query second — same order
    both sides), so only the OIHW->HWIO transpose applies; fc1 reads the
    CHW-flattened post-conv map -> input permutation over the shrunken
    [hs, ws, C] shape (shrink formula of relationnet.py:138-141)."""
    bb = model.feature
    fvars = import_backbone(state, bb, prefix="feature.")
    new = _merge_feature(params, fvars)

    from ..methods.relationnet import relation_module_geometry

    h, w, c = model.feat_shape
    hs, ws, _ = relation_module_geometry(h, w)

    rp: dict[str, Any] = {}
    rs: dict[str, Any] = {}
    for i, layer in enumerate(("layer1", "layer2")):
        cp, sp = _bn(state, f"relation_module.{layer}.BN")
        rp[f"RelationConvBlock_{i}"] = {
            "Conv_0": {
                "kernel": _conv(state, f"relation_module.{layer}.C.weight"),
                "bias": state[f"relation_module.{layer}.C.bias"]
                .astype(np.float32),
            },
            "EpisodicBatchNorm_0": cp,
        }
        rs[f"RelationConvBlock_{i}"] = {"EpisodicBatchNorm_0": sp}

    perm = (chw_to_hwc_perm(hs, ws, c) if hs * ws > 1
            else np.arange(c))
    fc1_kernel = state["relation_module.fc1.weight"].T
    if fc1_kernel.shape[0] != perm.shape[0]:
        raise ValueError(
            f"relation fc1 input {fc1_kernel.shape[0]} != expected "
            f"{perm.shape[0]} (= {hs}x{ws}x{c}); feat_shape mismatch?")
    rp["Dense_0"] = {"kernel": fc1_kernel[perm].astype(np.float32),
                     "bias": state["relation_module.fc1.bias"]
                     .astype(np.float32)}
    rp["Dense_1"] = {"kernel": state["relation_module.fc2.weight"].T
                     .astype(np.float32),
                     "bias": state["relation_module.fc2.bias"]
                     .astype(np.float32)}
    new = {**new, "relation": {"params": rp, "batch_stats": rs}}
    return _retree(params, new)


def import_protonet(state: dict, model, params: dict) -> dict:
    """ProtoNet has no head beyond the trunk."""
    fvars = import_backbone(state, model.feature, prefix="feature.")
    return _retree(params, _merge_feature(params, fvars))


def import_feature_only(state: dict, backbone, feature_vars: dict) -> dict:
    """Trunk-only import (the reference's own warm-start contract,
    reference train.py:198-217): returns new flax variables for
    `backbone` shaped like `feature_vars`."""
    fvars = import_backbone(state, backbone, prefix="feature.")
    return _retree(feature_vars, {**feature_vars, **{
        k: fvars[k] for k in fvars if k in ("params", "batch_stats")}})


def import_feature_transfer(state: dict, model, params: dict,
                            image_size: int = 100) -> dict:
    """FeatureTransfer regression import (reference
    feature_transfer_regression.py:11-33, save layout
    {'feature_extractor','model'}): Conv3 trunk + the Regressor's
    `layer4` Linear(2916, 1) into TransferNet's Dense_0 with the
    CHW->HWC input permutation."""
    bb = model.net.backbone
    fvars = import_backbone(state, bb, prefix="feature_extractor.")

    perm = flatten_perm(bb, image_size)
    head = {"kernel": state["model.layer4.weight"].T[perm].astype(np.float32),
            "bias": state["model.layer4.bias"].astype(np.float32)}
    net = {"params": {**params["net"]["params"],
                      "backbone": fvars["params"], "Dense_0": head}}
    return _retree(params, {**params, "net": net})


def import_dkt_regression(state: dict, model, params: dict,
                          image_size: int = 100) -> dict:
    """QMUL DKT regression import (reference methods/DKT_regression.py
    save layout {'gp','likelihood','net'}): Conv3 trunk + single-GP
    hyperparameters. Spectral ARD vectors over the 2916 CHW-flattened
    features are permuted to HWC."""
    bb = model.feature
    fvars = import_backbone(state, bb, prefix="net.")
    new = _merge_feature(params, fvars)

    gp: dict[str, Any] = {"mean": {"constant": _scalar(
        state, "gp.mean_module.raw_constant", "gp.mean_module.constant")}}
    kern: dict[str, Any] = {}
    if "gp.covar_module.raw_outputscale" in state:
        kern["raw_outputscale"] = _scalar(
            state, "gp.covar_module.raw_outputscale")
        if "gp.covar_module.base_kernel.raw_lengthscale" in state:
            kern["base"] = {"raw_lengthscale": _scalar(
                state, "gp.covar_module.base_kernel.raw_lengthscale")}
    elif "gp.covar_module.raw_mixture_weights" in state:
        # SpectralMixtureKernel (reference DKT_regression.py:117-124):
        # raw_mixture_{weights,means,scales}, means/scales [q, 1, d]
        perm = flatten_perm(bb, image_size)
        q = state["gp.covar_module.raw_mixture_weights"].reshape(-1).shape[0]
        means = state["gp.covar_module.raw_mixture_means"].reshape(q, -1)
        scales = state["gp.covar_module.raw_mixture_scales"].reshape(q, -1)
        kern = {
            "raw_weights": state["gp.covar_module.raw_mixture_weights"]
            .reshape(q).astype(np.float32),
            "raw_means": means[:, perm].astype(np.float32),
            "raw_scales": scales[:, perm].astype(np.float32),
        }
    gp["kernel"] = kern
    # gpytorch noise constraint GreaterThan(1e-4): value = softplus(raw)+1e-4
    raw = _scalar(state, "likelihood.noise_covar.raw_noise",
                  "gp.likelihood.noise_covar.raw_noise")
    gp["likelihood"] = {"raw_noise": _inv_softplus(_softplus(raw) + 1e-4)}
    return _retree(params, {**new, "gp": gp})


# --------------------------------------------------------------------------
# CLI entry: dispatch on method
# --------------------------------------------------------------------------


def method_backbone(model):
    """The flax trunk module inside a method object (DKT nests it under
    DKTFeature, baseline under BaselineClassifier, the rest hold it as
    `.feature`)."""
    if hasattr(model, "net") and hasattr(model.net, "backbone"):
        return model.net.backbone  # BaselineTrain
    feat = getattr(model, "feature", None)
    if feat is not None and hasattr(feat, "backbone"):
        return feat.backbone  # DKT's DKTFeature wrapper
    return feat


def import_method_checkpoint(path: str, method_name: str, model,
                             params: dict, image_size: int):
    """(new_params, epoch) from a reference torch checkpoint, dispatched on
    the CLI method string. Covers every reference method: trunk-only
    (protonet), trunk+head (baseline/++, maml, relationnet, matchingnet's
    LSTMs), and trunk+GP (DKT, DKT regression)."""
    state, epoch = load_torch_state(path)
    if method_name == "DKT":
        return import_dkt(state, model, params, image_size), epoch
    if method_name in ("baseline", "baseline++"):
        return import_baseline(state, model, params, image_size), epoch
    if method_name == "protonet":
        return import_protonet(state, model, params), epoch
    if method_name == "matchingnet":
        return import_matchingnet(state, model, params, image_size), epoch
    if method_name in ("relationnet", "relationnet_softmax"):
        return import_relationnet(state, model, params), epoch
    if method_name in ("maml", "maml_approx"):
        return import_maml(state, model, params, image_size), epoch
    if method_name in ("DKT_regression", "DKT_regression_spectral"):
        return import_dkt_regression(state, model, params,
                                     image_size), epoch
    if method_name == "transfer":
        return import_feature_transfer(state, model, params,
                                       image_size), epoch
    raise NotImplementedError(
        f"torch checkpoint import for method '{method_name}' is not "
        "supported (every reference method string should be covered; "
        "the trunk alone can still be imported with "
        "utils.torch_import.import_feature_only).")
