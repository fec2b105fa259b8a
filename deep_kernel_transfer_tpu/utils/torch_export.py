"""Export this framework's checkpoints to the reference's torch layout.

The inverse of utils/torch_import.py: our param pytrees become flat
state_dicts with the REFERENCE's key names (reference backbone.py /
methods/DKT.py / train.py:57-65), so trained TPU models can be compared —
or kept running — inside BayesWatch/deep-kernel-transfer tooling:

  * conv kernels: flax HWIO [kh, kw, I, O] -> torch [O, I, kh, kw];
  * BatchNorm: scale/bias + batch_stats {mean, var} ->
    weight/bias/running_mean/running_var (+ a zero num_batches_tracked,
    present in every torch BN state_dict);
  * ConvBlock emits BOTH the named-attribute keys ('trunk.{i}.C.*',
    'trunk.{i}.BN.*') and their Sequential aliases ('trunk.{i}.trunk.0.*',
    'trunk.{i}.trunk.1.*') — torch state_dicts contain both because the
    reference registers the layers twice (reference backbone.py:105-132);
  * heads over flattened conv features are permuted back from this repo's
    HWC flatten order to torch's CHW (inverse of chw_to_hwc_perm);
  * GP hyperparameters are written as gpytorch raw values; the likelihood
    noise goes through the inverse of its GreaterThan(1e-4) constraint.

Caveat (documented, by design): gpytorch-internal buffers that have no
counterpart here are not emitted, and matchingnet's merged LSTM bias is
written entirely into `bias_ih` (`bias_hh` = 0) — torch sums them, so the
forward is identical. Loading into the reference may therefore need
`load_state_dict(..., strict=False)`. The tested contract is the
round trip: `import(export(params)) == params`
(tests/test_torch_import.py).
"""
from __future__ import annotations

from typing import Any

import numpy as np

from .torch_import import (
    _conv_out_hwc,
    flatten_perm,
    _inv_softplus,
    _softplus,
    chw_to_hwc_perm,
)

__all__ = [
    "export_backbone",
    "export_method_state",
    "export_method_checkpoint",
]


def _inv(perm: np.ndarray) -> np.ndarray:
    return np.argsort(perm)


def _conv_t(kernel) -> np.ndarray:
    """flax HWIO -> torch OIHW."""
    return np.transpose(np.asarray(kernel, np.float32), (3, 2, 0, 1))


def _bn_t(out: dict, prefix: str, bn_params: dict, bn_stats: dict,
          aliases: tuple[str, ...] = ()) -> None:
    tensors = {
        "weight": np.asarray(bn_params["scale"], np.float32),
        "bias": np.asarray(bn_params["bias"], np.float32),
        "running_mean": np.asarray(bn_stats["mean"], np.float32),
        "running_var": np.asarray(bn_stats["var"], np.float32),
        "num_batches_tracked": np.zeros((), np.int64),
    }
    for p in (prefix,) + aliases:
        for k, v in tensors.items():
            out[f"{p}.{k}"] = v


def _export_convnet(fvars: dict, prefix: str, depth: int) -> dict:
    """Inverse of torch_import._import_convnet, incl. the Sequential
    aliases a real reference state_dict carries."""
    out: dict[str, Any] = {}
    params, stats = fvars["params"], fvars.get("batch_stats", {})
    for i in range(depth):
        blk = params[f"ConvBlock_{i}"]
        w = _conv_t(blk["Conv_0"]["kernel"])
        b = np.asarray(blk["Conv_0"]["bias"], np.float32)
        for p in (f"{prefix}trunk.{i}.C", f"{prefix}trunk.{i}.trunk.0"):
            out[f"{p}.weight"] = w
            out[f"{p}.bias"] = b
        _bn_t(out, f"{prefix}trunk.{i}.BN",
              blk["EpisodicBatchNorm_0"],
              stats[f"ConvBlock_{i}"]["EpisodicBatchNorm_0"],
              aliases=(f"{prefix}trunk.{i}.trunk.1",))
    return out


def _export_resnet(fvars: dict, prefix: str, num_layers,
                   bottleneck: bool) -> dict:
    out: dict[str, Any] = {}
    params, stats = fvars["params"], fvars.get("batch_stats", {})
    out[f"{prefix}trunk.0.weight"] = _conv_t(params["Conv_0"]["kernel"])
    _bn_t(out, f"{prefix}trunk.1", params["EpisodicBatchNorm_0"],
          stats["EpisodicBatchNorm_0"])
    block_name = "BottleneckBlock" if bottleneck else "SimpleBlock"
    t, b = 4, 0
    for stage_layers in num_layers:
        for _ in range(stage_layers):
            p = params[f"{block_name}_{b}"]
            s = stats[f"{block_name}_{b}"]
            n_convs = 3 if bottleneck else 2
            for ci in range(n_convs):
                ck = f"{prefix}trunk.{t}.C{ci + 1}"
                out[f"{ck}.weight"] = _conv_t(p[f"Conv_{ci}"]["kernel"])
                if "bias" in p[f"Conv_{ci}"]:
                    out[f"{ck}.bias"] = np.asarray(
                        p[f"Conv_{ci}"]["bias"], np.float32)
                _bn_t(out, f"{prefix}trunk.{t}.BN{ci + 1}",
                      p[f"EpisodicBatchNorm_{ci}"],
                      s[f"EpisodicBatchNorm_{ci}"])
            if f"Conv_{n_convs}" in p:  # 1x1 shortcut
                out[f"{prefix}trunk.{t}.shortcut.weight"] = _conv_t(
                    p[f"Conv_{n_convs}"]["kernel"])
                if not bottleneck:
                    _bn_t(out, f"{prefix}trunk.{t}.BNshortcut",
                          p[f"EpisodicBatchNorm_{n_convs}"],
                          s[f"EpisodicBatchNorm_{n_convs}"])
            t += 1
            b += 1
    return out


def _export_conv3(fvars: dict, prefix: str) -> dict:
    out: dict[str, Any] = {}
    for i in range(3):
        blk = fvars["params"][f"Conv_{i}"]
        out[f"{prefix}layer{i + 1}.weight"] = _conv_t(blk["kernel"])
        out[f"{prefix}layer{i + 1}.bias"] = np.asarray(
            blk["bias"], np.float32)
    return out


def export_backbone(fvars: dict, backbone, prefix: str = "feature.") -> dict:
    """Flat torch state_dict (numpy tensors) for one backbone's flax
    variables — inverse of torch_import.import_backbone."""
    from ..models import backbones as B

    if isinstance(backbone, (B.ConvNet, B.ConvNetS, B.ConvNetNopool,
                             B.ConvNetSNopool)):
        return _export_convnet(fvars, prefix, backbone.depth)
    if isinstance(backbone, B.ResNet):
        return _export_resnet(fvars, prefix, backbone.num_layers,
                              bottleneck=(backbone.block is
                                          B.BottleneckBlock))
    if isinstance(backbone, B.Conv3):
        return _export_conv3(fvars, prefix)
    raise NotImplementedError(
        f"torch export for backbone {type(backbone).__name__} is not "
        "supported (supported: ConvNet/ConvNetS/NP variants, ResNet, Conv3)")


def _feature_vars(params: dict) -> dict:
    """The backbone's flax variables out of a method's params['feature']
    (which may nest the trunk under 'backbone' — DKT's DKTFeature)."""
    feat = params["feature"]
    if "backbone" in feat.get("params", {}):
        return {"params": feat["params"]["backbone"],
                "batch_stats": feat.get("batch_stats", {}).get(
                    "backbone", {})}
    return feat


# --------------------------------------------------------------------------
# methods
# --------------------------------------------------------------------------


_NOISE_FLOOR = 1e-4  # gpytorch GreaterThan(1e-4) noise constraint


def _noise_raw_torch(raw_ours) -> np.ndarray:
    """our raw noise -> gpytorch raw: value = softplus(raw_ours) must equal
    softplus(raw_torch) + 1e-4."""
    value = _softplus(np.asarray(raw_ours, np.float64))
    return _inv_softplus(np.maximum(value - _NOISE_FLOOR, 1e-8))


def _export_dkt(model, params: dict, image_size: int) -> dict:
    bb = model.feature.backbone
    out = export_backbone(_feature_vars(params), bb, prefix="feature.")
    if model.kernel_type == "bncossim":
        inv = _inv(flatten_perm(bb, image_size))
        feat = params["feature"]
        bn = feat["params"]["EpisodicBatchNorm_0"]
        st = feat["batch_stats"]["EpisodicBatchNorm_0"]
        _bn_t(out, "feature.trunk.bn_out",
              {k: np.asarray(v)[inv] for k, v in bn.items()},
              {k: np.asarray(v)[inv] for k, v in st.items()})
    gp = params["gp"]
    # the model's fixed observation noise (0.1 by default; reference
    # methods/DKT.py:337-378) — read from the likelihood, not hardcoded
    noise = float(model.gp.likelihood.fixed_noise)
    raw_noise = _noise_raw_torch(_inv_softplus(np.float64(noise)))
    for w_i in range(model.n_way):
        p = f"model.models.{w_i}."
        mean_c = np.float32(np.asarray(gp["mean"]["constant"])[w_i])
        # both gpytorch generations: modern 'raw_constant' + the pinned
        # (old) reference gpytorch's 'constant' (same value, no constraint)
        out[f"{p}mean_module.raw_constant"] = mean_c
        out[f"{p}mean_module.constant"] = mean_c.reshape(1)
        out[f"{p}covar_module.raw_outputscale"] = np.float32(
            np.asarray(gp["kernel"]["raw_outputscale"])[w_i])
        base = gp["kernel"].get("base", {})
        if "raw_lengthscale" in base:
            out[f"{p}covar_module.base_kernel.raw_lengthscale"] = np.asarray(
                base["raw_lengthscale"], np.float32)[w_i].reshape(1, 1)
        if "raw_offset" in base:
            out[f"{p}covar_module.base_kernel.raw_offset"] = np.float32(
                np.asarray(base["raw_offset"])[w_i])
        if "raw_variance" in base:
            out[f"{p}covar_module.base_kernel.raw_variance"] = np.asarray(
                base["raw_variance"], np.float32)[w_i].reshape(1)
        # gpytorch registers raw_noise as shape [1] (HomoskedasticNoise
        # with empty batch_shape); a [1, 1] here makes the reference's
        # load_state_dict raise a size mismatch even with strict=False
        out[f"{p}likelihood.noise_covar.raw_noise"] = (
            np.float32(raw_noise).reshape(1))
        out[f"likelihood.likelihoods.{w_i}.noise_covar.raw_noise"] = (
            np.float32(raw_noise).reshape(1))
    return out


def _export_baseline(model, params: dict, image_size: int) -> dict:
    bb = model.net.backbone
    net = params["net"]
    fvars = {"params": net["params"]["backbone"],
             "batch_stats": net.get("batch_stats", {}).get("backbone", {})}
    out = export_backbone(fvars, bb, prefix="feature.")
    inv = _inv(flatten_perm(bb, image_size))
    if "Dense_0" in net["params"]:  # softmax head
        head = net["params"]["Dense_0"]
        out["classifier.weight"] = np.asarray(
            head["kernel"], np.float32)[inv].T
        out["classifier.bias"] = np.asarray(head["bias"], np.float32)
    else:  # distLinear (baseline++)
        head = net["params"]["DistLinear_0"]
        out["classifier.L.weight_v"] = np.asarray(
            head["v"], np.float32)[inv].T
        out["classifier.L.weight_g"] = np.asarray(
            head["g"], np.float32).reshape(-1, 1)
    return out


def _export_maml(model, params: dict, image_size: int) -> dict:
    bb = model.net.backbone
    net = params["net"]
    fvars = {"params": net["params"]["backbone"],
             "batch_stats": net.get("batch_stats", {}).get("backbone", {})}
    out = export_backbone(fvars, bb, prefix="feature.")
    inv = _inv(flatten_perm(bb, image_size))
    head = net["params"]["Dense_0"]
    out["classifier.weight"] = np.asarray(head["kernel"], np.float32)[inv].T
    out["classifier.bias"] = np.asarray(head["bias"], np.float32)
    return out


def _export_protonet(model, params: dict) -> dict:
    return export_backbone(_feature_vars(params), model.feature,
                           prefix="feature.")


def _export_lstm_cell(cell: dict, prefix: str, perm_in: np.ndarray,
                      perm_h: np.ndarray, suffix: str = "") -> dict:
    """Inverse of torch_import._lstm_cell_params. The merged flax bias is
    emitted as bias_ih with bias_hh = 0 (torch sums them)."""
    inv_in, inv_h = _inv(perm_in), _inv(perm_h)
    W_ih, W_hh, b_ih = [], [], []
    for g in ("i", "f", "g", "o"):
        W_ih.append(np.asarray(cell[f"i{g}"]["kernel"],
                               np.float32)[inv_in][:, inv_h].T)
        W_hh.append(np.asarray(cell[f"h{g}"]["kernel"],
                               np.float32)[inv_h][:, inv_h].T)
        b_ih.append(np.asarray(cell[f"h{g}"]["bias"], np.float32)[inv_h])
    return {
        f"{prefix}weight_ih{suffix}": np.concatenate(W_ih, axis=0),
        f"{prefix}weight_hh{suffix}": np.concatenate(W_hh, axis=0),
        f"{prefix}bias_ih{suffix}": np.concatenate(b_ih, axis=0),
        f"{prefix}bias_hh{suffix}": np.zeros(
            sum(b.shape[0] for b in b_ih), np.float32),
    }


def _export_matchingnet(model, params: dict, image_size: int) -> dict:
    bb = model.feature
    out = export_backbone(params["feature"], bb, prefix="feature.")
    perm = flatten_perm(bb, image_size)
    d = perm.shape[0]
    perm2 = np.concatenate([perm, perm + d])
    out.update(_export_lstm_cell(
        params["FCE"]["params"]["OptimizedLSTMCell_0"],
        "FCE.lstmcell.", perm2, perm))
    out.update(_export_lstm_cell(
        params["G"]["params"]["OptimizedLSTMCell_0"],
        "G_encoder.", perm, perm, suffix="_l0"))
    out.update(_export_lstm_cell(
        params["G"]["params"]["OptimizedLSTMCell_1"],
        "G_encoder.", perm, perm, suffix="_l0_reverse"))
    return out


def _export_relationnet(model, params: dict) -> dict:
    out = export_backbone(params["feature"], model.feature,
                          prefix="feature.")
    h, w, c = model.feat_shape
    from ..methods.relationnet import relation_module_geometry

    hs, ws, _ = relation_module_geometry(h, w)
    rp = params["relation"]["params"]
    rs = params["relation"]["batch_stats"]
    for i, layer in enumerate(("layer1", "layer2")):
        blk = rp[f"RelationConvBlock_{i}"]
        wq = _conv_t(blk["Conv_0"]["kernel"])
        bq = np.asarray(blk["Conv_0"]["bias"], np.float32)
        for p in (f"relation_module.{layer}.C",
                  f"relation_module.{layer}.trunk.0"):
            out[f"{p}.weight"] = wq
            out[f"{p}.bias"] = bq
        _bn_t(out, f"relation_module.{layer}.BN",
              blk["EpisodicBatchNorm_0"],
              rs[f"RelationConvBlock_{i}"]["EpisodicBatchNorm_0"],
              aliases=(f"relation_module.{layer}.trunk.1",))
    inv = _inv(chw_to_hwc_perm(hs, ws, c) if hs * ws > 1
               else np.arange(c))
    out["relation_module.fc1.weight"] = np.asarray(
        rp["Dense_0"]["kernel"], np.float32)[inv].T
    out["relation_module.fc1.bias"] = np.asarray(
        rp["Dense_0"]["bias"], np.float32)
    out["relation_module.fc2.weight"] = np.asarray(
        rp["Dense_1"]["kernel"], np.float32).T
    out["relation_module.fc2.bias"] = np.asarray(
        rp["Dense_1"]["bias"], np.float32)
    return out


def _export_dkt_regression(model, params: dict,
                           image_size: int = 100) -> tuple[dict, dict, dict]:
    """(gp, likelihood, net) sub-dicts — the reference's 3-part regression
    save layout (reference DKT_regression.py:99-104)."""
    bb = model.feature
    net = export_backbone(params["feature"], bb, prefix="")
    gp_p = params["gp"]
    mean_c = np.float32(np.asarray(gp_p["mean"]["constant"]).reshape(()))
    gp: dict[str, Any] = {
        "mean_module.raw_constant": mean_c,
        "mean_module.constant": mean_c.reshape(1),  # old-gpytorch alias
    }
    kern = gp_p["kernel"]
    if "raw_outputscale" in kern:
        gp["covar_module.raw_outputscale"] = np.float32(
            np.asarray(kern["raw_outputscale"]).reshape(()))
        if "base" in kern and "raw_lengthscale" in kern["base"]:
            gp["covar_module.base_kernel.raw_lengthscale"] = np.asarray(
                kern["base"]["raw_lengthscale"], np.float32).reshape(1, 1)
    elif "raw_weights" in kern:
        inv = _inv(flatten_perm(bb, image_size))
        q = np.asarray(kern["raw_weights"]).reshape(-1).shape[0]
        gp["covar_module.raw_mixture_weights"] = np.asarray(
            kern["raw_weights"], np.float32).reshape(q)
        gp["covar_module.raw_mixture_means"] = np.asarray(
            kern["raw_means"], np.float32)[:, inv].reshape(q, 1, -1)
        gp["covar_module.raw_mixture_scales"] = np.asarray(
            kern["raw_scales"], np.float32)[:, inv].reshape(q, 1, -1)
    likelihood = {"noise_covar.raw_noise": np.float32(
        _noise_raw_torch(gp_p["likelihood"]["raw_noise"])).reshape(1)}
    return gp, likelihood, net


def _export_feature_transfer(model, params: dict,
                             image_size: int = 100) -> tuple[dict, dict]:
    """(feature_extractor, model) sub-dicts (reference
    feature_transfer_regression.py:82-83)."""
    bb = model.net.backbone
    net = params["net"]
    feats = export_backbone({"params": net["params"]["backbone"]}, bb,
                            prefix="")
    inv = _inv(flatten_perm(bb, image_size))
    head = net["params"]["Dense_0"]
    reg = {"layer4.weight": np.asarray(head["kernel"], np.float32)[inv].T,
           "layer4.bias": np.asarray(head["bias"], np.float32)}
    return feats, reg


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------


def export_method_state(method_name: str, model, params: dict,
                        image_size: int):
    """The torch-format payload (still numpy) for a method's params:
    a flat state_dict for classification methods, or the reference's
    multi-part dict for the regression layouts."""
    if method_name == "DKT":
        return _export_dkt(model, params, image_size)
    if method_name in ("baseline", "baseline++"):
        return _export_baseline(model, params, image_size)
    if method_name == "protonet":
        return _export_protonet(model, params)
    if method_name == "matchingnet":
        return _export_matchingnet(model, params, image_size)
    if method_name in ("relationnet", "relationnet_softmax"):
        return _export_relationnet(model, params)
    if method_name in ("maml", "maml_approx"):
        return _export_maml(model, params, image_size)
    if method_name in ("DKT_regression", "DKT_regression_spectral"):
        gp, lik, net = _export_dkt_regression(model, params, image_size)
        return {"gp": gp, "likelihood": lik, "net": net}
    if method_name == "transfer":
        feats, reg = _export_feature_transfer(model, params, image_size)
        return {"feature_extractor": feats, "model": reg}
    raise NotImplementedError(
        f"torch export for method '{method_name}' is not supported")


def export_method_checkpoint(path: str, method_name: str, model,
                             params: dict, image_size: int,
                             epoch: int = -1) -> None:
    """torch.save a reference-format checkpoint file: classification
    methods as {'epoch', 'state'} (reference train.py:57-65), regression
    methods in their own multi-part layouts."""
    import torch

    payload = export_method_state(method_name, model, params, image_size)

    def _t(v):  # copy: jax array views are read-only, torch wants writable
        return torch.as_tensor(np.array(v, copy=True))

    if method_name in ("DKT_regression", "DKT_regression_spectral",
                       "transfer"):
        blob = {k: {kk: _t(vv) for kk, vv in v.items()}
                for k, v in payload.items()}
    else:
        blob = {"epoch": int(epoch),
                "state": {k: _t(v) for k, v in payload.items()}}
    torch.save(blob, path)
