"""Torch-checkpoint import parity (utils/torch_import.py).

Builds torch models that reproduce the REFERENCE's state_dict key layout
(reference backbone.py / methods/DKT.py — the public checkpoint naming
contract), randomises weights AND BatchNorm running statistics, saves a
reference-format checkpoint, imports it, and asserts the flax forward
equals the torch eval-mode forward.
"""
import io
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn

import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu.models import backbones as B
from deep_kernel_transfer_tpu.utils import torch_import as TI


# -- torch replicas of the reference's module naming -----------------------


class TConvBlock(tnn.Module):
    def __init__(self, indim, outdim, pool=True, padding=1):
        super().__init__()
        self.C = tnn.Conv2d(indim, outdim, 3, padding=padding)
        self.BN = tnn.BatchNorm2d(outdim)
        layers = [self.C, self.BN, tnn.ReLU(inplace=True)]
        if pool:
            layers.append(tnn.MaxPool2d(2))
        self.trunk = tnn.Sequential(*layers)

    def forward(self, x):
        return self.trunk(x)


class TConvNet(tnn.Module):
    def __init__(self, depth, flatten=True, in_ch=3):
        super().__init__()
        layers = [
            TConvBlock(in_ch if i == 0 else 64, 64, pool=(i < 4))
            for i in range(depth)
        ]
        if flatten:
            layers.append(tnn.Flatten())
        self.trunk = tnn.Sequential(*layers)

    def forward(self, x):
        return self.trunk(x)


class TSimpleBlock(tnn.Module):
    def __init__(self, indim, outdim, half_res):
        super().__init__()
        self.C1 = tnn.Conv2d(indim, outdim, 3, stride=2 if half_res else 1,
                             padding=1, bias=False)
        self.BN1 = tnn.BatchNorm2d(outdim)
        self.C2 = tnn.Conv2d(outdim, outdim, 3, padding=1, bias=False)
        self.BN2 = tnn.BatchNorm2d(outdim)
        self.shortcut_type = "identity"
        if indim != outdim:
            self.shortcut = tnn.Conv2d(indim, outdim, 1,
                                       2 if half_res else 1, bias=False)
            self.BNshortcut = tnn.BatchNorm2d(outdim)
            self.shortcut_type = "1x1"

    def forward(self, x):
        out = torch.relu(self.BN1(self.C1(x)))
        out = self.BN2(self.C2(out))
        short = x if self.shortcut_type == "identity" else self.BNshortcut(
            self.shortcut(x))
        return torch.relu(out + short)


class TResNet10(tnn.Module):
    def __init__(self):
        super().__init__()
        conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        bn1 = tnn.BatchNorm2d(64)
        layers = [conv1, bn1, tnn.ReLU(),
                  tnn.MaxPool2d(kernel_size=3, stride=2, padding=1)]
        indim = 64
        for i, out in enumerate([64, 128, 256, 512]):
            layers.append(TSimpleBlock(indim, out, half_res=(i >= 1)))
            indim = out
        layers += [tnn.AvgPool2d(7), tnn.Flatten()]
        self.trunk = tnn.Sequential(*layers)

    def forward(self, x):
        return self.trunk(x)


class TConv3(tnn.Module):
    def __init__(self):
        super().__init__()
        self.layer1 = tnn.Conv2d(3, 36, 3, stride=2, dilation=2)
        self.layer2 = tnn.Conv2d(36, 36, 3, stride=2, dilation=2)
        self.layer3 = tnn.Conv2d(36, 36, 3, stride=2, dilation=2)

    def forward(self, x):
        out = torch.relu(self.layer1(x))
        out = torch.relu(self.layer2(out))
        out = torch.relu(self.layer3(out))
        return out.reshape(out.size(0), -1)


def _randomize(module, seed=0):
    """Random weights AND random (non-default) BN running statistics so the
    import of every tensor is exercised."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (tnn.Conv2d, tnn.Linear)):
                m.weight.normal_(0, 0.1, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0, 0.1, generator=g)
            elif isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return module


def _state(module, prefix="feature."):
    return {prefix + k: v.detach().numpy()
            for k, v in module.state_dict().items()}


def _forward_torch(module, x_nchw):
    module.eval()
    with torch.no_grad():
        return module(torch.from_numpy(x_nchw)).numpy()


# -- tests -----------------------------------------------------------------


def test_convnet_forward_parity():
    t = _randomize(TConvNet(4))
    x = np.random.RandomState(0).randn(3, 3, 84, 84).astype(np.float32)
    ref = _forward_torch(t, x)  # [3, 1600] CHW-flat

    ours_mod = B.Conv4()
    fvars = TI.import_backbone(_state(t), ours_mod)
    got = np.asarray(ours_mod.apply(fvars, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                    train=False))  # [3, 1600] HWC-flat
    perm = TI.chw_to_hwc_perm(5, 5, 64)
    np.testing.assert_allclose(got, ref[:, perm], rtol=1e-4, atol=1e-4)


def test_convnet_s_forward_parity():
    t = _randomize(TConvNet(4, in_ch=1), seed=1)
    x = np.random.RandomState(1).randn(2, 3, 28, 28).astype(np.float32)
    ref = _forward_torch(t, x[:, :1])  # reference slices channel 0 first

    ours_mod = B.Conv4S()
    fvars = TI.import_backbone(_state(t), ours_mod)
    got = np.asarray(ours_mod.apply(fvars, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                    train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_resnet10_forward_parity():
    t = _randomize(TResNet10(), seed=2)
    x = np.random.RandomState(2).randn(2, 3, 224, 224).astype(np.float32)
    ref = _forward_torch(t, x)  # [2, 512]

    ours_mod = B.ResNet10()
    fvars = TI.import_backbone(_state(t), ours_mod)
    got = np.asarray(ours_mod.apply(fvars, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                    train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_conv3_forward_parity():
    t = _randomize(TConv3(), seed=3)
    x = np.random.RandomState(3).randn(2, 3, 100, 100).astype(np.float32)
    ref = _forward_torch(t, x)  # [2, 2916] CHW-flat

    ours_mod = B.Conv3()
    # the regression checkpoint layout carries the trunk under 'net.'
    fvars = TI.import_backbone(_state(t, prefix="net."), ours_mod,
                               prefix="net.")
    got = np.asarray(ours_mod.apply(fvars, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                    train=False))
    perm = TI.chw_to_hwc_perm(9, 9, 36)
    np.testing.assert_allclose(got, ref[:, perm], rtol=1e-4, atol=1e-4)


def _dkt_torch_state(n_way=5):
    """Reference-format DKT checkpoint: Conv4 trunk + trunk bn_out +
    per-way ExactGPLayer scalars (reference methods/DKT.py:58-71,337-378)."""
    t = _randomize(TConvNet(4), seed=4)
    t.trunk.add_module("bn_out", tnn.BatchNorm1d(1600))
    _randomize(t.trunk.bn_out, seed=5)
    state = _state(t)
    rng = np.random.RandomState(4)
    for w in range(n_way):
        p = f"model.models.{w}."
        state[f"{p}mean_module.raw_constant"] = np.float32(rng.randn() * 0.1)
        state[f"{p}covar_module.raw_outputscale"] = np.float32(rng.randn())
        # LikelihoodList duplicates + fixed noise keys also present
        state[f"{p}likelihood.noise_covar.raw_noise"] = np.float32(-2.0)
    return t, state


def test_dkt_full_import_forward_and_gp():
    from deep_kernel_transfer_tpu.methods import DKT

    t, state = _dkt_torch_state()
    model = DKT(B.Conv4(), n_way=5, n_support=5, kernel_type="bncossim",
                feature_dtype="float32")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((5, 6, 84, 84, 3), jnp.float32)).params
    new = TI.import_dkt(state, model, params, image_size=84)

    # feature forward parity incl. the permuted bn_out
    x = np.random.RandomState(5).randn(4, 3, 84, 84).astype(np.float32)
    ref = _forward_torch(t, x)  # trunk incl. bn_out, CHW order
    got = np.asarray(model.feature.apply(
        {"params": new["feature"]["params"],
         "batch_stats": new["feature"]["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False))
    perm = TI.chw_to_hwc_perm(5, 5, 64)
    np.testing.assert_allclose(got, ref[:, perm], rtol=1e-3, atol=1e-3)

    # gp scalars: stacked per way, raw values carried over directly
    for w in range(5):
        assert np.isclose(float(new["gp"]["mean"]["constant"][w]),
                          float(state[f"model.models.{w}.mean_module.raw_constant"]))
        assert np.isclose(float(new["gp"]["kernel"]["raw_outputscale"][w]),
                          float(state[f"model.models.{w}.covar_module.raw_outputscale"]))

    # end-to-end: scores run and are finite
    ep = np.random.RandomState(6).rand(5, 6, 84, 84, 3).astype(np.float32)
    scores = np.asarray(model.episode_scores(new, jnp.asarray(ep)))
    assert np.all(np.isfinite(scores))


def test_baseline_pp_head_import():
    from deep_kernel_transfer_tpu.methods import BaselineTrain

    class TBaselinePP(tnn.Module):
        def __init__(self, num_class=20):
            super().__init__()
            self.feature = TConvNet(4)
            L = tnn.Linear(1600, num_class, bias=False)
            self.L = L  # WeightNorm'd cosine head (reference backbone.py:22-44)
            torch.nn.utils.weight_norm(self.L, "weight", dim=0)

        def forward(self, x):
            z = self.feature(x)
            z = z / (z.norm(dim=1, keepdim=True) + 1e-5)
            return 2.0 * self.L(z)

    t = _randomize(TBaselinePP(), seed=7)
    with torch.no_grad():  # randomise the weight-norm g away from init
        t.L.parametrizations.weight.original0.uniform_(0.5, 1.5) \
            if hasattr(t.L, "parametrizations") else t.L.weight_g.uniform_(0.5, 1.5)
    state = {}
    for k, v in t.state_dict().items():
        if k.startswith("L."):
            # old-style WeightNorm key names, as the reference saves them
            k = ("classifier.L.weight_g" if "original0" in k or "weight_g" in k
                 else "classifier.L.weight_v")
        else:
            pass
        state[k] = v.detach().numpy()

    model = BaselineTrain(B.Conv4(), 20, loss_type="dist")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 84, 84, 3), jnp.float32)).params
    new = TI.import_baseline(state, model, params, image_size=84)

    x = np.random.RandomState(8).randn(3, 3, 84, 84).astype(np.float32)
    ref = _forward_torch(t, x)
    got = np.asarray(model.net.apply(new["net"],
                                     jnp.asarray(x.transpose(0, 2, 3, 1)),
                                     train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_dkt_regression_import_noise_conversion():
    from deep_kernel_transfer_tpu.gp.kernels import softplus as jsp
    from deep_kernel_transfer_tpu.methods import DKTRegression

    t = _randomize(TConv3(), seed=9)
    state = {"net." + k: v.detach().numpy() for k, v in t.state_dict().items()}
    state["gp.mean_module.raw_constant"] = np.float32(0.3)
    state["gp.covar_module.raw_outputscale"] = np.float32(-0.2)
    state["gp.covar_module.base_kernel.raw_lengthscale"] = (
        np.full((1, 1), 0.7, np.float32))
    state["likelihood.noise_covar.raw_noise"] = np.float32(-1.1)

    model = DKTRegression(B.Conv3(), feat_dim=2916, kernel_type="rbf")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((4, 100, 100, 3), jnp.float32)).params
    new = TI.import_dkt_regression(state, model, params)

    # gpytorch noise VALUE = softplus(raw) + 1e-4 must be reproduced
    want = np.logaddexp(0.0, -1.1) + 1e-4
    got = float(jsp(new["gp"]["likelihood"]["raw_noise"]))
    assert np.isclose(got, want, rtol=1e-5)
    assert np.isclose(float(new["gp"]["kernel"]["base"]["raw_lengthscale"]), 0.7)

    # trunk forward parity through the method's own feature path
    x = np.random.RandomState(9).randn(2, 3, 100, 100).astype(np.float32)
    ref = _forward_torch(t, x)
    got_z = np.asarray(model._features(new, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                       train=False))
    perm = TI.chw_to_hwc_perm(9, 9, 36)
    np.testing.assert_allclose(got_z, ref[:, perm], rtol=1e-4, atol=1e-4)


def test_detection_and_epoch(tmp_path):
    from deep_kernel_transfer_tpu.utils.checkpoint import save_checkpoint

    tfile = os.path.join(tmp_path, "torch.tar")
    torch.save({"epoch": 7, "state": {"w": torch.ones(2)}}, tfile)
    nfile = os.path.join(tmp_path, "ours.tar")
    save_checkpoint(nfile, {"w": np.ones(2, np.float32)}, epoch=3)

    assert TI.is_torch_checkpoint(tfile)
    assert not TI.is_torch_checkpoint(nfile)
    state, epoch = TI.load_torch_state(tfile)
    assert epoch == 7 and np.allclose(state["w"], 1.0)


def test_maml_import_forward_parity():
    """MAML: trunk + classifier head; BN always in batch-stats mode
    (reference BatchNorm2d_fw) on both sides."""
    from deep_kernel_transfer_tpu.methods import MAML

    class TMAML(tnn.Module):
        def __init__(self, n_way=5):
            super().__init__()
            self.feature = TConvNet(4)
            self.classifier = tnn.Linear(1600, n_way)

        def forward(self, x):
            return self.classifier(self.feature(x))

    t = _randomize(TMAML(), seed=20)
    state = {k: v.detach().numpy() for k, v in t.state_dict().items()}

    model = MAML(B.Conv4(), n_way=5, n_support=5)
    params = model.init_params(jax.random.PRNGKey(0),
                               jnp.zeros((5, 6, 84, 84, 3), jnp.float32))
    new = TI.import_maml(state, model, params, image_size=84)

    x = np.random.RandomState(20).randn(8, 3, 84, 84).astype(np.float32)
    t.train()  # batch-stats BN, like MAMLNet's always-train trunk
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    got, _ = model.net.apply(new["net"], jnp.asarray(x.transpose(0, 2, 3, 1)),
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


def test_relationnet_import_scores_parity():
    """RelationNet: NP trunk + relation scorer, eval mode end to end
    (reference relationnet.py:24-39 set_forward)."""
    from deep_kernel_transfer_tpu.methods import RelationNet

    class TRelationConvBlock(tnn.Module):
        def __init__(self, indim, outdim, padding=0):
            super().__init__()
            self.C = tnn.Conv2d(indim, outdim, 3, padding=padding)
            self.BN = tnn.BatchNorm2d(outdim, momentum=1)
            self.trunk = tnn.Sequential(self.C, self.BN, tnn.ReLU(),
                                        tnn.MaxPool2d(2))

        def forward(self, x):
            return self.trunk(x)

    class TRelationModule(tnn.Module):
        def __init__(self, input_size, hidden_size=8):
            super().__init__()
            c, h, w = input_size
            padding = 1 if (h < 10 and w < 10) else 0
            self.layer1 = TRelationConvBlock(c * 2, c, padding)
            self.layer2 = TRelationConvBlock(c, c, padding)
            shrink = lambda s: ((s - 2 + 2 * padding) // 2 - 2
                                + 2 * padding) // 2
            self.fc1 = tnn.Linear(c * shrink(h) * shrink(w), hidden_size)
            self.fc2 = tnn.Linear(hidden_size, 1)

        def forward(self, x):
            out = self.layer2(self.layer1(x))
            out = out.reshape(out.size(0), -1)
            return torch.sigmoid(self.fc2(torch.relu(self.fc1(out))))

    class TConvNetNP(tnn.Module):
        """reference ConvNetNopool (backbone.py:270-280): pool + VALID
        padding only in the first two blocks."""

        def __init__(self, depth=4):
            super().__init__()
            self.trunk = tnn.Sequential(*[
                TConvBlock(3 if i == 0 else 64, 64, pool=(i in (0, 1)),
                           padding=0 if i in (0, 1) else 1)
                for i in range(depth)
            ])

        def forward(self, x):
            return self.trunk(x)

    n_way, n_support, n_query = 3, 2, 2
    trunk = _randomize(TConvNetNP(), seed=21)
    rel = _randomize(TRelationModule((64, 19, 19)), seed=22)
    state = {**{"feature." + k: v.detach().numpy()
                for k, v in trunk.state_dict().items()},
             **{"relation_module." + k: v.detach().numpy()
                for k, v in rel.state_dict().items()}}

    model = RelationNet(B.Conv4NP(), feat_shape=(19, 19, 64), n_way=n_way,
                        n_support=n_support, feature_dtype="float32")
    params = model.init_params(jax.random.PRNGKey(0),
                               jnp.zeros((n_way, n_support + n_query,
                                          84, 84, 3), jnp.float32))
    new = TI.import_relationnet(state, model, params)

    ep = np.random.RandomState(21).rand(
        n_way, n_support + n_query, 84, 84, 3).astype(np.float32)

    # torch reference set_forward, eval mode
    trunk.eval(); rel.eval()
    with torch.no_grad():
        x = torch.from_numpy(
            ep.reshape(-1, 84, 84, 3).transpose(0, 3, 1, 2).copy())
        z = trunk(x).reshape(n_way, n_support + n_query, 64, 19, 19)
        z_proto = z[:, :n_support].mean(1)  # [n_way, C, H, W]
        z_query = z[:, n_support:].reshape(-1, 64, 19, 19)
        m = z_query.size(0)
        proto_ext = z_proto.unsqueeze(0).expand(m, n_way, 64, 19, 19)
        query_ext = z_query.unsqueeze(1).expand(m, n_way, 64, 19, 19)
        pairs = torch.cat((proto_ext, query_ext), 2).reshape(-1, 128, 19, 19)
        ref = rel(pairs).reshape(m, n_way).numpy()

    got = np.asarray(model.episode_scores(new, jnp.asarray(ep)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_matchingnet_import_scores_parity():
    """MatchingNet: trunk + bi-LSTM G encoder + FCE attention cell, against
    a torch replica of reference matchingnet.py:25-58 (logprobs)."""
    from deep_kernel_transfer_tpu.methods import MatchingNet

    n_way, n_support, n_query = 3, 2, 2
    trunk = _randomize(TConvNet(4), seed=23)
    D = 1600
    g_enc = tnn.LSTM(D, D, 1, batch_first=True, bidirectional=True)
    fce_cell = tnn.LSTMCell(2 * D, D)
    g = torch.Generator().manual_seed(24)
    with torch.no_grad():
        for p in list(g_enc.parameters()) + list(fce_cell.parameters()):
            p.normal_(0, 0.05, generator=g)
    state = {**{"feature." + k: v.detach().numpy()
                for k, v in trunk.state_dict().items()},
             **{"G_encoder." + k: v.detach().numpy()
                for k, v in g_enc.state_dict().items()},
             **{"FCE.lstmcell." + k: v.detach().numpy()
                for k, v in fce_cell.state_dict().items()}}

    model = MatchingNet(B.Conv4(), feat_dim=D, n_way=n_way,
                        n_support=n_support, feature_dtype="float32")
    params = model.init_params(jax.random.PRNGKey(0),
                               jnp.zeros((n_way, n_support + n_query,
                                          84, 84, 3), jnp.float32))
    new = TI.import_matchingnet(state, model, params, image_size=84)

    ep = np.random.RandomState(23).rand(
        n_way, n_support + n_query, 84, 84, 3).astype(np.float32)

    # torch replica of encode_training_set + FCE + get_logprobs (eval)
    trunk.eval()
    with torch.no_grad():
        x = torch.from_numpy(
            ep.reshape(-1, 84, 84, 3).transpose(0, 3, 1, 2).copy())
        z = trunk(x).reshape(n_way, n_support + n_query, D)
        S = z[:, :n_support].reshape(n_way * n_support, D)
        f = z[:, n_support:].reshape(-1, D)
        out_G = g_enc(S.unsqueeze(0))[0].squeeze(0)
        G = S + out_G[:, :D] + out_G[:, D:]
        G_n = G / (G.norm(dim=1, keepdim=True) + 1e-5)
        h, c = f, torch.zeros_like(f)
        for _ in range(G.size(0)):
            a = torch.softmax(h @ G.t(), dim=-1)
            r = a @ G
            h, c = fce_cell(torch.cat((f, r), 1), (h, c))
            h = h + f
        F_n = h / (h.norm(dim=1, keepdim=True) + 1e-5)
        scores = torch.relu(F_n @ G_n.t()) * 100
        y_s = torch.from_numpy(np.repeat(range(n_way), n_support))
        Y_S = torch.eye(n_way)[y_s]
        ref = (torch.softmax(scores, dim=-1) @ Y_S + 1e-6).log().numpy()

    got = np.asarray(model.episode_scores(new, jnp.asarray(ep)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_feature_transfer_import_parity():
    """FeatureTransfer regression: {'feature_extractor','model'} layout
    (reference feature_transfer_regression.py:82-83)."""
    from deep_kernel_transfer_tpu.methods.feature_transfer import (
        FeatureTransfer,
    )

    trunk = _randomize(TConv3(), seed=25)
    head = _randomize(tnn.Linear(2916, 1), seed=26)
    blob = {"feature_extractor": trunk.state_dict(),
            "model": {"layer4." + k: v for k, v in head.state_dict().items()}}

    ft = FeatureTransfer(B.Conv3())
    st = ft.init(jax.random.PRNGKey(0), jnp.zeros((2, 100, 100, 3)))

    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".tar", delete=False) as fh:
        torch.save(blob, fh.name)
        path = fh.name
    assert TI.is_torch_checkpoint(path)
    new, _ = TI.import_method_checkpoint(path, "transfer", ft, st.params, 100)
    os.unlink(path)

    x = np.random.RandomState(25).randn(3, 3, 100, 100).astype(np.float32)
    trunk.eval(); head.eval()
    with torch.no_grad():
        ref = head(trunk(torch.from_numpy(x)))[:, 0].numpy()
    got = np.asarray(ft.net.apply(new["net"],
                                  jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_load_backbone_from_torch_and_npz(tmp_path):
    """Warm-start grafting (utils/checkpoint.load_backbone_from) from BOTH a
    reference torch baseline checkpoint and this repo's own npz payload,
    into a DKT target tree (trunk nested under feature/backbone)."""
    from deep_kernel_transfer_tpu.methods import DKT, BaselineTrain
    from deep_kernel_transfer_tpu.utils.checkpoint import (
        load_backbone_from,
        save_checkpoint,
    )

    model = DKT(B.Conv4(), n_way=3, n_support=2, kernel_type="rbf",
                feature_dtype="float32")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((3, 4, 84, 84, 3), jnp.float32)).params

    # torch baseline: reference layout, feature.-prefixed trunk keys
    t = _randomize(TConvNet(4), seed=30)
    tfile = os.path.join(tmp_path, "best_model.tar")
    torch.save({"epoch": 5, "state": {k: torch.as_tensor(v)
                                      for k, v in _state(t).items()}}, tfile)
    new = load_backbone_from(tfile, params, backbone=B.Conv4())
    want = t.trunk[0].C.weight.detach().numpy().transpose(2, 3, 1, 0)
    got = new["feature"]["params"]["backbone"]["ConvBlock_0"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    want_var = t.trunk[2].BN.running_var.detach().numpy()
    got_var = new["feature"]["batch_stats"]["backbone"]["ConvBlock_2"][
        "EpisodicBatchNorm_0"]["var"]
    np.testing.assert_allclose(np.asarray(got_var), want_var, rtol=1e-6)
    # non-trunk leaves untouched
    np.testing.assert_array_equal(np.asarray(new["gp"]["mean"]["constant"]),
                                  np.asarray(params["gp"]["mean"]["constant"]))
    # torch ckpt without the backbone module is an explicit error
    with pytest.raises(ValueError, match="requires the flax backbone"):
        load_backbone_from(tfile, params)

    # npz: our own BaselineTrain checkpoint grafts the same way
    bl = BaselineTrain(B.Conv4(), 10)
    bl_params = bl.init(jax.random.PRNGKey(1),
                        jnp.zeros((2, 84, 84, 3), jnp.float32)).params
    nfile = os.path.join(tmp_path, "90.tar")
    save_checkpoint(nfile, bl_params, epoch=90)
    new2 = load_backbone_from(nfile, params)
    np.testing.assert_allclose(
        np.asarray(new2["feature"]["params"]["backbone"]["ConvBlock_0"]
                   ["Conv_0"]["kernel"]),
        np.asarray(bl_params["net"]["params"]["backbone"]["ConvBlock_0"]
                   ["Conv_0"]["kernel"]), rtol=1e-6)


def test_legacy_torch_checkpoint_detection(tmp_path):
    """Pre-torch-1.6 (non-zip pickle) checkpoints route to the torch
    importer too — this repo's own payloads are always zips."""
    lfile = os.path.join(tmp_path, "legacy.tar")
    torch.save({"epoch": 3, "state": {"w": torch.ones(2)}}, lfile,
               _use_new_zipfile_serialization=False)
    assert TI.is_torch_checkpoint(lfile)
    state, epoch = TI.load_torch_state(lfile)
    assert epoch == 3 and np.allclose(state["w"], 1.0)


# -- export round trips (utils/torch_export.py) ----------------------------


def _tree_allclose(a, b, rtol=1e-5, atol=1e-5):
    la = jax.tree_util.tree_flatten_with_path(a)[0]
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for (p, x), y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(p))


def test_export_roundtrip_dkt_bncossim():
    from deep_kernel_transfer_tpu.methods import DKT
    from deep_kernel_transfer_tpu.utils import torch_export as TE

    model = DKT(B.Conv4(), n_way=3, n_support=2, kernel_type="bncossim",
                feature_dtype="float32")
    x = jnp.zeros((3, 4, 84, 84, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x).params
    template = model.init(jax.random.PRNGKey(7), x).params  # different seed

    state = TE.export_method_state("DKT", model, params, 84)
    # gpytorch registers raw_noise with shape [1] (HomoskedasticNoise,
    # empty batch_shape); any other shape fails the reference's
    # load_state_dict with a size mismatch
    assert np.asarray(
        state["likelihood.likelihoods.0.noise_covar.raw_noise"]).shape == (1,)
    back = TI.import_dkt(state, model, template, 84)
    _tree_allclose(params, back)


def test_export_roundtrip_baseline_pp_and_maml():
    from deep_kernel_transfer_tpu.methods import MAML, BaselineTrain
    from deep_kernel_transfer_tpu.utils import torch_export as TE

    bl = BaselineTrain(B.Conv4(), 10, loss_type="dist")
    xb = jnp.zeros((2, 84, 84, 3), jnp.float32)
    params = bl.init(jax.random.PRNGKey(0), xb).params
    template = bl.init(jax.random.PRNGKey(7), xb).params
    back = TI.import_baseline(
        TE.export_method_state("baseline++", bl, params, 84),
        bl, template, 84)
    _tree_allclose(params, back)

    mm = MAML(B.Conv4(), n_way=3, n_support=2)
    xe = jnp.zeros((3, 4, 84, 84, 3), jnp.float32)
    params = mm.init_params(jax.random.PRNGKey(0), xe)
    template = mm.init_params(jax.random.PRNGKey(7), xe)
    back = TI.import_maml(
        TE.export_method_state("maml", mm, params, 84), mm, template, 84)
    _tree_allclose(params, back)


def test_export_roundtrip_matchingnet_relationnet():
    from deep_kernel_transfer_tpu.methods import MatchingNet, RelationNet
    from deep_kernel_transfer_tpu.utils import torch_export as TE

    mn = MatchingNet(B.Conv4(), feat_dim=1600, n_way=3, n_support=2,
                     feature_dtype="float32")
    xe = jnp.zeros((3, 4, 84, 84, 3), jnp.float32)
    params = mn.init_params(jax.random.PRNGKey(0), xe)
    template = mn.init_params(jax.random.PRNGKey(7), xe)
    back = TI.import_matchingnet(
        TE.export_method_state("matchingnet", mn, params, 84),
        mn, template, 84)
    _tree_allclose(params, back)

    rn = RelationNet(B.Conv4NP(), feat_shape=(19, 19, 64), n_way=3,
                     n_support=2, feature_dtype="float32")
    params = rn.init_params(jax.random.PRNGKey(0), xe)
    template = rn.init_params(jax.random.PRNGKey(7), xe)
    back = TI.import_relationnet(
        TE.export_method_state("relationnet", rn, params, 84),
        rn, template)
    _tree_allclose(params, back)


def test_export_roundtrip_regression_methods(tmp_path):
    """DKT spectral regression (ARD perms + noise constraint inverse) and
    FeatureTransfer, through the FILE layer both ways."""
    from deep_kernel_transfer_tpu.methods import DKTRegression
    from deep_kernel_transfer_tpu.methods.feature_transfer import (
        FeatureTransfer,
    )
    from deep_kernel_transfer_tpu.utils import torch_export as TE

    model = DKTRegression(B.Conv3(), feat_dim=2916, kernel_type="spectral")
    x = jnp.zeros((4, 100, 100, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x).params
    template = model.init(jax.random.PRNGKey(7), x).params
    f = os.path.join(tmp_path, "reg.tar")
    TE.export_method_checkpoint(f, "DKT_regression_spectral", model,
                                params, 100)
    assert TI.is_torch_checkpoint(f)
    back, _ = TI.import_method_checkpoint(
        f, "DKT_regression_spectral", model, template, 100)
    _tree_allclose(params, back)

    ft = FeatureTransfer(B.Conv3())
    st = ft.init(jax.random.PRNGKey(0), x)
    st2 = ft.init(jax.random.PRNGKey(7), x)
    f2 = os.path.join(tmp_path, "ft.tar")
    TE.export_method_checkpoint(f2, "transfer", ft, st.params, 100)
    back, _ = TI.import_method_checkpoint(f2, "transfer", ft, st2.params, 100)
    _tree_allclose(st.params, back)


def test_flatten_perm_pooled_vs_reshaped_trunks():
    """Pooled trunks (ResNet global avg pool) emit channel-ordered features
    on BOTH sides, so the flatten perm is the identity even though the
    pre-pool map has h*w > 1; reshape-flattened ConvNets need the CHW
    permutation. (Indexing a [C]-sized head with an h*w*C perm crashed
    every ResNet head import before this law existed.)"""
    perm = TI.flatten_perm(B.ResNet10(), 56)  # pre-pool map 2x2x512
    np.testing.assert_array_equal(perm, np.arange(512))
    perm224 = TI.flatten_perm(B.ResNet10(), 224)  # pre-pool 7x7x512
    np.testing.assert_array_equal(perm224, np.arange(512))
    conv_perm = TI.flatten_perm(B.Conv4(), 84)  # reshape flatten: 5x5x64
    assert conv_perm.shape == (5 * 5 * 64,)
    assert not np.array_equal(conv_perm, np.arange(conv_perm.shape[0]))


def test_export_roundtrip_baseline_resnet10():
    """Head import/export for a POOLED trunk (the ResNet crash case):
    baseline round trip at 56px where the pre-pool map is 2x2x512."""
    from deep_kernel_transfer_tpu.methods import BaselineTrain
    from deep_kernel_transfer_tpu.utils import torch_export as TE

    bl = BaselineTrain(B.ResNet10(), 6, loss_type="softmax")
    xb = jnp.zeros((2, 56, 56, 3), jnp.float32)
    params = bl.init(jax.random.PRNGKey(0), xb).params
    template = bl.init(jax.random.PRNGKey(7), xb).params
    back = TI.import_baseline(
        TE.export_method_state("baseline", bl, params, 56),
        bl, template, 56)
    _tree_allclose(params, back)
