"""Reference-spec torch twin of PyMAF, for weight-port parity tests.

An independent PyTorch implementation written to the reference's
architecture spec (lib/pymaf/models/pymaf_net.py, hmr.py, maf_extractor.py)
with the reference's *state-dict naming* — ``feature_extractor.*``,
``deconv_layers.{0..8}``, ``maf_extractor.{i}.conv{l}``,
``regressor.{i}.{fc1,fc2,decpose,decshape,deccam}`` — so its
``state_dict()`` looks exactly like the published PyMAF checkpoint to
``icon_tpu.models.pymaf.convert.port_pymaf``. The SMPL forward is injected
as a plain numpy callable shared with the flax net under test.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

NPOSE = 24 * 6


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class ResNetBackboneTwin(nn.Module):
    """hmr.py ResNet_Backbone: returns (s_feat [B,C,7,7], g_feat [B,C])."""

    def __init__(self, layers=(3, 4, 6, 3), width=64):
        super().__init__()
        self.inplanes = width
        self.conv1 = nn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(width, layers[0], 1)
        self.layer2 = self._make_layer(width * 2, layers[1], 2)
        self.layer3 = self._make_layer(width * 4, layers[2], 2)
        self.layer4 = self._make_layer(width * 8, layers[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        g = self.avgpool(x).flatten(1)
        return x, g


class MAFExtractorTwin(nn.Module):
    """maf_extractor.py MAF_Extractor minus the asset loading; Conv1d MLP
    with input-skip concat, c-major flatten."""

    def __init__(self, mlp_dims=(256, 128, 64, 5)):
        super().__init__()
        self.n = len(mlp_dims) - 1
        for l in range(self.n):
            cin = mlp_dims[l] if l == 0 else mlp_dims[l] + mlp_dims[0]
            self.add_module(f"conv{l}", nn.Conv1d(cin, mlp_dims[l + 1], 1))

    def reduce_dim(self, feature):
        y = tmpy = feature                       # [B, C, N]
        for i in range(self.n):
            conv = getattr(self, f"conv{i}")
            y = conv(y if i == 0 else torch.cat([y, tmpy], 1))
            if i != self.n - 1:
                y = F.leaky_relu(y)
        y = F.relu(y)
        return y.reshape(y.shape[0], -1)         # c-major flatten

    def sampling(self, points, im_feat):
        """points [B, N, 2] in [-1,1]; im_feat [B, C, H, W]."""
        pf = F.grid_sample(im_feat, points.unsqueeze(2),
                           align_corners=True)[..., 0]
        return self.reduce_dim(pf)


class RegressorTwin(nn.Module):
    def __init__(self, feat_dim, mean_pose6d, mean_shape, mean_cam,
                 smpl_forward_np):
        super().__init__()
        self.fc1 = nn.Linear(feat_dim + NPOSE + 13, 1024)
        self.drop1 = nn.Dropout()
        self.fc2 = nn.Linear(1024, 1024)
        self.drop2 = nn.Dropout()
        self.decpose = nn.Linear(1024, NPOSE)
        self.decshape = nn.Linear(1024, 10)
        self.deccam = nn.Linear(1024, 3)
        self.register_buffer("init_pose",
                             torch.from_numpy(mean_pose6d[None]).float())
        self.register_buffer("init_shape",
                             torch.from_numpy(mean_shape[None]).float())
        self.register_buffer("init_cam",
                             torch.from_numpy(mean_cam[None]).float())
        self.smpl_forward_np = smpl_forward_np

    def _finish(self, pred_pose, pred_shape, pred_cam):
        B = pred_pose.shape[0]
        rotmat = rot6d_to_rotmat(pred_pose).reshape(B, 24, 3, 3)
        verts, joints = self.smpl_forward_np(pred_shape.detach().numpy(),
                                             rotmat.detach().numpy())
        return {
            "rotmat": rotmat,
            "verts": torch.from_numpy(np.asarray(verts)).float(),
            "smpl_kp_3d": torch.from_numpy(np.asarray(joints)).float(),
            "pred_cam": pred_cam,
            "pred_shape": pred_shape,
            "pred_pose": pred_pose,
        }

    def forward_init(self, batch_size):
        return self._finish(self.init_pose.expand(batch_size, -1),
                            self.init_shape.expand(batch_size, -1),
                            self.init_cam.expand(batch_size, -1))

    def forward(self, x, init_pose, init_shape, init_cam):
        xc = torch.cat([x, init_pose, init_shape, init_cam], 1)
        xc = self.drop1(self.fc1(xc))
        xc = self.drop2(self.fc2(xc))
        pred_pose = self.decpose(xc) + init_pose
        pred_shape = self.decshape(xc) + init_shape
        pred_cam = self.deccam(xc) + init_cam
        return self._finish(pred_pose, pred_shape, pred_cam)


def rot6d_to_rotmat(x):
    """geometry.py:229-247 (Gram-Schmidt over column pairs)."""
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[:, :, 0], x[:, :, 1]
    b1 = F.normalize(a1, dim=1)
    b2 = F.normalize(a2 - (b1 * a2).sum(1, keepdim=True) * b1, dim=1)
    b3 = torch.cross(b1, b2, dim=1)
    return torch.stack([b1, b2, b3], dim=-1)


def projection(points, cam, focal=5000.0, img_res=224.0):
    """geometry.py:246-264: perspective cam at tz = 2f/(res*s)."""
    s = cam[:, 0]
    tz = 2.0 * focal / (img_res * s + 1e-9)
    X = points[..., 0] + cam[:, None, 1]
    Y = points[..., 1] + cam[:, None, 2]
    Z = points[..., 2] + tz[:, None]
    return torch.stack([focal * X / Z, focal * Y / Z], -1) / (img_res / 2.0)


class PyMAFTwin(nn.Module):
    """Full reference-named PyMAF (eval-mode semantics)."""

    def __init__(self, smpl_forward_np, dmap, mean_pose6d, mean_shape,
                 mean_cam, width=64, layers=(3, 4, 6, 3), n_iter=3,
                 maf_dims=(256, 128, 64, 5), grid_size=21):
        super().__init__()
        self.n_iter = n_iter
        self.feature_extractor = ResNetBackboneTwin(layers, width)
        inplanes = width * 8 * 4
        seq = []
        for _ in range(n_iter):
            seq += [nn.ConvTranspose2d(inplanes, 256, 4, stride=2, padding=1,
                                       bias=False),
                    nn.BatchNorm2d(256, momentum=0.1),
                    nn.ReLU(inplace=True)]
            inplanes = 256
        self.deconv_layers = nn.Sequential(*seq)
        self.maf_extractor = nn.ModuleList(
            [MAFExtractorTwin(maf_dims) for _ in range(n_iter)])
        g = torch.linspace(-1, 1, grid_size)
        xv, yv = torch.meshgrid(g, g, indexing="ij")
        self.register_buffer(
            "points_grid",
            torch.stack([xv.reshape(-1), yv.reshape(-1)]).unsqueeze(0))
        grid_feat_len = grid_size * grid_size * maf_dims[-1]
        ma_feat_len = dmap.shape[0] * maf_dims[-1]
        self.regressor = nn.ModuleList([
            RegressorTwin(grid_feat_len if i == 0 else ma_feat_len,
                          mean_pose6d, mean_shape, mean_cam,
                          smpl_forward_np)
            for i in range(n_iter)])
        self.register_buffer("dmap", torch.from_numpy(dmap).float())

    def forward(self, x):
        B = x.shape[0]
        s_feat, g_feat = self.feature_extractor(x)
        blocks = [self.deconv_layers[0:3], self.deconv_layers[3:6],
                  self.deconv_layers[6:9]]
        out = self.regressor[0].forward_init(B)
        outs = [out]
        for i in range(self.n_iter):
            pred_cam = out["pred_cam"].detach()
            pred_shape = out["pred_shape"].detach()
            pred_pose = out["pred_pose"].detach()
            s_feat = blocks[i](s_feat)
            if i == 0:
                pts = self.points_grid.expand(B, -1, -1).transpose(1, 2)
                ref = self.maf_extractor[i].sampling(pts, s_feat)
            else:
                verts_ds = torch.matmul(self.dmap.unsqueeze(0),
                                        out["verts"].detach())
                pts = projection(verts_ds, pred_cam)
                ref = self.maf_extractor[i].sampling(pts, s_feat)
            out = self.regressor[i](ref, pred_pose, pred_shape, pred_cam)
            outs.append(out)
        return outs
