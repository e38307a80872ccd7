"""Reference-spec torch twin of HybrIK's learned graph for weight-port
parity tests.

Independent PyTorch implementation written to the reference's architecture
spec (lib/hybrik/models/simple3dpose.py:42-330 HybrIKBaseSMPLCam: ResNet-34
``preact``, deconv pyramid, 3D-heatmap soft-argmax, camera back-projection,
fc heads with the h36m mean-shape buffer) with the reference's state-dict
naming, so its ``state_dict()`` matches ``pretrained_w_cam.pth``'s layout
for ``icon_tpu.models.hybrik.convert.port_hybrik``. Ends at the IK inputs
(xyz / phi / shape / cam) — the analytical IK and SMPL decode carry no
ported weights.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idt)


class ResNetBasicTwin(nn.Module):
    """torchvision-style BasicBlock ResNet (resnet34 layout)."""

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

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes))
        layers = [BasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        layers += [BasicBlock(planes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


class HybrIKTwin(nn.Module):
    def __init__(self, width=64, layers=(3, 4, 6, 3), num_joints=29,
                 depth_dim=64, heatmap_size=64, deconv_dim=(256, 256, 256),
                 focal_length=1000.0, input_size=256.0):
        super().__init__()
        self.num_joints = num_joints
        self.depth_dim = depth_dim
        self.heatmap_size = heatmap_size
        self.focal_length = focal_length
        self.input_size = input_size
        self.preact = ResNetBasicTwin(layers, width)
        feat_ch = width * 8
        mods, c = [], feat_ch
        for d in deconv_dim:
            mods += [nn.ConvTranspose2d(c, d, 4, stride=2, padding=1,
                                        bias=False),
                     nn.BatchNorm2d(d), nn.ReLU(inplace=True)]
            c = d
        self.deconv_layers = nn.Sequential(*mods)
        self.final_layer = nn.Conv2d(deconv_dim[-1],
                                     num_joints * depth_dim, 1)
        self.register_buffer("init_shape",
                             torch.randn(10) * 0.1)
        self.register_buffer("init_cam", torch.tensor([0.9, 0.0, 0.0]))
        self.fc1 = nn.Linear(feat_ch, 1024)
        self.fc2 = nn.Linear(1024, 1024)
        self.decshape = nn.Linear(1024, 10)
        self.decphi = nn.Linear(1024, 23 * 2)
        self.deccam = nn.Linear(1024, 3)

    def forward(self, x):
        B = x.shape[0]
        x0 = self.preact(x)
        out = self.final_layer(self.deconv_layers(x0))
        out = out.reshape(B, self.num_joints, -1)
        out = F.softmax(out, dim=2)
        heatmaps = out / out.sum(dim=2, keepdim=True)
        heatmaps = heatmaps.reshape(B, self.num_joints, self.depth_dim,
                                    self.heatmap_size, self.heatmap_size)
        rng_s = torch.arange(self.heatmap_size, dtype=torch.float32)
        rng_d = torch.arange(self.depth_dim, dtype=torch.float32)
        coord_x = (heatmaps.sum((2, 3)) * rng_s).sum(2) \
            / self.heatmap_size - 0.5
        coord_y = (heatmaps.sum((2, 4)) * rng_s).sum(2) \
            / self.heatmap_size - 0.5
        coord_z = (heatmaps.sum((3, 4)) * rng_d).sum(2) \
            / self.depth_dim - 0.5
        uvd = torch.stack([coord_x, coord_y, coord_z], dim=2)

        xc = x0.mean(dim=(2, 3))
        xc = self.fc2(self.fc1(xc))
        pred_shape = self.decshape(xc) + self.init_shape[None]
        pred_phi = self.decphi(xc).reshape(B, 23, 2)
        pred_cam = self.deccam(xc) + self.init_cam[None]

        cam_scale = pred_cam[:, :1].unsqueeze(1)
        cam_trans = pred_cam[:, 1:].unsqueeze(1)
        cam_depth = self.focal_length / (self.input_size * cam_scale + 1e-9)
        xyz = torch.zeros_like(uvd)
        xyz[:, :, 2:] = uvd[:, :, 2:]
        xyz_m = (uvd[:, :, :2] * self.input_size / self.focal_length) \
            * (xyz[:, :, 2:] * 2.2 + cam_depth) - cam_trans
        xyz[:, :, :2] = xyz_m / 2.2
        xyz = xyz - xyz[:, [0]]
        return uvd, xyz, pred_shape, pred_phi, pred_cam
