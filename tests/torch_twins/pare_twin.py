"""Reference-spec torch twin of PARE (HRNet-W32-conv + part-attention head)
for weight-port parity tests.

Independent PyTorch implementation written to the reference's architecture
spec (lib/pare/pare/models/backbone/hrnet.py with DOWNSAMPLE=False,
USE_CONV=True; lib/pare/pare/models/head/pare_head.py with
use_heatmaps='part_segm', use_keypoint_attention=True,
iterative_regression=False) with the reference's state-dict naming
(``backbone.*`` / ``head.*``), so its ``state_dict()`` matches the
published PARE checkpoint's layout for
``icon_tpu.models.pare.convert.port_pare``.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

BN_MOM = 0.1


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, planes):
        super().__init__()
        self.conv1 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes, momentum=BN_MOM)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes, momentum=BN_MOM)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + x)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes, momentum=BN_MOM)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes, momentum=BN_MOM)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4, momentum=BN_MOM)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class HRModule(nn.Module):
    def __init__(self, channels, num_blocks=4):
        super().__init__()
        n = len(channels)
        self.branches = nn.ModuleList([
            nn.Sequential(*[BasicBlock(channels[b])
                            for _ in range(num_blocks)])
            for b in range(n)])
        fuse = []
        for i in range(n):
            row = []
            for j in range(n):
                if j > i:
                    row.append(nn.Sequential(
                        nn.Conv2d(channels[j], channels[i], 1, bias=False),
                        nn.BatchNorm2d(channels[i], momentum=BN_MOM),
                        nn.Upsample(scale_factor=2 ** (j - i),
                                    mode="nearest")))
                elif j < i:
                    steps = []
                    for s in range(i - j):
                        last = s == i - j - 1
                        cout = channels[i] if last else channels[j]
                        sub = [nn.Conv2d(channels[j], cout, 3, stride=2,
                                         padding=1, bias=False),
                               nn.BatchNorm2d(cout, momentum=BN_MOM)]
                        if not last:
                            sub.append(nn.ReLU(inplace=True))
                        steps.append(nn.Sequential(*sub))
                    row.append(nn.Sequential(*steps))
                else:
                    row.append(None)
            fuse.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse)
        self.relu = nn.ReLU(True)

    def forward(self, xs):
        outs = [br(x) for br, x in zip(self.branches, xs)]
        fused = []
        for i, row in enumerate(self.fuse_layers):
            acc = None
            for j, f in enumerate(row):
                h = outs[j] if f is None else f(outs[j])
                acc = h if acc is None else acc + h
            fused.append(self.relu(acc))
        return fused


class HRNetTwin(nn.Module):
    """PoseHighResolutionNet, '-conv' aggregation (upsample_stage_*)."""

    def __init__(self, width=32, stage_modules=(1, 4, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(64, momentum=BN_MOM)
        self.conv2 = nn.Conv2d(64, 64, 3, stride=2, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(64, momentum=BN_MOM)
        self.relu = nn.ReLU(inplace=True)
        ds = nn.Sequential(nn.Conv2d(64, 256, 1, bias=False),
                           nn.BatchNorm2d(256, momentum=BN_MOM))
        self.layer1 = nn.Sequential(
            Bottleneck(64, 64, ds), Bottleneck(256, 64),
            Bottleneck(256, 64), Bottleneck(256, 64))

        w = width
        widths = (w, 2 * w, 4 * w, 8 * w)
        self.transition1 = nn.ModuleList([
            nn.Sequential(nn.Conv2d(256, widths[0], 3, padding=1,
                                    bias=False),
                          nn.BatchNorm2d(widths[0], momentum=BN_MOM),
                          nn.ReLU(inplace=True)),
            nn.Sequential(nn.Sequential(
                nn.Conv2d(256, widths[1], 3, stride=2, padding=1,
                          bias=False),
                nn.BatchNorm2d(widths[1], momentum=BN_MOM),
                nn.ReLU(inplace=True)))])
        self.stage2 = nn.Sequential(*[HRModule(widths[:2])
                                      for _ in range(stage_modules[0])])
        self.transition2 = nn.ModuleList([None, None, nn.Sequential(
            nn.Sequential(nn.Conv2d(widths[1], widths[2], 3, stride=2,
                                    padding=1, bias=False),
                          nn.BatchNorm2d(widths[2], momentum=BN_MOM),
                          nn.ReLU(inplace=True)))])
        self.stage3 = nn.Sequential(*[HRModule(widths[:3])
                                      for _ in range(stage_modules[1])])
        self.transition3 = nn.ModuleList([None, None, None, nn.Sequential(
            nn.Sequential(nn.Conv2d(widths[2], widths[3], 3, stride=2,
                                    padding=1, bias=False),
                          nn.BatchNorm2d(widths[3], momentum=BN_MOM),
                          nn.ReLU(inplace=True)))])
        self.stage4 = nn.Sequential(*[HRModule(widths)
                                      for _ in range(stage_modules[2])])

        def make_up(num_layers, ch):
            layers = []
            for _ in range(num_layers):
                layers += [nn.Upsample(scale_factor=2, mode="bilinear",
                                       align_corners=True),
                           nn.Conv2d(ch, ch, 3, padding=1, bias=False),
                           nn.BatchNorm2d(ch, momentum=BN_MOM),
                           nn.ReLU(inplace=True)]
            return nn.Sequential(*layers)

        self.upsample_stage_2 = make_up(1, widths[1])
        self.upsample_stage_3 = make_up(2, widths[2])
        self.upsample_stage_4 = make_up(3, widths[3])

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [self.transition1[0](x), self.transition1[1](x)]
        xs = list(self.stage2(xs))
        xs = xs + [self.transition2[2](xs[-1])]
        xs = list(self.stage3(xs))
        xs = xs + [self.transition3[3](xs[-1])]
        xs = list(self.stage4(xs))
        x1 = self.upsample_stage_2(xs[1])
        x2 = self.upsample_stage_3(xs[2])
        x3 = self.upsample_stage_4(xs[3])
        return torch.cat([xs[0], x1, x2, x3], 1)


class LocallyConnected2d(nn.Module):
    def __init__(self, in_channels, out_channels, output_size):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(
            1, out_channels, in_channels, output_size[0], output_size[1], 1))

    def forward(self, x):
        # x [B, C, J, 1] -> out [B, O, J, 1]
        x = x.unfold(2, 1, 1).unfold(3, 1, 1)
        x = x.contiguous().view(*x.size()[:-2], -1)
        return (x.unsqueeze(1) * self.weight).sum([2, -1])


class KeypointAttention(nn.Module):
    def forward(self, features, heatmaps):
        B, J, H, W = heatmaps.shape
        attn = F.softmax(heatmaps.reshape(B, J, -1), dim=-1)
        feats = features.reshape(B, -1, H * W)
        out = torch.matmul(attn, feats.transpose(2, 1))
        return out.transpose(2, 1)                     # [B, C, J]


class PareHeadTwin(nn.Module):
    def __init__(self, in_ch=480, num_joints=24, smpl_final_dim=64,
                 filters=(256, 256, 256)):
        super().__init__()

        def conv_branch():
            layers, c = [], in_ch
            for f in filters:
                layers += [nn.Conv2d(c, f, 3, padding=1, bias=False),
                           nn.BatchNorm2d(f, momentum=BN_MOM),
                           nn.ReLU(inplace=True)]
                c = f
            return nn.Sequential(*layers)

        self.keypoint_deconv_layers = conv_branch()
        self.smpl_deconv_layers = conv_branch()
        self.keypoint_final_layer = nn.Conv2d(filters[-1], num_joints + 1, 1)
        self.smpl_final_layer = nn.Conv2d(filters[-1], smpl_final_dim, 1)
        self.keypoint_attention = KeypointAttention()
        self.pose_mlp = LocallyConnected2d(filters[-1], 6, [num_joints, 1])
        self.shape_mlp = nn.Linear(num_joints * smpl_final_dim, 10)
        self.cam_mlp = nn.Linear(num_joints * smpl_final_dim, 3)

    def forward(self, features):
        part_feats = self.keypoint_deconv_layers(features)
        segm = self.keypoint_final_layer(part_feats)
        part_attention = segm[:, 1:]
        smpl_feats = self.smpl_deconv_layers(features)
        cam_shape_feats = self.smpl_final_layer(smpl_feats)
        point_local_feat = self.keypoint_attention(smpl_feats,
                                                   part_attention)
        cam_shape = self.keypoint_attention(cam_shape_feats, part_attention)
        pred_pose = self.pose_mlp(point_local_feat.unsqueeze(-1))
        flat = torch.flatten(cam_shape, start_dim=1)
        pred_shape = self.shape_mlp(flat)
        pred_cam = self.cam_mlp(flat)
        pred_pose = pred_pose.squeeze(-1).transpose(2, 1)  # [B, J, 6]
        return pred_pose, pred_shape, pred_cam, segm


class PARETwin(nn.Module):
    def __init__(self, width=32, stage_modules=(1, 4, 3), num_joints=24):
        super().__init__()
        self.backbone = HRNetTwin(width, stage_modules)
        self.head = PareHeadTwin(in_ch=15 * width, num_joints=num_joints)

    def forward(self, x):
        return self.head(self.backbone(x))
