"""Reference-spec torch twin of PIXIE for weight-port parity tests.

Independent PyTorch implementation written to the reference's architecture
spec (lib/pixielib/pixie.py `_create_model`, models/encoders.py,
models/moderators.py, models/hrnet.py) with the published checkpoint's
layout — a dict of per-module state dicts keyed ``Encoder_body``,
``Encoder_{head,hand}``, ``Regressor_*``, ``Extractor_*``,
``Moderator_*`` — so ``modules_state()`` feeds
``icon_tpu.models.pixie.convert.port_pixie`` exactly like
``pixie_model.tar`` would. Reuses the HRNet trunk blocks from pare_twin
(same multi-resolution exchange structure and naming) and the
torchvision-style ResNet from pymaf_twin.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_twins.pare_twin import (BN_MOM, BasicBlock, Bottleneck,
                                         HRModule)
from tests.torch_twins.pymaf_twin import ResNetBackboneTwin

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class HeadBottleneck(nn.Module):
    """hrnet.py _make_conv_layer bottleneck: bare Conv2d downsample."""

    def __init__(self, inplanes, planes):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes, momentum=BN_MOM)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes, momentum=BN_MOM)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4, momentum=BN_MOM)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = nn.Conv2d(inplanes, planes * 4, 1, bias=False)

    def forward(self, x):
        idt = self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class PixieHRNetTwin(nn.Module):
    """HighResolutionNet with the PIXIE subsample+conv_layers 'concat'
    head (hrnet.py:207-293, 368-395, 431-490)."""

    def __init__(self, width=48, stem=64, feat_dim=2048,
                 stage_modules=(1, 4, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, stem, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(stem, momentum=BN_MOM)
        self.conv2 = nn.Conv2d(stem, stem, 3, stride=2, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(stem, momentum=BN_MOM)
        self.relu = nn.ReLU(inplace=True)
        ds = nn.Sequential(nn.Conv2d(stem, stem * 4, 1, bias=False),
                           nn.BatchNorm2d(stem * 4, momentum=BN_MOM))
        self.layer1 = nn.Sequential(
            Bottleneck(stem, stem, ds), Bottleneck(stem * 4, stem),
            Bottleneck(stem * 4, stem), Bottleneck(stem * 4, stem))

        w = width
        widths = (w, 2 * w, 4 * w, 8 * w)
        self.transition1 = nn.ModuleList([
            nn.Sequential(nn.Conv2d(stem * 4, widths[0], 3, padding=1,
                                    bias=False),
                          nn.BatchNorm2d(widths[0], momentum=BN_MOM),
                          nn.ReLU(inplace=True)),
            nn.Sequential(nn.Sequential(
                nn.Conv2d(stem * 4, widths[1], 3, stride=2, padding=1,
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

        def make_subsample(in_ch, num_layers):
            layers, c = [], in_ch
            for _ in range(num_layers):
                layers += [nn.Conv2d(c, 2 * c, 3, stride=2, padding=1),
                           nn.BatchNorm2d(2 * c, momentum=BN_MOM),
                           nn.ReLU(inplace=True)]
                c *= 2
            return nn.Sequential(*layers)

        self.subsample_4 = make_subsample(widths[0], 3)
        self.subsample_3 = make_subsample(widths[1], 2)
        self.subsample_2 = make_subsample(widths[2], 1)
        layers, c = [], 4 * widths[3]
        for _ in range(5):
            layers.append(HeadBottleneck(c, feat_dim // 4))
            c = feat_dim
        self.conv_layers = nn.Sequential(*layers)

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
        x4 = self.subsample_4(xs[0])
        x3 = self.subsample_3(xs[1])
        x2 = self.subsample_2(xs[2])
        xf = self.conv_layers(torch.cat([x4, x3, x2, xs[3]], 1))
        return xf.mean(dim=(2, 3))


class HRNEncoderTwin(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.encoder = PixieHRNetTwin(**kw)
        self.register_buffer(
            "MEAN", torch.tensor(IMAGENET_MEAN)[None, :, None, None])
        self.register_buffer(
            "STD", torch.tensor(IMAGENET_STD)[None, :, None, None])

    def forward(self, x):
        return self.encoder((x - self.MEAN) / self.STD)


class ResnetEncoderTwin(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3), width=64):
        super().__init__()
        self.encoder = ResNetBackboneTwin(layers=layers, width=width)
        self.register_buffer(
            "MEAN", torch.tensor(IMAGENET_MEAN)[None, :, None, None])
        self.register_buffer(
            "STD", torch.tensor(IMAGENET_STD)[None, :, None, None])

    def forward(self, x):
        _, g = self.encoder((x - self.MEAN) / self.STD)
        return g


class MLPTwin(nn.Module):
    """encoders.MLP: channels includes the input dim."""

    def __init__(self, channels):
        super().__init__()
        layers = []
        for l in range(len(channels) - 1):
            layers.append(nn.Linear(channels[l], channels[l + 1]))
            if l < len(channels) - 2:
                layers.append(nn.ReLU())
        self.layers = nn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


class ModeratorTwin(nn.Module):
    """moderators.TempSoftmaxFusion."""

    def __init__(self, channels):
        super().__init__()
        layers = []
        for l in range(len(channels) - 1):
            layers.append(nn.Linear(channels[l], channels[l + 1]))
            if l < len(channels) - 2:
                layers.append(nn.ReLU())
        self.layers = nn.Sequential(*layers)
        self.register_parameter("temperature",
                                nn.Parameter(torch.ones(1)))

    def forward(self, x, y):
        f = torch.cat([x, y], dim=1)
        w = F.softmax(self.layers(f) * self.temperature, dim=1)
        return w[:, [0]] * x + w[:, [1]] * y, w


class PIXIETwin(nn.Module):
    """The deployed inference graph (pixie.py encode, body branch,
    threthold=True, keep_local=True) over reference-named modules."""

    def __init__(self, feat_dim=2048, hr_width=48, hr_stem=64,
                 resnet_width=64, resnet_layers=(3, 4, 6, 3),
                 reg_channels=(1024,), share_channels=(1024, 1024),
                 mod_channels=(1024, 1024), n_shape=200, n_exp=50,
                 n_tex=50, n_light=27):
        super().__init__()
        self.layouts = {
            "body": {"body_cam": 3, "global_pose": 6,
                     "partbody_pose": 17 * 6, "neck_pose": 6},
            "head": {"head_cam": 3, "tex": n_tex, "light": n_light},
            "head_share": {"shape": n_shape, "exp": n_exp, "head_pose": 6,
                           "jaw_pose": 3},
            "hand": {"hand_cam": 3},
            "hand_share": {"right_wrist_pose": 6,
                           "right_hand_pose": 15 * 6},
        }
        self.mods = nn.ModuleDict({
            "Encoder_body": HRNEncoderTwin(width=hr_width, stem=hr_stem,
                                           feat_dim=feat_dim),
            "Encoder_head": ResnetEncoderTwin(resnet_layers, resnet_width),
            "Encoder_hand": ResnetEncoderTwin(resnet_layers, resnet_width),
            "Regressor_body": MLPTwin(
                (feat_dim,) + tuple(reg_channels)
                + (sum(self.layouts["body"].values()),)),
            "Regressor_head": MLPTwin(
                (feat_dim,) + tuple(reg_channels)
                + (sum(self.layouts["head"].values()),)),
            "Regressor_head_share": MLPTwin(
                (feat_dim,) + tuple(share_channels)
                + (sum(self.layouts["head_share"].values()),)),
            "Regressor_hand": MLPTwin(
                (feat_dim,) + tuple(reg_channels)
                + (sum(self.layouts["hand"].values()),)),
            "Regressor_hand_share": MLPTwin(
                (feat_dim,) + tuple(share_channels)
                + (sum(self.layouts["hand_share"].values()),)),
            "Extractor_head_share": MLPTwin((feat_dim, feat_dim)),
            "Extractor_left_hand_share": MLPTwin((feat_dim, feat_dim)),
            "Extractor_right_hand_share": MLPTwin((feat_dim, feat_dim)),
            "Moderator_head_share": ModeratorTwin(
                (feat_dim * 2,) + tuple(mod_channels) + (2,)),
            "Moderator_hand_share": ModeratorTwin(
                (feat_dim * 2,) + tuple(mod_channels) + (2,)),
        })

    def modules_state(self):
        """Checkpoint-shaped dict: {module_name: numpy state_dict}."""
        return {name: {k: v.detach().numpy()
                       for k, v in mod.state_dict().items()}
                for name, mod in self.mods.items()}

    def _split(self, vec, which):
        out, i = {}, 0
        for k, d in self.layouts[which].items():
            out[k] = vec[:, i:i + d]
            i += d
        return out

    def coarse(self, image):
        f_body = self.mods["Encoder_body"](image)
        shares = {p: self.mods[f"Extractor_{p}_share"](f_body)
                  for p in ("head", "left_hand", "right_hand")}
        params = dict(self._split(self.mods["Regressor_body"](f_body),
                                  "body"))
        params.update(self._split(
            self.mods["Regressor_head_share"](shares["head"]),
            "head_share"))
        rh = self._split(self.mods["Regressor_hand_share"](
            shares["right_hand"]), "hand_share")
        lh = self._split(self.mods["Regressor_hand_share"](
            shares["left_hand"]), "hand_share")
        params["right_wrist_pose"] = rh["right_wrist_pose"]
        params["right_hand_pose"] = rh["right_hand_pose"]
        params["left_wrist_pose"] = lh["right_wrist_pose"]
        params["left_hand_pose"] = lh["right_hand_pose"]
        return f_body, shares, params

    def forward(self, image, head_image, left_hand_image, right_hand_image):
        f_body, shares, _ = self.coarse(image)
        crops = {"head": head_image,
                 "left_hand": torch.flip(left_hand_image, dims=(-1,)),
                 "right_hand": right_hand_image}
        fused, local = {}, {}
        for part_name, crop in crops.items():
            part = "head" if part_name == "head" else "hand"
            f_part = self.mods[f"Encoder_{part}"](crop)
            local[part_name] = self._split(
                self.mods[f"Regressor_{part}_share"](f_part),
                f"{part}_share")
            if part == "head":
                local[part_name].update(self._split(
                    self.mods["Regressor_head"](f_part), "head"))
            f_out, w = self.mods[f"Moderator_{part}_share"](
                shares[part_name], f_part)
            if part == "hand":
                part_w = w[:, [1]].clone()
                part_w[part_w > 0.7] = 1.0
                f_out = shares[part_name] * (1.0 - part_w) + f_part * part_w
            fused[part_name] = f_out
        params = dict(self._split(self.mods["Regressor_body"](f_body),
                                  "body"))
        params.update(self._split(
            self.mods["Regressor_head_share"](fused["head"]), "head_share"))
        rh = self._split(self.mods["Regressor_hand_share"](
            fused["right_hand"]), "hand_share")
        lh = self._split(self.mods["Regressor_hand_share"](
            fused["left_hand"]), "hand_share")
        params["right_wrist_pose"] = rh["right_wrist_pose"]
        params["left_wrist_pose"] = lh["right_wrist_pose"]
        params["tex"] = local["head"]["tex"]
        params["light"] = local["head"]["light"]
        # keep_local (pixie.py:349-355)
        params["exp"] = local["head"]["exp"]
        params["right_hand_pose"] = local["right_hand"]["right_hand_pose"]
        params["left_hand_pose"] = local["left_hand"]["right_hand_pose"]
        return params
