"""The implicit occupancy network — ICON / PaMIR / PIFu in one module.

Re-design of the reference ``HGPIFuNet`` (lib/net/HGPIFuNet.py): the
``prior_type`` config selects how per-point features are assembled
(HGPIFuNet.py:82-133 channel plumbing, :268-367 query):

- ``icon``: front/back hourglass features gated by SMPL visibility
  (feat_select) + SMPL-local features (sdf/cmap/norm from cal_sdf_batch).
- ``pamir``: global hourglass features + trilinear samples of a 3D CNN over
  the voxelized SMPL semantic volume.
- ``pifu``: global hourglass features + the query z-value.

API is functional: ``filter()`` produces image features once per frame;
``query()`` evaluates occupancy at [B, N, 3] points — the hot op the recon
engine calls millions of times, so everything inside is static-shape matmul/
gather work that XLA fuses into the MLP chain.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from icon_tpu.config import Config
from icon_tpu.models.hourglass import HGFilter
from icon_tpu.models.mlp import MLP
from icon_tpu.models.normalnet import NormalNet
from icon_tpu.models.volume_encoder import VolumeEncoder
from icon_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from icon_tpu.ops.projection import project
from icon_tpu.ops.sdf import cal_sdf_batch
from icon_tpu.ops.select import feat_select
from icon_tpu.ops.voxelize import voxelize_semantic


def mlp_first_dim(cfg: Config) -> int:
    """channels_IF[0] logic (HGPIFuNet.py:94-121)."""
    net = cfg.net
    n_in = len(channel_split(cfg)[0])
    c0 = net.hourglass_dim if net.use_filter else n_in
    if net.prior_type == "icon" and "vis" not in net.smpl_feats:
        c0 += net.hourglass_dim if net.use_filter else n_in
    if net.prior_type == "icon":
        c0 += net.smpl_dim
    elif net.prior_type == "pamir":
        c0 += net.voxel_dim
    else:
        c0 += 1
    return c0


def channel_split(cfg: Config) -> List[List[int]]:
    """channels_filter logic (HGPIFuNet.py:82-92), indices into the
    concatenated in_geo stack."""
    net = cfg.net
    if net.prior_type == "icon":
        if "image" in net.in_geo_names:
            return [[0, 1, 2, 3, 4, 5], [0, 1, 2, 6, 7, 8]]
        return [[0, 1, 2], [3, 4, 5]]
    if "image" in net.in_geo_names:
        return [[0, 1, 2, 3, 4, 5, 6, 7, 8]]
    return [[0, 1, 2, 3, 4, 5]]


class HGPIFuNet(nn.Module):
    cfg: Config

    def setup(self):
        net = self.cfg.net
        self.prior_type = net.prior_type
        self.channels_filter = channel_split(self.cfg)
        self.sdf_clip = self.cfg.sdf_clip / 100.0

        mlp_channels = (mlp_first_dim(self.cfg),) + tuple(net.mlp_dim[1:])
        self.if_regressor = MLP(
            filter_channels=mlp_channels,
            res_layers=tuple(net.res_layers),
            norm=net.norm_mlp,
            last_sigmoid=not self.cfg.test_mode,
            name="if_regressor")

        if net.use_filter:
            self.F_filter = HGFilter(
                num_stack=net.num_stack,
                depth=net.num_hourglass,
                hourglass_dim=net.hourglass_dim,
                norm=net.norm,
                hg_down=net.hg_down,
                conv1_ksdp=tuple(net.conv1),
                name="F_filter")

        self.normal_filter = NormalNet(
            in_nml=net.in_nml, ngf=net.ngf,
            n_downsampling=net.n_downsampling, n_blocks=net.n_blocks,
            name="normal_filter")

        if self.prior_type == "pamir":
            self.ve = VolumeEncoder(num_out=net.voxel_dim,
                                    num_stacks=net.num_stack, name="ve")

    # ------------------------------------------------------------------

    def get_normal(self, in_tensor_dict: Dict[str, jnp.ndarray],
                   train: bool = False) -> jnp.ndarray:
        """Assemble the in_geo stack, predicting normals when missing
        (HGPIFuNet.py:167-192)."""
        names = self.cfg.net.in_geo_names
        feats = []
        if "image" in names:
            feats.append(in_tensor_dict["image"])
        if "normal_F" in names and "normal_B" in names:
            if "normal_F" in in_tensor_dict and "normal_B" in in_tensor_dict:
                nmlF = in_tensor_dict["normal_F"]
                nmlB = in_tensor_dict["normal_B"]
            else:
                nmlF, nmlB = self.normal_filter(in_tensor_dict, train=False)
            feats += [nmlF, nmlB]
        return jnp.concatenate(feats, axis=-1)

    def predict_normals(self, in_tensor_dict: Dict[str, jnp.ndarray],
                        train: bool = False):
        """Run just the normal nets (apps/infer.py:207-210 usage)."""
        return self.normal_filter(in_tensor_dict, train)

    def filter(self, in_tensor_dict: Dict[str, jnp.ndarray],
               train: bool = False) -> List[jnp.ndarray]:
        """Image filtering -> list of feature maps [B, h, w, C]
        (HGPIFuNet.py:204-266). In eval mode only the last stack is kept."""
        net = self.cfg.net
        in_filter = self.get_normal(in_tensor_dict, train)

        def take(chans):
            return in_filter[..., jnp.array(chans)]

        if self.prior_type == "icon":
            if net.use_filter:
                features_F = self.F_filter(take(self.channels_filter[0]),
                                           train)
                features_B = self.F_filter(take(self.channels_filter[1]),
                                           train)
            else:
                features_F = [take(self.channels_filter[0])]
                features_B = [take(self.channels_filter[1])]
            features_G = [jnp.concatenate([f, b], axis=-1)
                          for f, b in zip(features_F, features_B)]
        else:
            if net.use_filter:
                features_G = self.F_filter(take(self.channels_filter[0]),
                                           train)
            else:
                features_G = [take(self.channels_filter[0])]

        return features_G if train else [features_G[-1]]

    # ------------------------------------------------------------------

    def query(self,
              features: Sequence[jnp.ndarray],
              points: jnp.ndarray,
              calibs: jnp.ndarray,
              smpl_feat: Optional[Dict[str, jnp.ndarray]] = None,
              train: bool = False) -> List[jnp.ndarray]:
        """Occupancy at 3D points (HGPIFuNet.py:268-367).

        Args:
          features: output of ``filter``.
          points: ``[B, N, 3]`` in world space.
          calibs: ``[B, 4, 4]``.
          smpl_feat: prior-specific dict —
            icon:  smpl_verts [B,V,3], smpl_faces [F,3] int,
                   smpl_cmap [B,V,3], smpl_vis [B,V,1]
            pamir: voxel_verts [B,V,3] (projected), voxel_codes [V,3]

        Returns: list (per stack) of ``[B, N, 1]`` occupancy.
        """
        net = self.cfg.net
        xyz = project(points, calibs, mode=self.cfg.projection_mode)
        xy = xyz[..., :2]
        z = xyz[..., 2:3]

        in_cube = jnp.all((xyz > -1.0) & (xyz < 1.0), axis=-1,
                          keepdims=True).astype(xyz.dtype)

        vol_feats = features
        if self.prior_type == "icon":
            if "smpl_vf_table" in smpl_feat:
                # production path: MXU kNN + candidate faces (ops/sdf_fast)
                from icon_tpu.ops.sdf_fast import cal_sdf_batch_fast
                sdf, norm, cmap, vis = cal_sdf_batch_fast(
                    smpl_feat["smpl_verts"], smpl_feat["smpl_faces"],
                    smpl_feat["smpl_cmap"], smpl_feat["smpl_vis"], xyz,
                    smpl_feat["smpl_vf_table"],
                    cluster_faces=smpl_feat.get("smpl_clusters"),
                    cluster_mask=smpl_feat.get("smpl_cluster_mask"),
                    ray_bins=smpl_feat.get("smpl_ray_bins"),
                    ray_grid=smpl_feat.get("smpl_ray_grid"),
                    cross_z=smpl_feat.get("smpl_cross_z"),
                    cross_meta=smpl_feat.get("smpl_cross_meta"),
                    known_inside=smpl_feat.get("smpl_query_inside"))
            else:
                sdf, norm, cmap, vis = cal_sdf_batch(
                    smpl_feat["smpl_verts"], smpl_feat["smpl_faces"],
                    smpl_feat["smpl_cmap"], smpl_feat["smpl_vis"], xyz)
            # outlier points (far from the body) get uniform features
            outlier = jnp.abs(sdf) >= self.sdf_clip
            sdf = jnp.where(outlier, jnp.sign(sdf), sdf)
            feat_lst = [sdf]
            if "cmap" in net.smpl_feats:
                cmap = jnp.where(outlier, sdf, cmap)
                feat_lst.append(cmap)
            if "norm" in net.smpl_feats:
                feat_lst.append(norm)
            if "vis" in net.smpl_feats:
                feat_lst.append(vis)
            smpl_feat_pts = jnp.concatenate(feat_lst, axis=-1)  # [B, N, D]
        elif self.prior_type == "pamir":
            vol = voxelize_semantic(smpl_feat["voxel_verts"],
                                    smpl_feat["voxel_codes"],
                                    res=net.voxel_res)
            vol_feats = self.ve(vol, train=train,
                                intermediate_output=train)

        preds_list = []
        for im_feat, vol_feat in zip(features, vol_feats):
            if self.prior_type == "icon":
                if "vis" in net.smpl_feats:
                    point_local_feat = feat_select(
                        grid_sample_2d(im_feat, xy),
                        smpl_feat_pts[..., -1:])
                    point_feat_list = [point_local_feat,
                                       smpl_feat_pts[..., :-1]]
                else:
                    point_local_feat = grid_sample_2d(im_feat, xy)
                    point_feat_list = [point_local_feat, smpl_feat_pts]
            elif self.prior_type == "pamir":
                point_feat_list = [grid_sample_2d(im_feat, xy),
                                   grid_sample_3d(vol_feat, xyz)]
            else:  # pifu
                point_feat_list = [grid_sample_2d(im_feat, xy), z]

            point_feat = jnp.concatenate(point_feat_list, axis=-1)
            preds = self.if_regressor(point_feat, train)
            preds_list.append(preds * in_cube)
        return preds_list

    # ------------------------------------------------------------------

    def __call__(self, in_tensor_dict: Dict[str, jnp.ndarray],
                 train: bool = True):
        """Full forward (HGPIFuNet.py:389-410): filter + query + error."""
        features = self.filter(in_tensor_dict, train)
        smpl_feat = {k: in_tensor_dict[k] for k in in_tensor_dict
                     if k.startswith(("smpl_", "voxel_"))}
        preds_list = self.query(features, in_tensor_dict["sample"],
                                in_tensor_dict["calib"],
                                smpl_feat or None, train)
        error = None
        if "label" in in_tensor_dict:
            label = in_tensor_dict["label"]
            if self.cfg.sdf:
                err = sum(smooth_l1(p, label) for p in preds_list)
            else:
                err = sum(jnp.mean((p - label) ** 2) for p in preds_list)
            error = err / len(preds_list)
        return preds_list[-1], error


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))
