"""In-the-wild test dataset: photo -> crop -> HPS -> SMPL init
(reference lib/dataset/TestDataset.py:90-287 + lib/pymaf/utils/imutils.py
process_image :89-185).

Preprocessing contract: images with an alpha channel are used as-is (the
alpha is the person matte; its bbox drives the crop). RGB images without
alpha run the detector-first pipeline (models/detector.py): a weight-free
spectral-residual saliency detector proposes the person box (the
reference's ``human_det`` role, imutils.py:34-47), then U^2-Net matting
refines the alpha inside the box when its checkpoint is installed
(data/HPS/u2net.pth, the reference's rembg role).

Outputs per item mirror the reference's data_dict (TestDataset.py:232-287):
``image`` [512,512,3] in [-1,1] masked, ``mask``, ``betas`` [1,10],
``body_pose`` [1,23,3,3], ``global_orient`` [1,1,3,3], ``smpl_verts``,
``scale`` (float), ``trans`` [3].
"""

from __future__ import annotations

import glob
import os.path as osp
from typing import Any, Callable, Dict, List, Optional

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def alpha_bbox(alpha: np.ndarray, thresh: float = 0.5,
               margin: float = 0.1):
    """Square crop box around the matte (the reference's detector bbox +
    aug_matrix scaling, imutils.py:89-130)."""
    ys, xs = np.where(alpha > thresh)
    H, W = alpha.shape
    if len(ys) == 0:
        return 0, 0, min(H, W)
    y0, y1 = ys.min(), ys.max()
    x0, x1 = xs.min(), xs.max()
    size = int(max(y1 - y0, x1 - x0) * (1 + 2 * margin))
    size = min(size, max(H, W))
    cy = (y0 + y1) // 2
    cx = (x0 + x1) // 2
    top = int(np.clip(cy - size // 2, 0, max(H - size, 0)))
    left = int(np.clip(cx - size // 2, 0, max(W - size, 0)))
    return top, left, size


def process_image(path: str, icon_size: int = 512, hps_size: int = 224,
                  segmenter: Optional[Callable] = None,
                  detector: Optional[Callable] = None,
                  return_raw: bool = False):
    """Returns (img_icon [S,S,3] in [-1,1]*mask, img_hps [224,224,3]
    ImageNet-normalized, mask [S,S], crop_param)."""
    from PIL import Image
    im = Image.open(path)
    has_alpha = im.mode in ("RGBA", "LA") or "transparency" in im.info
    rgba = np.asarray(im.convert("RGBA"), np.float32) / 255.0
    rgb, alpha = rgba[..., :3], rgba[..., 3]
    if not has_alpha:
        # detector-first, matting-inside-the-box (the reference's
        # human_det -> rembg order, imutils.py:89-136). The trained
        # YOLOv3-tiny person detector is used when its weights are
        # installed; the weight-free saliency box otherwise.
        from icon_tpu.models.detector import detect_and_matte
        alpha = detect_and_matte(rgb, segmenter, detector)

    top, left, size = alpha_bbox(alpha)
    H, W = alpha.shape
    pad_h = max(size - H, 0)
    pad_w = max(size - W, 0)
    rgb_p = np.pad(rgb, ((0, pad_h), (0, pad_w), (0, 0)))
    a_p = np.pad(alpha, ((0, pad_h), (0, pad_w)))
    crop_rgb = rgb_p[top:top + size, left:left + size]
    crop_a = a_p[top:top + size, left:left + size]

    def resize(img, s):
        arr = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        return np.asarray(arr.resize((s, s), Image.BILINEAR),
                          np.float32) / 255.0

    icon_rgb = resize(crop_rgb, icon_size)
    icon_a = resize(crop_a[..., None].repeat(3, -1), icon_size)[..., 0]
    img_icon = (icon_rgb * 2 - 1) * (icon_a > 0.5)[..., None]

    hps_rgb = resize(crop_rgb * crop_a[..., None], hps_size)
    img_hps = (hps_rgb - IMAGENET_MEAN) / IMAGENET_STD

    crop_param = {"top": top, "left": left, "size": size, "ori_hw": (H, W)}
    if return_raw:
        # un-normalized, un-masked crop for full-frame HPS front ends
        # (BEV runs its own detection; the reference hands it the raw
        # crop, imutils.py process_image hps_type=='bev' branch)
        raw = (resize(crop_rgb, icon_size) * 255).astype(np.uint8)
        return (img_icon.astype(np.float32), img_hps.astype(np.float32),
                (icon_a > 0.5).astype(np.float32), crop_param, raw)
    return (img_icon.astype(np.float32), img_hps.astype(np.float32),
            (icon_a > 0.5).astype(np.float32), crop_param)


class TestDataset:
    """In-the-wild inference dataset (reference TestDataset)."""

    def __init__(self, image_dir: str, hps_type: str = "pymaf",
                 hps_ckpt: str = "", seg_dir: Optional[str] = None,
                 icon_size: int = 512, allow_random_hps: bool = False):
        exts = ("*.png", "*.jpg", "*.jpeg", "*.webp")
        self.subject_list = sorted(sum(
            [glob.glob(osp.join(image_dir, e)) for e in exts], []))
        self.hps_type = hps_type
        self.seg_dir = seg_dir
        self.icon_size = icon_size
        self.allow_random_hps = allow_random_hps
        self._hps = None
        self._hps_ckpt = hps_ckpt
        self._segmenter = None
        self._detector = None

    def __len__(self):
        return len(self.subject_list)

    @property
    def hps(self):
        if self._hps is None:
            hps = get_hps(self.hps_type, self._hps_ckpt)
            # a random-init HPS exports meaningless bodies; the reference
            # hard-fails without its data (fetch_data.sh) — match that,
            # with an escape hatch for smoke tests
            if getattr(hps, "random_init", False) and \
                    not self.allow_random_hps:
                raise RuntimeError(
                    f"{self.hps_type} has no checkpoint installed — every "
                    "fit would be random garbage. Install the weights under "
                    "data/HPS/ (see README) or pass allow_random_hps=True "
                    "(-allow_random_hps on the CLI) for smoke tests.")
            self._hps = hps
        return self._hps

    @property
    def segmenter(self):
        """U^2-Net matting for RGB inputs when its checkpoint is installed
        (the reference's rembg); alpha inputs never need it."""
        if self._segmenter is None:
            from icon_tpu.models.smplx.assets import data_root
            for name, lite in (("u2net.pth", False), ("u2netp.pth", True)):
                p = osp.join(data_root(), "HPS", name)
                if osp.exists(p):
                    from icon_tpu.models.u2net import build_segmenter
                    self._segmenter = build_segmenter(p, lite=lite)
                    break
            else:
                self._segmenter = False
        return self._segmenter or None

    @property
    def detector(self):
        """Trained YOLOv3-tiny person detector when its darknet weights
        are installed (the reference's human_det role); RGB photos fall
        back to the weight-free saliency box without it."""
        if self._detector is None:
            from icon_tpu.models.smplx.assets import data_root
            p = osp.join(data_root(), "HPS", "yolov3-tiny.weights")
            if osp.exists(p):
                from icon_tpu.models.yolo import PersonDetector
                self._detector = PersonDetector(p)
            else:
                self._detector = False
        return self._detector or None

    def __getitem__(self, index: int) -> Dict[str, Any]:
        import jax.numpy as jnp
        path = self.subject_list[index]
        name = osp.splitext(osp.basename(path))[0]
        wants_raw = getattr(self.hps, "wants_raw", False)
        processed = process_image(
            path, icon_size=self.icon_size, segmenter=self.segmenter,
            detector=self.detector, return_raw=wants_raw)
        img_icon, img_hps, mask, crop_param = processed[:4]

        out = self.hps(processed[4]) if wants_raw \
            else self.hps(jnp.asarray(img_hps)[None])

        item: Dict[str, Any] = {
            "name": name, "image": img_icon, "mask": mask,
            "crop_param": crop_param,
            "smpl_faces": self.hps.faces,
        }
        # adaptation (TestDataset.py:232-287; branch per hps type)
        if self.hps_type == "pare":
            rotmat = out["pred_pose"]
            verts = out["smpl_vertices"]
            cam = out["pred_cam"]
        elif self.hps_type == "hybrik":
            rotmat = out["pred_theta_mats"]
            verts = out["pred_vertices"]
            # reference doubles hybrik's scale (TestDataset.py:262)
            cam = np.asarray(out["pred_camera"]) * np.array([2.0, 1.0, 1.0])
        elif self.hps_type == "bev":
            # already adapted by BEVWrapper.adapt (TestDataset.py:263-276)
            rotmat = out["rotmat"]
            verts = out["verts"]
            cam = out["cam"]
        elif self.hps_type == "pixie":
            # SMPL-X params (TestDataset.py:248-254): keep the face/hand
            # params the pixie-specific refinement consumes
            for k in ("exp", "jaw_pose", "left_hand_pose",
                      "right_hand_pose"):
                item[k] = np.asarray(out[k])
            rotmat = np.concatenate([np.asarray(out["global_pose"]),
                                     np.asarray(out["body_pose"])], axis=1)
            verts = out["vertices"]
            cam = out["cam"]
        else:                                    # pymaf
            rotmat = out["rotmat"]
            verts = out["verts"]
            cam = out["pred_cam"]
        scale, tranX, tranY = [float(v) for v in np.asarray(cam)[0, :3]]
        item["betas"] = np.asarray(
            out["shape"] if self.hps_type == "pixie" else out["pred_shape"])
        item["body_pose"] = np.asarray(rotmat[:, 1:])
        item["global_orient"] = np.asarray(rotmat[:, 0:1])
        item["smpl_verts"] = np.asarray(verts)
        item["scale"] = scale
        item["trans"] = np.array([tranX, tranY, 0.0], np.float32)
        return item

    def visualize_alignment(self, item: Dict[str, Any],
                            out_path: str) -> str:
        """Headless HPS<->image alignment check (reference
        TestDataset.py:301-354 + the __main__ harness :357-380).

        The reference opens an interactive vedo window with the input
        photo, the fitted body's front/back normal renders, and the
        untextured mesh. TPU hosts are headless, so the same three views
        are rasterized with the tile rasterizer and written as one PNG
        strip instead: [input+front overlay | front normals | back
        normals]. A misaligned HPS fit shows up as the body silhouette
        drifting off the person in the left panel.
        """
        import jax.numpy as jnp
        from PIL import Image
        from icon_tpu.render.render import render_normal

        body = self.hps.body
        nb = item["body_pose"].shape[1]
        v0, _ = body.forward(
            betas=jnp.asarray(item["betas"]),
            global_orient=jnp.asarray(item["global_orient"]).reshape(1, 9),
            body_pose=jnp.asarray(item["body_pose"]).reshape(1, nb * 9),
            pose2rot=False)
        verts = (v0[0] + jnp.asarray(item["trans"])[None]) * item["scale"]
        faces = jnp.asarray(item["smpl_faces"])
        size = int(item["image"].shape[0])
        nF, _ = render_normal(verts, faces, size=size)
        nB, _ = render_normal(verts, faces, size=size, azimuth=180.0)

        def to_u8(a):
            return np.clip((np.asarray(a) * 0.5 + 0.5) * 255.0,
                           0, 255).astype(np.uint8)

        img, front, back = (to_u8(item["image"]), to_u8(nF), to_u8(nB))
        overlay = (img.astype(np.float32) * 0.5 +
                   front.astype(np.float32) * 0.5).astype(np.uint8)
        panel = np.concatenate([overlay, front, back], axis=1)
        Image.fromarray(panel).save(out_path)
        return out_path


def main():
    """CLI mirror of the reference's TestDataset __main__ harness
    (TestDataset.py:357-380): iterate a directory of photos and write an
    alignment panel per image."""
    import argparse
    import os

    ap = argparse.ArgumentParser(description="HPS alignment visualization")
    ap.add_argument("-i", "--in_dir", required=True)
    ap.add_argument("-o", "--out_dir", default="./results/alignment")
    ap.add_argument("--hps_type", default="pymaf")
    ap.add_argument("--hps_ckpt", default="")
    ap.add_argument("--allow_random_hps", action="store_true")
    args = ap.parse_args()

    ds = TestDataset(args.in_dir, hps_type=args.hps_type,
                     hps_ckpt=args.hps_ckpt,
                     allow_random_hps=args.allow_random_hps)
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(len(ds)):
        item = ds[i]
        out = osp.join(args.out_dir, f"{item['name']}_alignment.png")
        print(ds.visualize_alignment(item, out))


class PyMAFWrapper:
    """Callable HPS: [B,224,224,3] -> final-iteration smpl_out dict."""

    def __init__(self, ckpt: str = ""):
        import jax
        from icon_tpu.models.pymaf.net import build_pymaf
        self.net, self.body = build_pymaf()
        self.faces = self.body.faces
        import jax.numpy as jnp
        dummy = jnp.zeros((1, 224, 224, 3))
        self.variables = jax.jit(
            lambda k, x: self.net.init(k, x, train=False))(
            jax.random.PRNGKey(0), dummy)
        self.random_init = not (ckpt and osp.exists(ckpt))
        if not self.random_init:
            from icon_tpu.models.pymaf.convert import load_pymaf_checkpoint
            self.variables = load_pymaf_checkpoint(self.variables, ckpt)
        else:
            print("[hps] no PyMAF checkpoint found — RANDOM weights "
                  "(install data/HPS/pymaf_data to get real fits)")
        self._fwd = jax.jit(lambda v, x: self.net.apply(v, x, train=False))

    def __call__(self, img: Any) -> Dict[str, Any]:
        return self._fwd(self.variables, img)["smpl_out"][-1]


class PAREWrapper:
    """Callable HPS: [B,224,224,3] -> PARE output dict."""

    def __init__(self, ckpt: str = ""):
        import jax
        import jax.numpy as jnp
        from icon_tpu.models.pare import build_pare
        self.net, self.body = build_pare()
        self.faces = self.body.faces
        dummy = jnp.zeros((1, 224, 224, 3))
        self.variables = jax.jit(
            lambda k, x: self.net.init(k, x, train=False))(
            jax.random.PRNGKey(0), dummy)
        self.random_init = not (ckpt and osp.exists(ckpt))
        if not self.random_init:
            from icon_tpu.models.pare.convert import load_pare_checkpoint
            self.variables = load_pare_checkpoint(self.variables, ckpt)
        else:
            print("[hps] no PARE checkpoint found — RANDOM weights")
        self._fwd = jax.jit(lambda v, x: self.net.apply(v, x, train=False))

    def __call__(self, img):
        return self._fwd(self.variables, img)


class PIXIEWrapper:
    """Callable HPS: [B,224,224,3] -> PIXIE SMPL-X output dict."""

    def __init__(self, ckpt: str = ""):
        from icon_tpu.models.pixie import build_pixie
        self.est, self.body = build_pixie()
        self.faces = self.body.faces
        self.random_init = not (ckpt and osp.exists(ckpt))
        if not self.random_init:
            from icon_tpu.models.pixie.convert import load_pixie_checkpoint
            self.est.variables = load_pixie_checkpoint(
                self.est.variables, ckpt)
        else:
            print("[hps] no PIXIE checkpoint found — RANDOM weights")

    def __call__(self, img):
        return self.est(img)


class HybrIKWrapper:
    """Callable HPS: [B,256,256,3] -> HybrIK output dict."""

    def __init__(self, ckpt: str = ""):
        import jax
        import jax.numpy as jnp
        from icon_tpu.models.hybrik import build_hybrik
        self.net, self.body = build_hybrik()
        self.faces = self.body.faces
        dummy = jnp.zeros((1, 256, 256, 3))
        self.variables = jax.jit(
            lambda k, x: self.net.init(k, x, train=False))(
            jax.random.PRNGKey(0), dummy)
        self.random_init = not (ckpt and osp.exists(ckpt))
        if not self.random_init:
            from icon_tpu.models.hybrik.convert import load_hybrik_checkpoint
            self.variables = load_hybrik_checkpoint(self.variables, ckpt)
        else:
            print("[hps] no HybrIK checkpoint found — RANDOM weights")
        self._fwd = jax.jit(lambda v, x: self.net.apply(v, x, train=False))

    def __call__(self, img):
        import jax
        import jax.numpy as jnp
        # hybrik consumes 256^2 inputs (reference hybrik config)
        if img.shape[1] != 256:
            img = jax.image.resize(
                img, (img.shape[0], 256, 256, img.shape[-1]), "bilinear")
        return self._fwd(self.variables, jnp.asarray(img))


def _rodrigues_np(aa: np.ndarray) -> np.ndarray:
    """[N, 3] axis-angle -> [N, 3, 3] rotation matrices (host-side; BEV's
    thetas arrive as numpy from the external package)."""
    theta = np.linalg.norm(aa, axis=-1, keepdims=True).clip(1e-8)
    k = aa / theta
    K = np.zeros((len(aa), 3, 3), np.float32)
    K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
    K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
    K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
    s = np.sin(theta)[..., None]
    c = np.cos(theta)[..., None]
    return (np.eye(3, dtype=np.float32)[None] + s * K
            + (1 - c) * (K @ K)).astype(np.float32)


def adapt_bev_output(preds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """simple-romp BEV numpy outputs -> the common HPS item layout
    (reference TestDataset.py:263-276): betas[:10], 72-dim axis-angle
    thetas -> [1, 24, 3, 3] rotmats, person 0's verts, and the reference's
    empirical camera remap (scale = cam[0]*1.1, tranY = cam[1]+0.28,
    tranX from the metric cam_trans)."""
    thetas = np.asarray(preds["smpl_thetas"])[0].reshape(-1, 3)
    rotmat = _rodrigues_np(thetas.astype(np.float32))[None]
    cam = np.asarray(preds["cam"], np.float32)
    cam_trans = np.asarray(preds["cam_trans"], np.float32)
    return {
        "rotmat": rotmat,
        "pred_shape": np.asarray(preds["smpl_betas"],
                                 np.float32)[0:1, :10],
        "verts": np.asarray(preds["verts"], np.float32)[0:1],
        "cam": np.array([[cam[0, 0] * 1.1, cam_trans[0, 0],
                          cam[0, 1] + 0.28]], np.float32),
    }


class BEVWrapper:
    """Callable HPS around the external ``simple-romp`` BEV package
    (reference TestDataset.py:111-125 — external pip there too; only this
    output-adaptation shim is first-party in either codebase).

    Consumes the raw uint8 crop (``wants_raw``): BEV runs its own person
    detection + crop internally, like the reference which hands it the
    unnormalized image."""

    wants_raw = True
    random_init = False     # external package ships trained weights

    def __init__(self, ckpt: str = ""):
        try:
            import bev
        except ImportError as e:
            raise RuntimeError(
                "hps_type 'bev' wraps the external `simple-romp` package "
                "(the reference installs it via pip, TestDataset.py:113-117)"
                " — `pip install simple-romp==1.0.3` to use it") from e
        settings = bev.main.default_settings
        settings.mode = "image"
        settings.show_largest = True    # single-subject pipeline
        self._bev = bev.BEV(settings)
        from icon_tpu.models.smplx.assets import SMPLX
        from icon_tpu.models.smplx.body import (load_body_model,
                                                synthetic_body_model)
        reg = SMPLX()
        for g in ("NEUTRAL", "MALE"):
            for ext in ("pkl", "npz"):
                p = osp.join(reg.model_dir, "smpl", f"SMPL_{g}.{ext}")
                if osp.exists(p):
                    self.faces = np.asarray(
                        load_body_model(p, model_type="smpl").faces)
                    return
        self.faces = np.asarray(synthetic_body_model().faces)

    def __call__(self, raw_rgb: np.ndarray) -> Dict[str, np.ndarray]:
        # BEV expects BGR uint8 (it wraps cv2 conventions)
        preds = self._bev(np.ascontiguousarray(raw_rgb[..., ::-1]))
        if preds is None:
            raise RuntimeError("BEV found no person in the image")
        return adapt_bev_output(preds)


def get_hps(hps_type: str = "pymaf", ckpt: str = ""):
    """HPS registry (reference TestDataset.py:90-126). PyMAF is the default;
    PIXIE / HybrIK / BEV register here as their ports land."""
    from icon_tpu.models.smplx.assets import data_root
    if hps_type == "pymaf":
        if not ckpt:
            ckpt = osp.join(data_root(), "HPS", "pymaf_data",
                            "pretrained_model", "PyMAF_model_checkpoint.pt")
        return PyMAFWrapper(ckpt)
    if hps_type == "pare":
        if not ckpt:
            ckpt = osp.join(data_root(), "HPS", "pare_data",
                            "pare_checkpoint.ckpt")
        return PAREWrapper(ckpt)
    if hps_type == "hybrik":
        if not ckpt:
            ckpt = osp.join(data_root(), "HPS", "hybrik_data",
                            "pretrained_w_cam.pth")
        return HybrIKWrapper(ckpt)
    if hps_type == "pixie":
        if not ckpt:
            ckpt = osp.join(data_root(), "HPS", "pixie_data",
                            "pixie_model.tar")
        return PIXIEWrapper(ckpt)
    if hps_type == "bev":
        return BEVWrapper(ckpt)
    raise NotImplementedError(
        f"hps_type {hps_type!r} unknown "
        "(available: pymaf, pare, hybrik, pixie, bev)")


if __name__ == "__main__":
    main()
