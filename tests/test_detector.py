"""Person detector front end (models/detector.py): the weight-free
saliency box must localize a person-like figure in a plain RGB photo, and
process_image must crop to it rather than the full frame (reference
human_det bbox role, lib/pymaf/utils/imutils.py:34-47)."""

import numpy as np


def _person_photo(H=240, W=320):
    """Synthetic photo: smooth background gradient + textured person blob
    off-center."""
    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([0.55 + 0.1 * yy / H, 0.6 + 0.08 * xx / W,
                    0.65 + 0.05 * (xx + yy) / (H + W)], -1)
    # person: vertical ellipse at (0.55H, 0.62W), textured
    cy, cx, ry, rx = 0.55 * H, 0.62 * W, 0.33 * H, 0.12 * W
    inside = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
    tex = 0.25 + 0.3 * rng.rand(H, W).astype(np.float32)
    for c in range(3):
        img[..., c] = np.where(inside, tex * (0.8 + 0.2 * c), img[..., c])
    return np.clip(img, 0, 1), inside


def test_saliency_bbox_localizes_person():
    from icon_tpu.models.detector import saliency_person_bbox
    img, inside = _person_photo()
    y0, x0, y1, x1 = saliency_person_bbox(img)
    H, W = img.shape[:2]
    # not the full frame
    assert (y1 - y0) * (x1 - x0) < 0.85 * H * W
    # covers most of the true person mask
    ys, xs = np.where(inside)
    box = np.zeros_like(inside)
    box[y0:y1, x0:x1] = True
    recall = (inside & box).sum() / inside.sum()
    assert recall > 0.8, f"recall {recall:.2f}, box {(y0, x0, y1, x1)}"


def test_process_image_crops_rgb_to_person(tmp_path):
    from PIL import Image
    from icon_tpu.data.test_dataset import process_image
    img, inside = _person_photo()
    p = str(tmp_path / "person.png")
    Image.fromarray((img * 255).astype(np.uint8)).save(p)  # RGB, no alpha

    icon, hps, mask, crop = process_image(p, icon_size=128)
    H, W = img.shape[:2]
    # crop tracked the person, not the frame
    assert crop["size"] < max(H, W)
    assert mask.mean() > 0.15          # the person fills a chunk of it


def test_detect_and_matte_soft_alpha_without_segmenter():
    """Missing matting must warn loudly and yield a figure/ground estimate,
    NOT a hard box rectangle (a box alpha makes downstream silhouette
    losses fit a rectangle)."""
    import pytest
    from icon_tpu.models.detector import detect_and_matte
    img, inside = _person_photo()
    with pytest.warns(UserWarning, match="matting"):
        alpha = detect_and_matte(img, segmenter=None)
    on = alpha > 0
    assert on.sum() > 0
    assert on.mean() < 0.9             # not the whole frame
    # soft and figure-shaped: the on-region is not a filled rectangle
    ys, xs = np.where(on)
    box_area = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
    assert on.sum() < 0.95 * box_area
    assert len(np.unique(alpha[on])) > 2   # graded, not binary


def test_detect_and_matte_uses_detector_box():
    """A trained-detector box (fed via a stub PersonDetector) wins over
    saliency; the matte stays inside it."""
    from icon_tpu.models import yolo
    from icon_tpu.models.detector import detect_and_matte
    img, _ = _person_photo()
    H, W = img.shape[:2]

    class StubDet:
        def __call__(self, rgb):
            return (np.array([[40.0, 150.0, 200.0, 270.0]], np.float32),
                    np.array([0.9], np.float32))

    alpha = detect_and_matte(img, segmenter=lambda c: np.ones(c.shape[:2]),
                             detector=StubDet())
    ys, xs = np.where(alpha > 0)
    # person_bbox adds a 10% margin to the stub's (40,150,200,270)
    assert 20 <= ys.min() and ys.max() <= 220
    assert 135 <= xs.min() and xs.max() <= 285
    assert ys.max() - ys.min() > 120 and xs.max() - xs.min() > 80
