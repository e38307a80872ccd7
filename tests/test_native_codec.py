"""Native C++ PNG codec (icon_tpu/native) vs PIL — byte-exact decode across
color types, fused imagepath2tensor parity, threaded-loader integration.

The codec replaces PIL in the DataLoader's decode hot path because ctypes
calls release the GIL (threaded workers then scale across cores); PIL stays
as the fallback, so these tests also pin that both paths agree exactly."""

import io
import os

import numpy as np
import pytest

from icon_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host lib unavailable (no g++?)")


def _png_bytes(img) -> bytes:
    b = io.BytesIO()
    img.save(b, "PNG")
    return b.getvalue()


def _all_mode_images():
    from PIL import Image
    rs = np.random.RandomState(7)
    return {
        "rgb": Image.fromarray(
            rs.randint(0, 256, (37, 53, 3), dtype=np.uint8), "RGB"),
        "rgba": Image.fromarray(
            rs.randint(0, 256, (64, 48, 4), dtype=np.uint8), "RGBA"),
        "gray": Image.fromarray(
            rs.randint(0, 256, (31, 33), dtype=np.uint8), "L"),
        "gray_alpha": Image.fromarray(
            np.dstack([rs.randint(0, 256, (20, 21), dtype=np.uint8)] * 2),
            "LA"),
        "palette": Image.fromarray(
            rs.randint(0, 256, (25, 26, 3), dtype=np.uint8),
            "RGB").convert("P"),
    }


def test_decode_rgba_matches_pil_exactly():
    from PIL import Image
    for name, img in _all_mode_images().items():
        data = _png_bytes(img)
        ours = native.decode_png_rgba(data)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
        assert ours is not None, name
        np.testing.assert_array_equal(ours, ref, err_msg=name)


def test_decode_handles_all_png_filters():
    """Exercise Sub/Up/Average/Paeth unfiltering: smooth gradients make the
    encoder pick non-trivial filters per row."""
    from PIL import Image
    x = np.linspace(0, 255, 97)[None, :] + np.linspace(0, 255, 83)[:, None]
    img = np.stack([x % 256, (x * 3) % 256, (255 - x) % 256],
                   -1).astype(np.uint8)
    data = _png_bytes(Image.fromarray(img, "RGB"))
    ours = native.decode_png_rgba(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(ours, ref)


def test_masked_tensor_fusion_matches_numpy():
    from PIL import Image
    data = _png_bytes(_all_mode_images()["rgba"])
    arr = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"),
                     np.float32) / 255.0
    want = (arr[..., :3] * 2.0 - 1.0) * arr[..., 3:4]
    got = native.decode_masked_tensor(data, 3)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rgb_alpha_split():
    from PIL import Image
    data = _png_bytes(_all_mode_images()["rgba"])
    arr = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"),
                     np.float32) / 255.0
    rgb, alpha = native.decode_rgb_alpha(data)
    np.testing.assert_allclose(rgb, arr[..., :3], atol=1e-6)
    np.testing.assert_allclose(alpha, arr[..., 3], atol=1e-6)


def test_unsupported_png_falls_back():
    """Interlaced PNGs return None (the wrapper's PIL-fallback contract).
    PIL won't *write* Adam7, so flag it by patching the IHDR interlace byte
    (offset 28 = 8 sig + 8 len/type + 12; the decoder checks the flag before
    touching IDAT and does not verify chunk CRCs)."""
    data = bytearray(_png_bytes(_all_mode_images()["rgb"]))
    assert data[28] == 0
    data[28] = 1
    assert native.decode_png_rgba(bytes(data)) is None


def test_truncated_and_garbage_inputs():
    data = _png_bytes(_all_mode_images()["rgb"])
    assert native.decode_png_rgba(data[: len(data) // 2]) is None
    assert native.decode_png_rgba(b"not a png at all") is None


def test_imagepath2tensor_uses_native(tmp_path):
    """The dataset decode helper produces identical output with the native
    path enabled and disabled (PIL fallback)."""
    from icon_tpu.data.datasets import _imagepath2tensor
    p = str(tmp_path / "x.png")
    _all_mode_images()["rgba"].save(p)
    got = _imagepath2tensor(p, 3)
    os.environ["ICON_TPU_NATIVE"] = "0"
    try:
        # force a fresh decision: the module caches the lib, but the env
        # check happens at load; simulate by calling the PIL branch directly
        from PIL import Image
        rgba = Image.open(p).convert("RGBA")
        arr = np.asarray(rgba, np.float32) / 255.0
        want = ((arr[..., :3] * 2.0 - 1.0) * arr[..., 3:4]).astype(np.float32)
    finally:
        os.environ.pop("ICON_TPU_NATIVE", None)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_decode_releases_gil(tmp_path):
    """The property the threaded DataLoader depends on: a pure-Python
    counter thread keeps making progress while a decode thread loops native
    decodes. With the GIL held during decode the counter would be starved
    for the decode's full duration (PIL-style); with it released the counter
    runs essentially unimpeded. Progress ratios are load-robust where
    wall-clock comparisons (threaded-vs-serial speedup) are not."""
    import threading
    import time
    from PIL import Image
    rs = np.random.RandomState(0)
    p = str(tmp_path / "big.png")
    # incompressible -> a few ms of native decode per call
    Image.fromarray(rs.randint(0, 256, (512, 512, 4), dtype=np.uint8),
                    "RGBA").save(p)
    data = open(p, "rb").read()
    native.decode_png_rgba(data)  # warm lib

    stop = threading.Event()
    counts = {"n": 0}

    def counter():
        while not stop.is_set():
            counts["n"] += 1

    def measure(work, reps):
        counts["n"] = 0
        t = threading.Thread(target=counter)
        t.start()
        t0 = time.perf_counter()
        for _ in range(reps):
            work()
        dt = time.perf_counter() - t0
        stop.set()
        t.join()
        stop.clear()
        return counts["n"] / dt  # counter increments per second

    baseline = measure(lambda: time.sleep(0.002), 50)     # GIL fully free
    with_decode = measure(lambda: native.decode_png_rgba(data), 50)
    # GIL-held decode would collapse this toward the sys.setswitchinterval
    # duty cycle (measured ~0.02x); GIL-free stays within the same order.
    assert with_decode > 0.2 * baseline, (with_decode, baseline)


def test_native_lattice_decode_matches_numpy():
    """The C++ lattice decoder must reproduce the numpy fallback
    bit-for-bit (verts) and as a face set."""
    import numpy as np
    import jax.numpy as jnp
    import icon_tpu.native as native
    from icon_tpu.recon import marching

    if not native.available():
        import pytest
        pytest.skip("no native toolchain")

    g = np.linspace(-1, 1, 49)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    occ = jnp.asarray(1 / (1 + np.exp(-(0.6 - np.sqrt(
        (xx / 0.7) ** 2 + yy ** 2 + (zz / 0.5) ** 2)) * 9))
        .astype(np.float32))
    out = marching.marching_lattice(occ, max_cells=1 << 14,
                                    max_verts=1 << 15)
    packed = marching.pack_lattice(out)
    packed = (np.asarray(packed[0]), packed[1], packed[2])

    v_nat, f_nat = marching.decode_lattice(packed, 49, 49)
    saved, saved_tried = native._lib, native._tried
    try:
        native._lib, native._tried = None, True    # force numpy fallback
        v_np, f_np = marching.decode_lattice(packed, 49, 49)
    finally:
        native._lib, native._tried = saved, saved_tried

    assert (v_nat == v_np).all()
    assert len(f_nat) == len(f_np)
    assert set(map(tuple, f_nat.tolist())) == set(map(tuple, f_np.tolist()))
