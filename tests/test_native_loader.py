"""Native C++ loader: builds, decodes JPEG/PNG, matches the numpy bilinear
reference (torch half-pixel semantics), and handles bad paths."""

import numpy as np
import pytest

from cognitive_aim_tpu.io import native_loader
from cognitive_aim_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD
from cognitive_aim_tpu.nn.torch_interp import resize_weights


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    arrs = {}
    for name, fmt in (("a.jpg", "JPEG"), ("b.png", "PNG")):
        arr = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        path = str(d / name)
        Image.fromarray(arr).save(path, format=fmt, quality=98)
        # reread (jpeg is lossy) for the reference comparison
        arrs[path] = np.asarray(Image.open(path).convert("RGB"), np.uint8)
    return arrs


def test_native_build():
    assert native_loader.available(), "native loader failed to build"


def test_decode_matches_reference(images):
    paths = list(images)
    out, ok = native_loader.decode_resize_batch(paths, 48, 64, normalize=True)
    assert ok.all()
    for i, p in enumerate(paths):
        u8 = images[p].astype(np.float32) / 255.0
        Wh = resize_weights(96, 48, "bilinear")
        Ww = resize_weights(128, 64, "bilinear")
        ref = np.einsum("oh,hwc->owc", Wh, u8)
        ref = np.einsum("pw,owc->opc", Ww, ref)
        ref = (ref - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(out[i], ref, atol=2e-3)


def test_bad_path(images):
    paths = list(images)[:1] + ["/nonexistent/xx.jpg"]
    out, ok = native_loader.decode_resize_batch(paths, 32, 32)
    assert ok[0] and not ok[1]
    assert np.all(out[1] == 0.0)


def _exif_jpeg(tmp_path, name="exif.jpg"):
    from PIL import Image

    rng = np.random.RandomState(3)
    img = Image.fromarray((rng.rand(80, 60, 3) * 255).astype(np.uint8))
    ex = Image.Exif()
    ex[271], ex[272] = "TestMake", "TestModel"
    sub = ex.get_ifd(0x8769)
    sub[37386] = 35.0   # FocalLength
    sub[33437] = 4.0    # FNumber
    sub[34855] = 400    # ISOSpeedRatings
    sub[33434] = 0.01   # ExposureTime
    p = str(tmp_path / name)
    img.save(p, "JPEG", exif=ex)
    return p


def test_exif_single_pass(images, tmp_path):
    """The combined decode+EXIF call returns pixels AND the APP1 payload in
    one file pass; parsed tags match the PIL reopen path exactly."""
    from cognitive_aim_tpu.io import exif as exif_io

    p_exif = _exif_jpeg(tmp_path)
    paths = [p_exif] + list(images)  # EXIF jpeg + plain jpeg + png
    u8, ok, payloads = native_loader.decode_resize_batch_u8_exif(paths, 48, 64)
    assert ok.all()
    # pixels identical to the EXIF-less call
    u8_ref, _ = native_loader.decode_resize_batch_u8(paths, 48, 64)
    np.testing.assert_array_equal(u8, u8_ref)
    # payload present only for the EXIF-bearing jpeg
    assert payloads[0] is not None and payloads[0].startswith(b"Exif\x00\x00")
    assert payloads[1] is None and payloads[2] is None
    got = exif_io.extract_exif_from_app1(payloads[0])
    want = exif_io.extract_exif(p_exif)
    assert got == want
    assert got["FocalLength"] == 35.0 and got["FNumber"] == 4.0
    assert got["ISOSpeedRatings"] == 400 and got["Model"] == "TestModel"


def test_exif_app1_python_fallback(images, tmp_path):
    """read_exif_app1 (the no-native fallback) finds the same payload the
    C loader captures, without decoding pixels."""
    from cognitive_aim_tpu.io import exif as exif_io

    p_exif = _exif_jpeg(tmp_path, "exif2.jpg")
    raw = exif_io.read_exif_app1(p_exif)
    _, _, payloads = native_loader.decode_resize_batch_u8_exif([p_exif], 32, 32)
    assert raw == payloads[0]
    assert exif_io.read_exif_app1(list(images)[0]) is None


def test_decode_u8_matches_f32(images):
    paths = list(images)
    u8, ok = native_loader.decode_resize_batch_u8(paths, 48, 64)
    assert ok.all()
    f32, _ = native_loader.decode_resize_batch(paths, 48, 64, normalize=False)
    np.testing.assert_allclose(u8.astype(np.float32) / 255.0, f32, atol=2.0 / 255)

    import jax.numpy as jnp

    normed = np.asarray(native_loader.normalize_u8_on_device(jnp.asarray(u8)))
    ref = (f32 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(normed, ref, atol=0.03)
