"""Native C++ data-path (JPEG decode + Lanczos resize) parity vs PIL."""

from io import BytesIO

import numpy as np
import pytest
from PIL import Image

from my_depthsplat_tpu import native
from my_depthsplat_tpu.data.re10k import decode_jpeg_batch
from my_depthsplat_tpu.data.shims import _rescale_lanczos_batch

requires_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _jpegs(n=5, h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 255, (n, h, w, 3)).astype(np.uint8)
    bufs = []
    for im in imgs:
        bio = BytesIO()
        Image.fromarray(im).save(bio, format="JPEG", quality=90)
        bufs.append(bio.getvalue())
    return bufs


@requires_native
def test_decode_bit_exact_vs_pil():
    bufs = _jpegs()
    got = native.decode_jpeg_batch(bufs, 96, 128)
    want = np.stack(
        [np.asarray(Image.open(BytesIO(b)).convert("RGB")) for b in bufs]
    )
    np.testing.assert_array_equal(got, want)


@requires_native
def test_jpeg_dims():
    bufs = _jpegs(n=1, h=33, w=47)
    assert native.jpeg_dims(bufs[0]) == (33, 47, 3)
    assert native.jpeg_dims(b"not a jpeg") is None


@requires_native
@pytest.mark.parametrize("oh,ow", [(41, 65), (150, 260), (96, 128)])
def test_resize_bit_exact_vs_pil(oh, ow):
    rng = np.random.default_rng(1)
    src = rng.uniform(0, 255, (3, 77, 123, 3)).astype(np.uint8)
    got = native.resize_lanczos_batch(src, oh, ow)
    want = np.stack(
        [
            np.asarray(Image.fromarray(s).resize((ow, oh), Image.LANCZOS))
            for s in src
        ]
    )
    np.testing.assert_array_equal(got, want)


def test_decode_batch_fallback_on_corrupt():
    bufs = _jpegs(n=2)
    with pytest.raises(OSError):
        decode_jpeg_batch([bufs[0], bufs[1][:40]])


@requires_native
def test_native_rejects_truncated_jpeg():
    """Truncated JPEGs decode 'successfully' in libjpeg (premature-EOF is a
    warning + gray fill, not error_exit). The native path must report them as
    failures so callers fall back to PIL, whose OSError drives the dataset
    hygiene skips (dl3dv.py)."""
    bufs = _jpegs(n=1, h=96, w=128)
    # Cut after the header/scan start but before the stream ends: dims still
    # parse, scanlines run out mid-image.
    trunc = bufs[0][: len(bufs[0]) // 2]
    assert native.jpeg_dims(trunc) is not None  # header is intact
    assert native.decode_jpeg_batch([trunc], 96, 128) is None


@requires_native
def test_truncated_jpeg_raises_oserror_end_to_end():
    bufs = _jpegs(n=2)
    trunc = bufs[1][: len(bufs[1]) // 2]
    with pytest.raises(OSError):
        decode_jpeg_batch([bufs[0], trunc])


def test_shim_batch_resize_matches_scalar_path():
    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (4, 60, 90, 3)).astype(np.float32)
    got = _rescale_lanczos_batch(imgs, (30, 45))
    want = np.stack(
        [
            np.asarray(
                Image.fromarray(
                    np.clip(im * 255.0, 0, 255).astype(np.uint8)
                ).resize((45, 30), Image.LANCZOS)
            ).astype(np.float32)
            / 255.0
            for im in imgs
        ]
    )
    np.testing.assert_array_equal(got, want)
