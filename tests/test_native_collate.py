"""Native C++ collation: build, exact parity with the numpy path, speed."""

import time

import numpy as np
import pytest

from pero_pretraining_tpu.data import native
from pero_pretraining_tpu.data.batching import BatchCreator


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native collate library unavailable (g++ missing?)")
    return native.get_lib()


def _items(rng, n, labeled=True, paired=False):
    items = []
    for _ in range(n):
        w = int(rng.randint(64, 512))
        img = rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8)
        item = {
            "image": img,
            "image2": np.copy(img) if paired else None,
            "labels": rng.randint(0, 100, size=-(-w // 8)).tolist() if labeled else None,
            "image_id": "x",
        }
        items.append(item)
    return items


def test_pack_lines_direct(lib, rng):
    images = [rng.randint(0, 256, size=(40, w, 3)).astype(np.uint8) for w in (64, 200, 512)]
    lps = [2, 0, 0]
    canvas, masks = native.pack_lines(images, lps, 512, 8)
    assert canvas.shape == (3, 40, 512, 3)
    np.testing.assert_array_equal(canvas[0, :, 16:80], images[0])
    assert masks[0, :2].sum() == 0 and masks[0, 2:10].sum() == 8
    np.testing.assert_array_equal(canvas[2], images[2])
    assert masks[2].all()


def test_native_matches_numpy_batches(lib, rng):
    """Same seed -> bit-identical batches from the native and numpy paths."""
    items = _items(rng, 16, labeled=True, paired=True)
    b_native = BatchCreator(pad_to=512, seed=123, use_native=True).create_batch(items)
    b_numpy = BatchCreator(pad_to=512, seed=123, use_native=False).create_batch(items)
    for key in ("images", "image_masks", "labels", "images2", "image_masks2", "shifts", "shift_masks", "shift_masks2"):
        np.testing.assert_array_equal(b_native[key], b_numpy[key], err_msg=key)


def test_native_jpeg_decode_matches_cv2(lib, rng):
    import cv2

    from pero_pretraining_tpu.data.dataset import decode_image

    img = rng.randint(0, 256, size=(40, 300, 3)).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 92])
    data = enc.tobytes()

    ours = native.decode_jpeg(data)
    ref = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(ours, ref)  # same libjpeg family: bit-identical

    batch = native.decode_jpeg_batch([data] * 16)
    for b in batch:
        np.testing.assert_array_equal(b, ref)

    # dataset entry point routes JPEGs through the native path
    np.testing.assert_array_equal(decode_image(data), ref)
    # corrupt input degrades gracefully
    assert native.decode_jpeg(b"\xff\xd8 garbage") is None


def test_native_not_slower(lib, rng):
    """Both paths are memory-bandwidth-bound memcpy; the native path must be
    in the same ballpark (its value is threading headroom at large batches
    and keeping the hot loop out of Python)."""
    items = _items(rng, 64, labeled=True)
    fast = BatchCreator(pad_to=2048, seed=0, use_native=True)
    slow = BatchCreator(pad_to=2048, seed=0, use_native=False)

    def timeit(creator, reps=10):
        creator.create_batch(items)  # warmup (lib build, page faults)
        t0 = time.perf_counter()
        for _ in range(reps):
            creator.create_batch(items)
        return (time.perf_counter() - t0) / reps

    t_native = timeit(fast)
    t_numpy = timeit(slow)
    # report-only: wall-clock assertions are flaky on loaded CI machines;
    # correctness is covered by the bit-identical parity test above
    print(f"collate batch64/w2048: native {t_native*1000:.2f} ms vs numpy {t_numpy*1000:.2f} ms")
