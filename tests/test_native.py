"""Native C++ loader tests: PNG decode correctness vs OpenCV, in-order
prefetch delivery, native association vs the Python implementation."""

import os

import cv2
import numpy as np
import pytest

from rgbd_visualodometry_tpu import native
from rgbd_visualodometry_tpu.io.tum import associate

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


@pytest.fixture(scope="module")
def png_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("tum")
    rng = np.random.default_rng(0)
    rgb_paths, depth_paths, rgbs, depths = [], [], [], []
    for i in range(6):
        rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        depth = rng.integers(0, 40000, (48, 64), dtype=np.uint16)
        rp = str(d / f"rgb_{i}.png")
        dp = str(d / f"depth_{i}.png")
        cv2.imwrite(rp, rgb[..., ::-1])  # cv2 writes BGR
        cv2.imwrite(dp, depth)
        rgb_paths.append(rp)
        depth_paths.append(dp)
        rgbs.append(rgb)
        depths.append(depth)
    return rgb_paths, depth_paths, rgbs, depths


def test_native_decode_matches_opencv(png_dataset):
    rgb_paths, depth_paths, rgbs, depths = png_dataset
    loader = native.NativeLoader(rgb_paths, depth_paths, width=64, height=48)
    count = 0
    for idx, rgb, depth in loader:
        np.testing.assert_array_equal(rgb, rgbs[idx])
        np.testing.assert_array_equal(depth, depths[idx])
        count += 1
    assert count == 6


def test_native_loader_in_order(png_dataset):
    rgb_paths, depth_paths, *_ = png_dataset
    loader = native.NativeLoader(rgb_paths, depth_paths, 64, 48, prefetch=3, workers=3)
    indices = [idx for idx, _, _ in loader]
    assert indices == list(range(6))


def test_native_loader_size_mismatch(png_dataset):
    rgb_paths, depth_paths, *_ = png_dataset
    loader = native.NativeLoader(rgb_paths, depth_paths, width=10, height=10)
    with pytest.raises(IOError):
        list(loader)


def test_native_associate_matches_python():
    rng = np.random.default_rng(1)
    t1 = np.sort(rng.uniform(0, 10, 40))
    t2 = np.sort(t1[:30] + rng.normal(0, 0.008, 30))
    a = associate(t1, t2)
    b = native.native_associate(t1, t2)
    assert a == b


def test_native_associate_window_and_offset():
    assert native.native_associate([0.0, 1.0], [0.015, 2.0]) == [(0, 0)]
    assert native.native_associate([10.0], [9.5], offset=0.5) == [(0, 0)]
