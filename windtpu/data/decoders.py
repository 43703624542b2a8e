"""Normalizers ("decoders") — numpy host-side, matching the reference
semantics exactly (data_generator.py:338-417).

These run on the host data pipeline before device infeed; reductions are
over axes (0, 1, 2) of a single (T, H, W, C) patch, i.e. per channel.
"""

from __future__ import annotations

import numpy as np


class NaiveDecoder:
    """Per-channel z-score over (T, H, W) (reference :338-360)."""

    def __init__(self, normalize: bool = True):
        self.normalize_input = normalize

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if self.normalize_input:
            img = self.normalize(img)
        return img

    def normalize(self, img):
        mean = np.nanmean(img, axis=(0, 1, 2), keepdims=True)
        std = np.nanstd(img, axis=(0, 1, 2), keepdims=True)
        return (img - mean) / std

    def normalize_positive(self, img):
        mn = np.nanmin(img, axis=(0, 1, 2), keepdims=True)
        mx = np.nanmax(img, axis=(0, 1, 2), keepdims=True)
        return (img - mn) / (mx - mn)

    def denormalize(self, img):
        return img * np.nanstd(img) + np.nanmean(img)

    def denormalize_positive(self, img):
        return np.nanmin(img) + img * (np.nanmax(img) - np.nanmin(img))


class _RangeClipDecoder:
    """Shared zero-masking + range clipping (reference :363-417)."""

    def __init__(self, value_range, below_val=np.nan, normalize=False):
        self.value_range = value_range
        self.below_val = below_val
        self.normalize_output = normalize

    def __call__(self, img: np.ndarray) -> np.ndarray:
        valid = img != 0
        img_dec = np.full(img.shape, np.nan, dtype=np.float32)
        img_dec[valid] = img[valid]
        img_dec[img_dec < self.value_range[0]] = self.below_val
        img_dec.clip(max=self.value_range[1], out=img_dec)
        if self.normalize_output:
            img_dec = self.normalize(img_dec)
        return img_dec


class WindSpeedDecoder(_RangeClipDecoder):
    """Log-range clip decoder for wind speed (reference :363-389)."""

    def __init__(self, value_range=(np.log10(0.1), np.log10(100)),
                 below_val=np.nan, normalize=False):
        super().__init__(value_range, below_val, normalize)

    def normalize(self, img):
        return (img - self.below_val) / (self.value_range[1] - self.below_val)

    def denormalize(self, img, set_nan=True):
        img = img * (self.value_range[1] - self.below_val) + self.below_val
        img[img < self.value_range[0]] = self.below_val
        if set_nan:
            img[img == self.below_val] = np.nan
        return img


class WindComponentDecoder(_RangeClipDecoder):
    """Range-clip + z-score decoder for wind components (reference
    :392-417)."""

    def __init__(self, value_range=(-10, 10), below_val=np.nan,
                 normalize=True):
        super().__init__(value_range, below_val, normalize)

    def normalize(self, img):
        return (img - np.mean(img)) / np.std(img)

    def denormalize(self, img, set_nan=True):
        img = img * np.std(img) + np.mean(img)
        img[img < self.value_range[0]] = self.below_val
        if set_nan:
            img[img == self.below_val] = np.nan
        return img
