"""Image layout helpers (reference: src/visualization/layout.py)."""

from __future__ import annotations

import numpy as np


def _pad_to(image: np.ndarray, h: int, w: int, value: float = 1.0) -> np.ndarray:
    ph = h - image.shape[0]
    pw = w - image.shape[1]
    top, left = ph // 2, pw // 2
    return np.pad(
        image,
        ((top, ph - top), (left, pw - left), (0, 0)),
        constant_values=value,
    )


def hcat(*images: np.ndarray, gap: int = 8, value: float = 1.0) -> np.ndarray:
    h = max(im.shape[0] for im in images)
    padded = [_pad_to(im, h, im.shape[1], value) for im in images]
    spacer = np.full((h, gap, images[0].shape[2]), value, images[0].dtype)
    parts = []
    for i, im in enumerate(padded):
        if i:
            parts.append(spacer)
        parts.append(im)
    return np.concatenate(parts, axis=1)


def vcat(*images: np.ndarray, gap: int = 8, value: float = 1.0) -> np.ndarray:
    w = max(im.shape[1] for im in images)
    padded = [_pad_to(im, im.shape[0], w, value) for im in images]
    spacer = np.full((gap, w, images[0].shape[2]), value, images[0].dtype)
    parts = []
    for i, im in enumerate(padded):
        if i:
            parts.append(spacer)
        parts.append(im)
    return np.concatenate(parts, axis=0)


def add_border(image: np.ndarray, border: int = 8, value: float = 1.0) -> np.ndarray:
    return np.pad(
        image,
        ((border, border), (border, border), (0, 0)),
        constant_values=value,
    )
