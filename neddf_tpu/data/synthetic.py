"""Synthetic NeRF-synthetic-format scene generator (hermetic test data).

Renders a lambertian sphere analytically (ray-sphere intersection +
headlight shading) from cameras on a viewing sphere and writes a
directory in the exact format NeRFSyntheticDataset parses
(transforms_{split}.json + RGBA PNGs). Lets the test suite and demos
run without any bundled assets.
"""
from __future__ import annotations

import json
from pathlib import Path

import cv2
import numpy as np


def _look_at(eye: np.ndarray) -> np.ndarray:
    """4x4 camera-to-world with -z looking at the origin (RUB frame)."""
    forward = -eye / np.linalg.norm(eye)  # camera -z
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(forward, up)) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    m = np.eye(4)
    m[:3, 0] = right
    m[:3, 1] = true_up
    m[:3, 2] = -forward  # RUB: +z is backward
    m[:3, 3] = eye
    return m


def _render_sphere(
    c2w: np.ndarray,
    size: int,
    focal: float,
    radius: float,
    color: np.ndarray,
) -> np.ndarray:
    """RGBA uint8 render of a shaded sphere at the origin."""
    ys, xs = np.mgrid[0:size, 0:size]
    # pixel centers -> RUB camera dirs (pinhole, cx=cy=size/2)
    dx = (xs + 0.5 - size / 2) / focal
    dy = -(ys + 0.5 - size / 2) / focal
    dirs = np.stack([dx, dy, -np.ones_like(dx)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs @ c2w[:3, :3].T
    orig = c2w[:3, 3]

    # ray-sphere: |o + t d|^2 = r^2
    b = 2.0 * dirs @ orig
    c = float(orig @ orig) - radius * radius
    disc = b * b - 4.0 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0, 0.0)
    hit &= t > 0

    p = orig[None, None, :] + t[..., None] * dirs
    normal = p / max(radius, 1e-8)
    # headlight lambertian
    lam = np.clip(-(normal * dirs).sum(-1), 0.0, 1.0)
    shade = (0.2 + 0.8 * lam)[..., None] * color[None, None, :]

    img = np.zeros((size, size, 4), np.uint8)
    img[..., :3] = np.where(hit[..., None], (shade * 255).astype(np.uint8), 0)
    img[..., 3] = np.where(hit, 255, 0).astype(np.uint8)
    return img


def generate_sphere_dataset(
    out_dir,
    n_train: int = 6,
    n_test: int = 2,
    image_size: int = 64,
    camera_distance: float = 4.0,
    radius: float = 0.6,
    seed: int = 0,
) -> Path:
    """Write a minimal NeRF-synthetic-format scene; returns its path."""
    out_dir = Path(out_dir)
    rng = np.random.default_rng(seed)
    camera_angle_x = 2.0 * np.arctan(0.5 * image_size / (1.2 * image_size))
    focal = 0.5 * image_size / np.tan(0.5 * camera_angle_x)
    color = np.array([0.9, 0.55, 0.25])

    for split, count in (("train", n_train), ("test", n_test)):
        (out_dir / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for i in range(count):
            theta = 2 * np.pi * (i + rng.uniform(0, 0.5)) / max(count, 1)
            phi = np.deg2rad(rng.uniform(20, 60))
            eye = camera_distance * np.array(
                [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)]
            )
            c2w = _look_at(eye)
            img = _render_sphere(c2w, image_size, focal, radius, color)
            name = f"./{split}/r_{i}"
            cv2.imwrite(str(out_dir / f"{name}.png"), img)
            frames.append(
                {"file_path": name, "transform_matrix": c2w.tolist()}
            )
        with open(out_dir / f"transforms_{split}.json", "w") as f:
            json.dump(
                {"camera_angle_x": float(camera_angle_x), "frames": frames}, f
            )
    return out_dir
