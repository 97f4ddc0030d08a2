"""Media output helpers: mp4 orbit videos, image grids (reference:
training/object_trainer.py:81-118 video_inference; guidance viz grids)."""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger("dreamscene_tpu")


def write_video(path: str, frames: list[np.ndarray], fps: int = 30) -> bool:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import imageio

        imageio.mimwrite(path, frames, fps=fps, quality=8)
        return True
    except Exception as e:  # codecs may be absent in hermetic envs
        logger.warning("video write failed (%s); dumping npz instead", e)
        np.savez_compressed(path + ".npz", frames=np.stack(frames))
        return False


def save_image_grid(path: str, images: list[np.ndarray]) -> None:
    """Stack [3,H,W] float images horizontally and save as jpg/png."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = [np.clip(np.transpose(i, (1, 2, 0)), 0, 1) for i in images]
    grid = (np.concatenate(imgs, axis=1) * 255).astype(np.uint8)
    try:
        import imageio

        imageio.imwrite(path, grid)
    except Exception:
        np.save(path + ".npy", grid)
