"""Point-cloud inspection (≙ ``utils/o3dviewer.py``).

Open3D isn't available in the TPU image; ``dump_pointcloud`` writes
xyz(+rgb) text files loadable by any viewer (the same format the reference
debug-dumps with np.savetxt, e.g. ``hand_base.py:328-331``), and
``PointCloudViewer`` matches the reference's update-loop API, rendering to
matplotlib scatter snapshots when available.
"""

from __future__ import annotations

import os

import numpy as np


def dump_pointcloud(path: str, points: np.ndarray, colors=None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    pts = np.asarray(points).reshape(-1, 3)
    if colors is not None:
        pts = np.concatenate([pts, np.asarray(colors).reshape(-1, 3)], -1)
    np.savetxt(path, pts)


class PointCloudViewer:
    """Drop-in for the o3d live viewer: ``update(points)`` writes numbered
    scatter snapshots under ``out_dir``."""

    def __init__(self, out_dir: str = "/tmp/partmanip_viewer"):
        self.out_dir = out_dir
        self.count = 0
        os.makedirs(out_dir, exist_ok=True)

    def update(self, points: np.ndarray):
        pts = np.asarray(points).reshape(-1, 3)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig = plt.figure(figsize=(6, 6))
            ax = fig.add_subplot(projection="3d")
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1)
            fig.savefig(os.path.join(self.out_dir, f"pc_{self.count:05d}.png"))
            plt.close(fig)
        except ImportError:
            dump_pointcloud(
                os.path.join(self.out_dir, f"pc_{self.count:05d}.txt"), pts)
        self.count += 1
