"""Point-cloud viewer (reference /root/reference/lidiff/vis_pcd.py).

Open3D is not in this image; when available we use it, otherwise we fall
back to a matplotlib scatter (headless-safe with --save)."""

from __future__ import annotations

import click
import numpy as np

from lidiff_tpu.tools.diff_completion_pipeline import load_pcd


def crop(points: np.ndarray, radius: float, z_min: float) -> np.ndarray:
    d = np.linalg.norm(points[:, :2], axis=-1)
    return points[(d < radius) & (points[:, 2] > z_min)]


@click.command()
@click.option("--pcd", "-p", type=str, required=True)
@click.option("--radius", "-r", type=float, default=50.0)
@click.option("--z_min", "-z", type=float, default=-4.0)
@click.option("--save", "-s", type=str, default=None,
              help="save a PNG instead of opening a window")
def main(pcd, radius, z_min, save):
    points = crop(load_pcd(pcd), radius, z_min)
    try:
        import open3d as o3d
        cloud = o3d.geometry.PointCloud()
        cloud.points = o3d.utility.Vector3dVector(points)
        o3d.visualization.draw_geometries([cloud])
        return
    except ImportError:
        pass
    import matplotlib
    if save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(projection="3d")
    sub = points[:: max(1, len(points) // 200000)]
    ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=0.1, c=sub[:, 2],
               cmap="viridis")
    ax.set_box_aspect((1, 1, 0.2))
    if save:
        fig.savefig(save, dpi=150)
        print(f"saved {save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
