"""Host data pipeline: poses, transforms, collation, datasets, loader,
PLY I/O, natural sort, FPS, native kernels."""

import os

import numpy as np
import pytest

from lidiff_tpu.data import collation, preprocess, transforms
from lidiff_tpu.data.kitti import TemporalKITTIAggrDataset, TemporalKITTIDataset
from lidiff_tpu.data.loader import DataLoader
from lidiff_tpu.ops.fps import fps, fps_numpy
from lidiff_tpu.utils import ply
from lidiff_tpu.utils.natsort import natsorted
from tests.helpers import make_kitti_tree


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    make_kitti_tree(root, "00", n_scans=4, n_points=2500)
    return root


def test_natsorted():
    assert natsorted(["10.bin", "2.bin", "1.bin"]) == \
        ["1.bin", "2.bin", "10.bin"]


def test_poses_roundtrip(kitti_root):
    sdir = os.path.join(kitti_root, "dataset", "sequences", "00")
    poses = preprocess.load_poses(os.path.join(sdir, "calib.txt"),
                                  os.path.join(sdir, "poses.txt"))
    assert len(poses) == 4
    np.testing.assert_allclose(poses[2][0, 3], 4.0)
    pts = np.random.default_rng(0).normal(size=(10, 3))
    back = preprocess.undo_transform(
        preprocess.apply_transform(pts, poses[2]), poses[2])
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_transforms_preserve_shape_and_norms():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    rot = transforms.rotate_yaw(pts, np.random.default_rng(2))
    np.testing.assert_allclose(np.linalg.norm(rot, axis=1),
                               np.linalg.norm(pts, axis=1), rtol=1e-4)
    pert = transforms.rotate_perturbation(pts, np.random.default_rng(3))
    np.testing.assert_allclose(np.linalg.norm(pert, axis=1),
                               np.linalg.norm(pts, axis=1), rtol=1e-4)
    sc = transforms.random_scale(pts, np.random.default_rng(4))
    ratio = np.linalg.norm(sc, axis=1) / np.maximum(
        np.linalg.norm(pts, axis=1), 1e-9)
    assert 0.95 <= ratio.min() and ratio.max() <= 1.05


def test_fps_spread():
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    sub = fps(pts, 50)
    assert sub.shape == (50, 3)
    # FPS picks points more spread out than random: min pairwise distance
    d_fps = np.min(
        np.linalg.norm(sub[:, None] - sub[None], axis=-1)
        + np.eye(50) * 1e9)
    rnd = pts[rng.choice(2000, 50, replace=False)]
    d_rnd = np.min(
        np.linalg.norm(rnd[:, None] - rnd[None], axis=-1)
        + np.eye(50) * 1e9)
    assert d_fps > d_rnd


def test_fps_native_matches_numpy():
    pytest.importorskip("lidiff_tpu.native")
    from lidiff_tpu import native
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(6)
    pts = rng.normal(size=(400, 3)).astype(np.float32)
    i_native = native.fps_native(pts, 40)
    i_np = fps_numpy(pts, 40)
    np.testing.assert_array_equal(i_native, i_np)


def test_native_voxel_unique_matches_numpy(kitti_root):
    from lidiff_tpu import native
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    pts = rng.normal(0, 2, size=(3000, 3)).astype(np.float32)
    i_native = np.sort(native.voxel_unique_native(pts, 0.5))
    i_np = preprocess.voxel_unique_index(pts, 0.5)
    # same voxel set (first-occurrence rule may pick different points only
    # if keys collide — they cannot here)
    np.testing.assert_array_equal(i_native, i_np)


def test_viewpoint_filter():
    part = np.array([[0., 0., 0.], [25., 0., 0.]], np.float32)
    full = np.array([[1., 1., 1.], [26., 2., 1.], [80., 80., 0.]],
                    np.float32)
    keep = collation.viewpoint_filter(full, part, voxel=10.0)
    assert keep.tolist() == [True, True, False]


def test_point_set_to_sparse_shapes():
    rng = np.random.default_rng(8)
    p_full = rng.normal(0, 10, size=(5000, 3)).astype(np.float32)
    p_part = p_full[rng.choice(5000, 700, replace=False)]
    out = collation.point_set_to_sparse(p_full, p_part, 4000, 400, "f",
                                        rng=rng)
    assert out["pcd_full"].shape == (4000, 3)
    assert out["pcd_part"].shape == (400, 3)
    assert out["mean"].shape == (3,) and out["std"].shape == (3,)


def test_dataset_diffusion_item(kitti_root):
    ds = TemporalKITTIDataset(kitti_root, ["00"], "train", 0.05,
                              num_points=2000, max_range=50.0)
    assert len(ds) == 4
    item = ds[1]
    assert item["pcd_full"].shape == (2000, 3)
    assert item["pcd_part"].shape == (200, 3)
    # all partial points inside range crop
    d = np.linalg.norm(item["pcd_part"], axis=-1)
    assert d.max() < 50.0 * 1.06   # augmentation scale margin


def test_dataset_refine_item(kitti_root):
    ds = TemporalKITTIAggrDataset(kitti_root, scan_window=3, seqs=["00"],
                                  split="train", resolution=0.05,
                                  num_points=1500)
    item = ds[0]
    assert item["pcd_full"].shape == (3000, 3)
    assert item["pcd_noise"].shape == (1500, 3)


def test_loader_batches(kitti_root):
    ds = TemporalKITTIDataset(kitti_root, ["00"], "validation", 0.05,
                              num_points=1000, max_range=50.0)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["pcd_full"].shape == (2, 1000, 3)
    assert b["pcd_part"].shape == (2, 100, 3)
    assert len(b["filename"]) == 2


def test_loader_prefetch_bounded():
    """Workers must never materialize more than prefetch + num_workers
    batches ahead of the consumer (bounded host RAM at the 180k operating
    point); regression test for the unbounded results-dict drain."""
    import threading
    import time as _time

    built = []
    built_lock = threading.Lock()

    class SlowConsumeDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with built_lock:
                built.append(i)
            return {"pcd_full": np.zeros((8, 3), np.float32),
                    "pcd_part": np.zeros((2, 3), np.float32),
                    "mean": np.zeros(3, np.float32),
                    "std": np.ones(3, np.float32),
                    "filename": str(i)}

    prefetch, workers, batch = 2, 3, 1
    loader = DataLoader(SlowConsumeDataset(), batch_size=batch,
                        num_workers=workers, prefetch=prefetch)
    consumed = 0
    max_ahead = 0
    for _ in loader:
        consumed += 1
        _time.sleep(0.02)     # slow consumer: workers would race ahead
        with built_lock:
            ahead = len(built) - consumed
        max_ahead = max(max_ahead, ahead)
    assert consumed == 64
    # each batch is `batch` items; allow the one being handed over
    assert max_ahead <= (prefetch + workers + 1) * batch, max_ahead


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    pts = rng.normal(size=(123, 3)).astype(np.float32)
    nrm = rng.normal(size=(123, 3)).astype(np.float32)
    p = str(tmp_path / "x.ply")
    ply.write_ply(p, pts, nrm)
    out = ply.read_ply(p)
    np.testing.assert_allclose(out["points"], pts, rtol=1e-6)
    np.testing.assert_allclose(out["normals"], nrm, rtol=1e-6)


def test_map_builder(kitti_root):
    from lidiff_tpu.tools.map_from_scans import build_map
    sdir = os.path.join(kitti_root, "dataset", "sequences", "00")
    m = build_map(sdir, 0.1, progress=False)
    assert len(m) > 1000
    # no duplicate voxels at 0.1
    keep = preprocess.voxel_unique_index(m, 0.1)
    assert len(keep) == len(m)


def test_aggregate_pcds(kitti_root):
    sdir = os.path.join(kitti_root, "dataset", "sequences", "00")
    paths = [os.path.join(sdir, "velodyne", f"{i:06d}.bin")
             for i in range(3)]
    full, part = preprocess.aggregate_pcds(paths, kitti_root, t_frame=1)
    assert full.ndim == 2 and full.shape[1] == 3
    assert part.ndim == 2 and len(part) > 0
