"""CLI-level tests: the click entrypoints (train, train_refine, eval_path)
wire config loading, datasets, training, checkpointing, resume, and the
metric harness end to end — pinning the argument surface of the reference
CLIs (/root/reference/lidiff/train.py, train_refine.py,
utils/eval_path.py) that the class-level tests bypass."""

import os

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

from lidiff_tpu.utils import ply
from tests.helpers import make_kitti_tree

pytestmark = pytest.mark.slow

NF = 600


def _base_cfg(data_dir, exp_id, **over):
    cfg = {
        "experiment": {"id": exp_id},
        "data": {"data_dir": data_dir, "resolution": 0.05,
                 "dataloader": "KITTI", "split": "train", "train": ["00"],
                 "validation": ["00"], "test": [], "num_points": NF,
                 "max_range": 50.0, "dataset_norm": False,
                 "std_axis_norm": False, "scan_window": 3},
        "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": 1,
                  "num_workers": 1, "max_epoch": 1, "lr": 1e-4,
                  "batch_size": 1, "decay_lr": 1e-4, "up_factor": 2},
        "diff": {"beta_start": 3.5e-5, "beta_end": 0.007,
                 "beta_func": "linear", "t_steps": 100, "s_steps": 2,
                 "reg_weight": 5.0},
        "model": {"out_dim": 96, "cr": 0.5},
        "tpu": {"full_capacities": [768, 512, 384, 256, 256],
                "part_capacities": [128, 128, 128, 128, 128],
                "remat": False},
    }
    for sec, kv in over.items():
        cfg.setdefault(sec, {}).update(kv)
    return cfg


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    make_kitti_tree(root, seq="00", n_scans=4, n_points=2000)
    return root


def test_train_cli_steps_then_resume(tree, tmp_path, monkeypatch):
    from lidiff_tpu import train as train_mod
    monkeypatch.chdir(tmp_path)
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(_base_cfg(tree, "cli_diff"), f)

    r = CliRunner().invoke(train_mod.main,
                           ["-c", cfg_path, "--max_steps", "2"],
                           catch_exceptions=False)
    assert r.exit_code == 0, r.output
    exp = tmp_path / "experiments" / "cli_diff"
    assert (exp / "hparams.yaml").is_file()
    ckpts = exp / "checkpoints"
    assert ckpts.is_dir() and any(ckpts.iterdir()), r.output

    # resume from the experiment dir: restores step=2, trains one more
    r2 = CliRunner().invoke(
        train_mod.main,
        ["-c", cfg_path, "-ckpt", str(exp), "--max_steps", "3"],
        catch_exceptions=False)
    assert r2.exit_code == 0, r2.output


def test_train_refine_cli(tree, tmp_path, monkeypatch):
    from lidiff_tpu import train_refine as refine_mod
    monkeypatch.chdir(tmp_path)
    cfg_path = str(tmp_path / "cfg_refine.yaml")
    cfg = _base_cfg(tree, "cli_refine",
                    data={"num_points": 400},
                    train={"mode": "refine"},
                    tpu={"full_capacities": [512, 384, 256, 256, 256]})
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    r = CliRunner().invoke(refine_mod.main,
                           ["-c", cfg_path, "--max_steps", "2"],
                           catch_exceptions=False)
    assert r.exit_code == 0, r.output
    exp = tmp_path / "experiments" / "cli_refine"
    assert (exp / "hparams.yaml").is_file()
    assert any((exp / "checkpoints").iterdir()), r.output


def test_eval_path_presaved(tree, tmp_path):
    """eval_path -p mode: metrics over pre-saved completions, res_log.yaml
    with the reference's key schema (eval_path.py:159-170)."""
    import json

    from lidiff_tpu.data import preprocess
    from lidiff_tpu.tools import eval_path as ep

    seq_dir = os.path.join(tree, "dataset", "sequences", "00")
    pred_dir = str(tmp_path / "preds")
    os.makedirs(pred_dir)
    vdir = os.path.join(seq_dir, "velodyne")
    for scan in sorted(os.listdir(vdir))[:2]:
        pts = preprocess.read_scan(os.path.join(vdir, scan))
        pts = pts[np.linalg.norm(pts, axis=-1) < 50.0]
        ply.write_ply(os.path.join(pred_dir,
                                   scan.replace(".bin", ".ply")), pts)

    r = CliRunner().invoke(
        ep.main, ["-p", pred_dir, "--data", seq_dir, "--max_scans", "2"],
        catch_exceptions=False)
    assert r.exit_code == 0, r.output

    with open(os.path.join(pred_dir, "res_log.yaml")) as f:
        res = json.load(f)
    for k in ["jsd", "jsd_noclip_3d", "rmse_mean", "rmse_std", "ious",
              "cd_mean", "cd_std", "pr", "re", "f1"]:
        assert k in res, k
    assert set(res["ious"]) == {"0.5", "0.2", "0.1"}
    vals = [res[k] for k in ["jsd", "rmse_mean", "cd_mean", "pr", "f1"]]
    assert np.isfinite(vals).all(), res
