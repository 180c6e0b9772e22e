"""CLI end-to-end tests: train -> resume -> eval -> mesh on the tiny
synthetic config (main() invoked in-process; conftest pins the CPU mesh)."""

import glob
import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from nerfmeshes_tpu.cli import eval_nerf, mesh_nerf, train_nerf


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """One trained tiny run shared by the CLI tests."""
    root = tmp_path_factory.mktemp("cli")
    cfg_path = root / "tiny.yml"
    base = yaml.safe_load(open("/root/repo/configs/tiny.yml"))
    base["experiment"]["logdir"] = str(root / "logs")
    base["experiment"]["train_iters"] = 100
    base["experiment"]["validate_every"] = 100
    base["dataset"]["caching"]["cache_dir"] = str(root / "cache")
    yaml.safe_dump(base, open(cfg_path, "w"))

    train_nerf.main(["--config", str(cfg_path), "--run-name", "t1"])
    logdir = sorted(glob.glob(str(root / "logs/tiny/t1/version_*")))[-1]
    return root, cfg_path, logdir


def test_train_cli_produces_run(tiny_run):
    root, _, logdir = tiny_run
    assert (Path(logdir) / "hparams.yaml").exists()
    assert (Path(logdir) / "checkpoints" / "last").exists()
    metrics = [
        json.loads(l)
        for l in open(Path(logdir) / "events" / "metrics.jsonl")
    ]
    assert any("validation/loss" in m for m in metrics)
    steps = [m["step"] for m in metrics]
    assert max(steps) == 100


def test_train_cli_resume(tiny_run):
    root, _, logdir = tiny_run
    # Resume and train 0 extra steps (train_iters already reached) — must
    # restore cleanly and exit.
    train_nerf.main(["--log-checkpoint", logdir])


def test_train_cli_resume_override_persists(tiny_run):
    """Overrides given on a RESUME must be written back to hparams.yaml,
    or the NEXT resume/eval silently reverts them (e.g. a --precision
    resume trains bf16 but a later eval rebuilds the models in f32)."""
    root, _, logdir = tiny_run
    train_nerf.main(
        ["--log-checkpoint", logdir,
         "--override", "experiment.print_every", "7"]
    )
    flat = yaml.safe_load(open(Path(logdir) / "hparams.yaml"))
    assert flat["experiment.print_every"] == 7


def test_eval_cli(tiny_run, capsys):
    root, _, logdir = tiny_run
    save = root / "eval_out"
    eval_nerf.main(
        ["--log-checkpoint", logdir, "--save-dir", str(save),
         "--save-images", "--save-disparity"]
    )
    out = capsys.readouterr().out
    assert "psnr=" in out and "dataset:" in out
    assert len(list(save.glob("*_rgb.png"))) > 0
    assert len(list(save.glob("*_disparity.png"))) > 0


def test_eval_cli_synthesis(tiny_run, capsys):
    root, _, logdir = tiny_run
    save = root / "synth_out"
    gif = root / "orbit.gif"
    eval_nerf.main(
        ["--log-checkpoint", logdir, "--save-dir", str(save),
         "--synthesis-images", "--synthesis-video", str(gif)]
    )
    # 120 synthesized orbit poses rendered without targets.
    assert len(list(save.glob("*_rgb.png"))) == 120
    from PIL import Image

    assert Image.open(gif).n_frames == 120


def test_mesh_cli(tiny_run):
    root, _, logdir = tiny_run
    save = root / "mesh_out"
    mesh_nerf.main(
        ["--log-checkpoint", logdir, "--save-dir", str(save),
         "--res", "32", "--limit", "1.2", "--iso-level", "5",
         "--batch-size", "8192"]
    )
    obj = save / "mesh.obj"
    assert obj.exists()
    from nerfmeshes_tpu.mesh import import_obj

    verts, faces, colors, normals = import_obj(str(obj))
    assert len(verts) > 50 and len(faces) > 50
    assert colors is not None and np.isfinite(colors).all()


def test_train_cli_override(tmp_path):
    import yaml

    cfg_path = tmp_path / "tiny.yml"
    base = yaml.safe_load(open("/root/repo/configs/tiny.yml"))
    base["experiment"]["logdir"] = str(tmp_path / "logs")
    yaml.safe_dump(base, open(cfg_path, "w"))
    train_nerf.main(
        ["--config", str(cfg_path), "--run-name", "ovr",
         "--override", "experiment.train_iters", "20",
         "experiment.steps_per_call", "5", "nerf.train.num_random_rays", "64"]
    )
    import glob

    logdir = sorted(glob.glob(str(tmp_path / "logs/tiny/ovr/version_*")))[-1]
    metrics = [json.loads(l) for l in open(Path(logdir) / "events" / "metrics.jsonl")]
    assert max(m["step"] for m in metrics) == 20

    # Overrides must survive into hparams.yaml: a resume reads hparams,
    # so an unsaved override would silently revert (regression: the r3
    # 20k run resumed toward the YAML's 250k train_iters).
    flat = yaml.safe_load(open(Path(logdir) / "hparams.yaml"))
    assert flat["experiment.train_iters"] == 20


def test_train_cli_precision_persists(tmp_path):
    """--precision must land in hparams.yaml (same bug class as the
    override ordering: a post-resolve cfg mutation reverts on resume/eval,
    so an eval session would rebuild the models in a different dtype)."""
    cfg_path = tmp_path / "tiny.yml"
    base = yaml.safe_load(open("/root/repo/configs/tiny.yml"))
    base["experiment"]["logdir"] = str(tmp_path / "logs")
    yaml.safe_dump(base, open(cfg_path, "w"))
    train_nerf.main(
        ["--config", str(cfg_path), "--run-name", "prec", "--precision", "32",
         "--override", "experiment.train_iters", "5",
         "experiment.steps_per_call", "5", "experiment.validate_every", "5",
         "nerf.train.num_random_rays", "64"]
    )
    logdir = sorted(glob.glob(str(tmp_path / "logs/tiny/prec/version_*")))[-1]
    flat = yaml.safe_load(open(Path(logdir) / "hparams.yaml"))
    assert flat["experiment.compute_dtype"] == "float32"


def test_train_cli_override_places_run_dir(tmp_path):
    """experiment.id / experiment.logdir overrides must affect the run
    directory (regression: resolve_paths ran before the override merge, so
    `--override experiment.id hard-20k` wrote under the YAML's id)."""
    import yaml

    cfg_path = tmp_path / "tiny.yml"
    base = yaml.safe_load(open("/root/repo/configs/tiny.yml"))
    yaml.safe_dump(base, open(cfg_path, "w"))
    train_nerf.main(
        ["--config", str(cfg_path), "--run-name", "ovr2",
         "--override",
         "experiment.logdir", str(tmp_path / "ovr_logs"),
         "experiment.id", "renamed",
         "experiment.train_iters", "10",
         "experiment.steps_per_call", "5",
         "experiment.validate_every", "10",
         "nerf.train.num_random_rays", "64"]
    )
    import glob

    runs = glob.glob(str(tmp_path / "ovr_logs/renamed/ovr2/version_*"))
    assert len(runs) == 1, runs


def test_mesh_cli_buff(tmp_path):
    """Mesh extraction from a BuFF checkpoint: sigma kernel + sparse
    marching + tree-rendered appearance all engage through the CLI."""
    import glob

    import yaml

    cfg_path = tmp_path / "tiny_buff.yml"
    base = yaml.safe_load(open("/root/repo/configs/tiny.yml"))
    base["experiment"]["logdir"] = str(tmp_path / "logs")
    base["experiment"]["model"] = "BuFFModel"
    yaml.safe_dump(base, open(cfg_path, "w"))
    train_nerf.main(
        ["--config", str(cfg_path), "--run-name", "buffmesh",
         "--override", "experiment.train_iters", "20",
         "experiment.steps_per_call", "5",
         "nerf.train.num_random_rays", "64",
         "tree.subdivision_outer_count", "4",
         "tree.max_voxel_count", "128"]
    )
    logdir = glob.glob(str(tmp_path / "logs" / "*" / "buffmesh" / "version_0"))[0]
    save = tmp_path / "mesh_out"
    mesh_nerf.main(
        ["--log-checkpoint", logdir, "--save-dir", str(save),
         "--res", "32", "--limit", "1.2", "--iso-level", "5",
         "--batch-size", "8192"]
    )
    obj = save / "mesh.obj"
    assert obj.exists()
    from nerfmeshes_tpu.mesh import import_obj

    verts, faces, colors, _ = import_obj(str(obj))
    assert len(verts) > 50 and len(faces) > 50
    assert colors is not None and np.isfinite(colors).all()
