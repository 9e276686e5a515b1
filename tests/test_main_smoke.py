"""End-to-end driver smoke test: runs the real CLI in a subprocess (single
CPU device — much faster compiles than the 8-device test mesh) for 3 train
steps, then a test pass over the frozen data."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from test_data import make_chunk

REPO = Path(__file__).resolve().parent.parent

# The tiny-vit patch must apply inside the subprocess before main() runs.
_TINY_VIT_PATCH = """
import my_depthsplat_tpu.models.vit as vit_mod
from my_depthsplat_tpu.models.vit import ViTConfig
vit_mod.VIT_CONFIGS["vits"] = ViTConfig(embed_dim=64, depth=4, num_heads=2,
                                        base_img_size=56)
vit_mod.INTERMEDIATE_LAYER_IDX["vits"] = [0, 1, 2, 3]
"""


def _run_cli(tmp_path, overrides, timeout=420, extra_patch=""):
    shim_dir = tmp_path / "shim"
    shim_dir.mkdir(exist_ok=True)
    (shim_dir / "_tiny_vit_patch.py").write_text(_TINY_VIT_PATCH + extra_patch)
    runner = shim_dir / "run.py"
    runner.write_text(
        "import sys\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "exec(open(sys.argv[1]).read())\n"
        "from my_depthsplat_tpu.main import main\n"
        "sys.argv = ['main'] + sys.argv[2:]\n"
        "main()\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, str(runner), str(shim_dir / "_tiny_vit_patch.py")]
        + overrides,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


@pytest.mark.slow
def test_train_and_test_smoke(tmp_path):
    data = tmp_path / "re10k" / "train"
    data.mkdir(parents=True)
    make_chunk(data / "000000.torch", n_scenes=2, n_frames=10, h=48, w=48)
    test_d = tmp_path / "re10k" / "test"
    test_d.mkdir()
    make_chunk(test_d / "000000.torch", n_scenes=1, n_frames=10, h=48, w=48, seed=1)

    common = [
        f"output_dir={tmp_path / 'out'}",
        f"dataset.roots=[{tmp_path / 're10k'}]",
        "dataset.image_shape=[32, 32]",
        "dataset.view_sampler_args={num_context_views: 2, num_target_views: 2, "
        "min_distance_between_context_views: 2, "
        "max_distance_between_context_views: 5}",
        "encoder.num_scales=1",
        "encoder.num_depth_candidates=16",
        "encoder.costvolume_unet_feat_dim=16",
        "encoder.supervise_intermediate_depth=false",
        "loss.lpips_weight=0",
        "optimizer.total_steps=10",
        "trainer.max_steps=3",
        "trainer.val_check_interval=100",
        "trainer.print_log_every_n_steps=1",
        "checkpointing.every_n_train_steps=2",
        "data_loader.batch_size=1",
    ]
    r = _run_cli(tmp_path, common)
    assert r.returncode == 0, r.stderr[-3000:]

    out = tmp_path / "out"
    assert (out / "config.json").exists()
    assert (out / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert any("loss/total" in l for l in lines)
    ckpts = sorted((out / "checkpoints").iterdir())
    assert len(ckpts) >= 1

    r2 = _run_cli(
        tmp_path,
        common
        + [
            "mode=test",
            f"checkpointing.load={ckpts[-1]}",
        ],
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    scores = out / "test" / "scores_all_avg.json"
    assert scores.exists()
    parsed = json.loads(scores.read_text())
    assert np.isfinite(parsed["psnr"])
