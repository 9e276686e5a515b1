"""Checkpointing: orbax save/restore + the reference's partial-load slots.

Reference behavior replicated (main.py:188-266, resume_ckpt.py:6-21):
- periodic full checkpoints named by step, latest-checkpoint discovery
- pretrained_monodepth: load only into encoder depth_predictor (non-strict)
- pretrained_model: load everything EXCEPT depth-predictor keys (when
  fine-tuning depth) — implemented as a filtered tree-merge
- pretrained_depth: strict depth-predictor-only load
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: Path, step: int, state: Any, keep: int | None = None) -> None:
    """Save a full-state checkpoint at ``path/step_{step}``.

    Multi-host: MUST be entered by ALL processes (orbax coordinates the
    write of globally-addressed arrays across hosts; a host-0-only call
    hangs on a real pod). Retention pruning (``keep`` = the reference's
    ``save_top_k`` on its monotonic info/global_step monitor,
    main.py:115-123) runs on process 0 after the save completes.
    """
    path = Path(path).absolute()
    if jax.process_index() == 0:
        path.mkdir(exist_ok=True, parents=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path / f"step_{step}", state)
    ckpt.wait_until_finished()
    if keep is not None and keep > 0 and jax.process_index() == 0:
        prune_checkpoints(path, keep)


def prune_checkpoints(path: Path, keep: int) -> None:
    """Delete all but the ``keep`` newest step-named checkpoints."""
    path = Path(path)
    if not path.exists():
        return
    steps = []
    for p in path.iterdir():
        m = re.fullmatch(r"step_(\d+)", p.name)
        if m:
            steps.append((int(m.group(1)), p))
    for _, p in sorted(steps)[:-keep] if keep else []:
        shutil.rmtree(p, ignore_errors=True)


def find_latest_checkpoint(path: Path) -> Path | None:
    """Scan step-named checkpoints, return the newest (resume_ckpt.py:6-21)."""
    path = Path(path)
    if not path.exists():
        return None
    best, best_step = None, -1
    for p in path.iterdir():
        m = re.fullmatch(r"step_(\d+)", p.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best


def restore_checkpoint(path: Path, target: Any) -> Any:
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(Path(path).absolute(), target)


def _merge_filtered(params: Any, loaded: Any, keep_fn) -> Any:
    """Replace leaves of ``params`` with ``loaded`` where keep_fn(path)."""
    flat_p = jax.tree_util.tree_flatten_with_path(params)
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    out = []
    for path, leaf in flat_p[0]:
        if keep_fn(path) and path in flat_l:
            out.append(flat_l[path])
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(flat_p[1], out)


def _path_contains(path, name: str) -> bool:
    return any(name in str(k) for k in path)


def load_pretrained_monodepth(params: Any, loaded: Any) -> Any:
    """Only the depth predictor's pretrained (ViT) weights (main.py:191-211)."""
    return _merge_filtered(
        params, loaded, lambda p: _path_contains(p, "depth_predictor")
    )


def load_pretrained_model(
    params: Any, loaded: Any, skip_depth_predictor: bool = False
) -> Any:
    """Full model load, optionally dropping encoder.depth_predictor.* keys
    (main.py:213-246)."""
    if not skip_depth_predictor:
        return _merge_filtered(params, loaded, lambda p: True)
    return _merge_filtered(
        params, loaded, lambda p: not _path_contains(p, "depth_predictor")
    )


def load_pretrained_depth(params: Any, loaded: Any) -> Any:
    """Strict depth-branch-only load (main.py:248-266)."""
    return _merge_filtered(
        params, loaded, lambda p: _path_contains(p, "depth_predictor")
    )


def resolve_checkpoint_uri(
    path: str | Path, download_dir: Path = Path("checkpoints")
) -> Path:
    """Resolve a checkpoint source to a local path.

    Plain paths pass through. ``wandb://run_id[:version]`` downloads the
    run's latest COMMITTED model artifact (or the named version) to
    ``download_dir/run_id`` and returns its model.ckpt — the reference's
    update_checkpoint_path scheme (src/misc/wandb_tools.py:43-62). The
    project is taken from the WANDB_PROJECT env var. Raises a clear error
    when wandb is not installed in this environment.
    """
    s = str(path)
    if not s.startswith("wandb://"):
        return Path(path)
    try:
        import wandb
    except ImportError as e:
        raise RuntimeError(
            f"checkpoint URI {s!r} needs the wandb package, which is not "
            "installed in this environment — download the artifact "
            "elsewhere and pass a local path instead"
        ) from e
    import os

    run_id, _, version = s[len("wandb://"):].partition(":")
    project = os.environ.get("WANDB_PROJECT")
    if not project:
        raise RuntimeError(
            f"checkpoint URI {s!r}: set WANDB_PROJECT to the wandb project "
            "that owns the run"
        )
    api = wandb.Api()
    run = api.run(f"{project}/{run_id}")
    chosen = None
    def _version_num(a) -> int | None:
        v = getattr(a, "version", "") or ""
        return int(v[1:]) if re.fullmatch(r"v\d+", v) else None

    for artifact in run.logged_artifacts():
        if artifact.type != "model" or artifact.state != "COMMITTED":
            continue
        if not version:
            # pick the highest vN version; artifacts with alias-style
            # versions (not "vN") are skipped rather than crashing the parse
            n = _version_num(artifact)
            if n is not None and (
                chosen is None or n > _version_num(chosen)
            ):
                chosen = artifact
        elif version == artifact.version:
            chosen = artifact
            break
    if chosen is None:
        raise FileNotFoundError(
            f"no COMMITTED model artifact matching {s!r} on run "
            f"{project}/{run_id}"
        )
    root = Path(download_dir) / run_id
    root.mkdir(exist_ok=True, parents=True)
    chosen.download(root=root)
    ckpt_path = root / "model.ckpt"
    if not ckpt_path.exists():
        files = sorted(q.name for q in root.rglob("*") if q.is_file())
        raise FileNotFoundError(
            f"wandb artifact {chosen.name} downloaded to {root} does not "
            f"contain model.ckpt; files present: {files}"
        )
    return ckpt_path


def load_slot_params(path: str | Path, state: Any, vit_depth: int) -> Any:
    """Load a pretrained-slot source into a params tree.

    Accepts either of the two formats the reference's 3-way loading consumes
    (main.py:188-266):
    - a torch ``.pth``/``.ckpt`` Lightning state dict — converted through
      convert/depthsplat_ckpt.py (unmapped leaves keep current values);
    - an orbax checkpoint directory saved by this framework — a full
      TrainState (params extracted) or a bare params tree.
    ``wandb://run_id[:version]`` URIs are resolved through
    resolve_checkpoint_uri first. Returns a params tree shaped like
    ``state.params``.
    """
    p = resolve_checkpoint_uri(path)
    if p.suffix in (".pth", ".pt", ".ckpt", ".bin"):
        import torch

        from ..convert.depthsplat_ckpt import convert_encoder_checkpoint

        # weights_only=True: Lightning checkpoints are plain tensor dicts,
        # and this path also receives auto-downloaded wandb:// artifacts —
        # never execute pickled code from a remotely-fetched file.
        sd = torch.load(p, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return convert_encoder_checkpoint(sd, state.params, vit_depth)
    ckpt = ocp.StandardCheckpointer()
    try:
        return ckpt.restore(p.absolute(), state).params
    except Exception:
        return ckpt.restore(p.absolute(), state.params)
