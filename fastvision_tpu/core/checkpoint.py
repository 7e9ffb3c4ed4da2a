"""Checkpointing: async orbax save/restore, auto-resume, partial load,
freeze masks, and torch-checkpoint import.

Covers the reference's `utils/checkpoints.py` surface, upgraded:
  - `SaveModel`:90 -> `CheckpointManager.save` (orbax, async, retention of
    best + every-epoch like demos/yolov3_huaweiShip/cfg/_fit.py:23-27);
  - `LoadStatedict`:28 shape-filtered non-strict load -> `partial_load`;
  - `LoadFromParrel`:59 module.-prefix strip -> handled in torch import;
  - optimizer state IS restored on resume (the reference saved it but never
    reloaded it — SURVEY.md §5);
  - `SqueezeModel`:11 freeze-by-substring -> `trainable_mask` for optax;
  - ultralytics/torch import (demos/yolov3_huaweiShip/train.py:93-101
    head-dropping load) -> `load_torch_state` + layout converters
    (OIHW -> HWIO).
"""
from __future__ import annotations

import datetime
import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def flatten_params(tree: Any, sep: str = "/") -> dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = sep.join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path
        )
        flat[name] = leaf
    return flat


def partial_load(target: Any, source_flat: dict[str, np.ndarray], verbose: bool = True) -> Any:
    """Non-strict, shape-filtered parameter load (ref: utils/checkpoints.py:40-53).

    Leaves of `target` whose flattened name exists in `source_flat` with a
    matching shape are replaced; everything else keeps its initialization.
    """
    target_flat = flatten_params(target)
    loaded, skipped = [], []
    new_flat = {}
    for name, leaf in target_flat.items():
        src = source_flat.get(name)
        if src is not None and tuple(np.shape(src)) == tuple(np.shape(leaf)):
            new_flat[name] = np.asarray(src, dtype=np.asarray(leaf).dtype)
            loaded.append(name)
        else:
            new_flat[name] = leaf
            skipped.append(name)
    if verbose:
        print(f"[checkpoint] partial load: {len(loaded)} loaded, {len(skipped)} kept")
    # rebuild tree in target structure
    treedef = jax.tree_util.tree_structure(target)
    names = list(target_flat.keys())
    return jax.tree_util.tree_unflatten(treedef, [new_flat[n] for n in names])


def trainable_mask(params: Any, freeze_substrings: list[str]) -> Any:
    """Pytree of bools: False where the flattened name contains any frozen
    substring (ref: SqueezeModel, utils/checkpoints.py:11-26). Feed to
    optax.masked or multi_transform."""
    flat = flatten_params(params)
    mask_flat = {
        name: not any(s in name for s in freeze_substrings) for name in flat
    }
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, [mask_flat[n] for n in flat])


class CheckpointManager:
    """Orbax-backed run checkpoints: {params, batch_stats, opt_state,
    ema_params, meta}.

    Directory layout: <dir>/<step>/... (retained per max_to_keep) plus
    <dir>/best/ — a SEPARATE single-slot manager holding a durable copy of
    the best-metric checkpoint, so retention garbage-collection of old
    steps can never delete the best weights (the reference keeps a
    standalone best .pth: demos/yolov3_huaweiShip/cfg/_fit.py:23-27).
    The best metric value persists in best.json across restarts.
    """

    def __init__(self, directory: str, max_to_keep: int | None = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self._best_mgr = None  # lazy: only runs that track a metric need it
        self._best_metric = None
        best_json = os.path.join(self.directory, "best.json")
        if os.path.exists(best_json):
            try:
                with open(best_json) as f:
                    self._best_metric = json.load(f).get("metric")
            except (json.JSONDecodeError, OSError):
                pass

    def _items(self, params, batch_stats, opt_state, ema_params, meta):
        items = {
            "params": ocp.args.StandardSave(params),
            "meta": ocp.args.JsonSave(meta),
        }
        if batch_stats:
            items["batch_stats"] = ocp.args.StandardSave(batch_stats)
        if opt_state is not None:
            items["opt_state"] = ocp.args.StandardSave(opt_state)
        if ema_params is not None:
            items["ema_params"] = ocp.args.StandardSave(ema_params)
        return items

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any = None,
        batch_stats: Any = None,
        ema_params: Any = None,
        extra: dict | None = None,
        metric: float | None = None,
        higher_is_better: bool = True,
    ) -> None:
        """Save the RAW training params (plus BN batch_stats / optimizer
        state / EMA shadow params when given). EMA weights go under their
        own key so resume can restore both trees (ADVICE r1: saving the EMA
        tree AS 'params' broke resume)."""
        meta = dict(extra or {})
        meta["date"] = datetime.datetime.now().isoformat()
        meta["step"] = step
        if step in self._mgr.all_steps():
            # overwrite, don't raise: a preemption checkpoint occupies the
            # interrupted epoch's slot; the redone epoch saves over it
            self._mgr.delete(step)
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                **self._items(params, batch_stats, opt_state, ema_params, meta)
            ),
        )
        if metric is not None:
            better = self._best_metric is None or (
                metric > self._best_metric
                if higher_is_better
                else metric < self._best_metric
            )
            if better:
                self._best_metric = float(metric)
                if self._best_mgr is None:
                    self._best_mgr = ocp.CheckpointManager(
                        os.path.join(self.directory, "best"),
                        options=ocp.CheckpointManagerOptions(
                            max_to_keep=1, create=True,
                            enable_async_checkpointing=True,
                        ),
                    )
                self._best_mgr.save(
                    step,
                    args=ocp.args.Composite(
                        **self._items(params, batch_stats, opt_state,
                                      ema_params, meta)
                    ),
                )
                with open(os.path.join(self.directory, "best.json"), "w") as f:
                    json.dump({"step": step, "metric": float(metric)}, f)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    @staticmethod
    def _items_on_disk(root: str, step: int) -> set[str]:
        """Item names in a saved step, read straight off the filesystem
        (<root>/<step>/<item>/). orbax's item_metadata() would answer the
        same question but logs a could-not-be-restored WARNING per item
        when no handler registry is configured — pure noise for a listing."""
        d = os.path.join(root, str(step))
        if not os.path.isdir(d):
            return set()
        return {
            n for n in os.listdir(d)
            if not n.startswith("_") and os.path.isdir(os.path.join(d, n))
        }

    def available_items(self, step: int | None = None) -> set[str]:
        """Item names present in a saved step (for graceful partial restore)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return set()
        found = self._items_on_disk(self.directory, step)
        if found:
            return found
        return set(dict(self._mgr.item_metadata(step)).keys())

    def restore(self, step: int | None = None, like: Any = None,
                best: bool = False) -> dict:
        """Restore a checkpoint.

        `like` is a dict giving pytree structure/sharding per item, e.g.
        {'params': params_like} or {'params': ..., 'batch_stats': ...,
        'opt_state': ...} — items absent from `like` are not restored, and
        items in `like` but missing from the on-disk step are silently
        skipped (partial restore: eval needs only params+batch_stats).
        `best=True` restores from the durable <dir>/best/ slot."""
        mgr = self._mgr
        if best:
            best_dir = os.path.join(self.directory, "best")
            if self._best_mgr is None:
                if not os.path.isdir(best_dir):
                    raise FileNotFoundError(f"no best checkpoint under {best_dir}")
                self._best_mgr = ocp.CheckpointManager(
                    best_dir,
                    options=ocp.CheckpointManagerOptions(
                        max_to_keep=1, create=True,
                        enable_async_checkpointing=True,
                    ),
                )
            mgr = self._best_mgr
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        if like is not None:
            root = os.path.join(self.directory, "best") if best else self.directory
            on_disk = self._items_on_disk(root, step)
            if not on_disk:  # unexpected layout: fall back to orbax metadata
                on_disk = set(dict(mgr.item_metadata(step)).keys())
            items = {"meta": ocp.args.JsonRestore()}
            for key, target in like.items():
                if key in on_disk:
                    items[key] = ocp.args.StandardRestore(target)
            restored = mgr.restore(step, args=ocp.args.Composite(**items))
        else:
            restored = mgr.restore(step)
        state = {k: v for k, v in restored.items() if k != "meta" and v is not None}
        return {"state": state, "meta": restored.get("meta", {}) or {}}

    def wait(self):
        self._mgr.wait_until_finished()
        if self._best_mgr is not None:
            self._best_mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
        if self._best_mgr is not None:
            self._best_mgr.close()


# ----------------------------------------------------------------------------
# Torch checkpoint import (ultralytics / reference .pth files)
# ----------------------------------------------------------------------------
def load_torch_state(path: str, strip_module_prefix: bool = True) -> dict[str, np.ndarray]:
    """Load a torch checkpoint into {name: np.ndarray}.

    Handles the reference's formats: a bare state_dict, {'model': state_dict},
    or {'model': nn.Module} (ultralytics), and strips the DataParallel
    'module.' prefix (ref: LoadFromParrel, utils/checkpoints.py:79).
    """
    import torch  # local import: torch is host-side only

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if hasattr(ckpt, "state_dict"):
        ckpt = ckpt.state_dict()
    out = {}
    for name, tensor in ckpt.items():
        if strip_module_prefix and name.startswith("module."):
            name = name[len("module."):]
        out[name] = tensor.detach().float().cpu().numpy()
    return out


def conv_oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    """Torch conv weight (O, I, kH, kW) -> JAX/flax (kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def conv3d_oidhw_to_dhwio(w: np.ndarray) -> np.ndarray:
    """Torch conv3d weight (O, I, D, H, W) -> (D, H, W, I, O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def linear_oi_to_io(w: np.ndarray) -> np.ndarray:
    """Torch linear weight (out, in) -> (in, out)."""
    return np.transpose(w, (1, 0))


def linear_spatial_to_io(w: np.ndarray, channels: int,
                         spatial: tuple[int, ...]) -> np.ndarray:
    """Torch linear weight (out, C*prod(spatial)) whose input was a
    channels-FIRST flatten (N, C, *spatial) -> our (prod(spatial)*C, out)
    for a channels-LAST flatten (N, *spatial, C).

    Needed wherever a torch MLP consumes a flattened feature map: the VGG
    classifier (classfication/models/vgg.py:67-69 flattens [C,7,7]; ours
    flattens [7,7,C]), the C3D classifier (videoRecognition/models/c3d.py
    :95-97 flattens [512,1,4,4]), and the Faster R-CNN RoI head (consumes
    roi_align [C,7,7] crops, demos/faster_rcnn/models/fast.py:227-244).
    A plain (out,in) transpose silently scrambles the spatial/channel
    interleave — outputs stay *correlated* for near-spatially-constant
    features, so only a structured-input test catches it.
    """
    out_dim = w.shape[0]
    w = w.reshape((out_dim, channels) + tuple(spatial))
    ndim = w.ndim
    # (out, C, *S) -> (out, *S, C) -> (out, prod(S)*C) -> (in, out)
    w = np.transpose(w, (0,) + tuple(range(2, ndim)) + (1,))
    return np.ascontiguousarray(w.reshape(out_dim, -1).T)
