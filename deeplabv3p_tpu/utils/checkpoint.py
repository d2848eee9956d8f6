"""Checkpoint save/load + retention policies.

Replaces the reference's Keras h5 checkpoint machinery (whole-model h5 as
interchange format, /root/reference/train.py:52-58, eval.py:566-571) with
flax msgpack serialization of the variables pytree (`.ckpt` files), plus:

* metrics-encoded filenames (reference
  `ep{epoch:03d}-loss..-Jaccard..-val_Jaccard...h5`, train.py:54) for
  human-auditable checkpoint dirs;
* retention: keep the last `max_val_keep`=5 epoch checkpoints and
  `max_eval_keep`=2 best-mIOU checkpoints (reference
  CheckpointCleanCallBack, common/callbacks.py:11-30).

Keras-h5 import for pretrained reference checkpoints lives in
deeplabv3p_tpu.utils.keras_import.
"""

from __future__ import annotations

import glob
import os
from typing import Any

import flax.serialization
import jax
import numpy as np


def save_variables(path: str, variables: Any) -> None:
    """Serialize a {'params', 'batch_stats', ...} pytree to msgpack."""
    host = jax.tree_util.tree_map(np.asarray, variables)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(host))


def load_variables(path: str, template: Any = None) -> Any:
    """Load a variables pytree. With `template`, restores into its exact
    structure (shape/dtype checked); otherwise returns the raw state dict."""
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return flax.serialization.from_bytes(template, data)
    return flax.serialization.msgpack_restore(data)


def checkpoint_name(
    epoch: int, loss: float, jaccard: float, val_metric: float
) -> str:
    """Metrics-encoded filename (reference train.py:54 pattern)."""
    return (
        f"ep{epoch:03d}-loss{loss:.3f}-Jaccard{jaccard:.3f}"
        f"-val_Jaccard{val_metric:.3f}.ckpt"
    )


class CheckpointManager:
    """Save/retain checkpoints like the reference's callback stack."""

    def __init__(
        self, log_dir: str, max_val_keep: int = 5, max_eval_keep: int = 2
    ):
        self.log_dir = log_dir
        self.max_val_keep = max_val_keep
        self.max_eval_keep = max_eval_keep
        os.makedirs(log_dir, exist_ok=True)

    def save_epoch(self, variables: Any, epoch: int, record: dict) -> str:
        name = checkpoint_name(
            epoch,
            record.get("loss", 0.0),
            record.get("jaccard", 0.0),
            record.get("val_miou", record.get("jaccard", 0.0)),
        )
        path = os.path.join(self.log_dir, name)
        save_variables(path, variables)
        self._clean("ep*.ckpt", self.max_val_keep)
        return path

    def save_eval_best(self, variables: Any, epoch: int, miou: float) -> str:
        """Best-mIOU eval checkpoint (reference callbacks.py:50-53)."""
        path = os.path.join(
            self.log_dir, f"eval_ep{epoch:03d}-mIOU{miou:.3f}.ckpt"
        )
        save_variables(path, variables)
        self._clean("eval_ep*.ckpt", self.max_eval_keep)
        return path

    def save_final(self, variables: Any) -> str:
        """trained_final (reference train.py:247)."""
        path = os.path.join(self.log_dir, "trained_final.ckpt")
        save_variables(path, variables)
        return path

    def _clean(self, pattern: str, keep: int) -> None:
        files = sorted(
            glob.glob(os.path.join(self.log_dir, pattern)), key=os.path.getmtime
        )
        for f in files[:-keep] if keep else files:
            os.remove(f)
