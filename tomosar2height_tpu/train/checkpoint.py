"""Checkpoint save/load with the reference's directory layout and metadata.

Parity: reference utils/io_checkpoint.py:11-115 — registered modules
(model/optimizer/scheduler), scalar metadata {n_iter, loss_val_best,
training_time}, ``model_best`` default file, ``resume_scheduler=False`` support,
graceful skips for missing keys. Serialization uses flax msgpack for pytrees
(params/opt state) and msgpack for scalars — no torch pickle.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict

import flax.serialization as fser

log = logging.getLogger(__name__)

DEFAULT_MODEL_FILE = "model_best.ckpt"


class CheckpointIO:
    """Save/load a dict of stateful modules + scalars.

    Registered values may be:
    - pytrees (params, optimizer state): serialized via flax msgpack;
    - objects with ``state_dict()/load_state_dict()`` (schedulers).
    """

    def __init__(self, checkpoint_dir: str, **modules):
        self.checkpoint_dir = checkpoint_dir
        self.module_dict: Dict[str, Any] = dict(modules)
        os.makedirs(checkpoint_dir, exist_ok=True)

    def register_modules(self, **modules):
        self.module_dict.update(modules)

    def save(self, filename: str, **scalars):
        out: Dict[str, Any] = dict(scalars)
        pytrees: Dict[str, bytes] = {}
        for k, v in self.module_dict.items():
            if v is None:
                continue
            if hasattr(v, "state_dict"):
                out[k] = v.state_dict()
            else:
                pytrees[k] = fser.to_bytes(v)
        payload = {"scalars": out, "pytrees": pytrees}
        blob = fser.msgpack_serialize(payload)
        tmp = filename + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, filename)

    def _download_url(self, url: str) -> str:
        """Fetch a checkpoint URL into the checkpoint dir (skip if cached)."""
        import urllib.parse
        import urllib.request

        name = os.path.basename(urllib.parse.urlparse(url).path) or "model_url.ckpt"
        dest = os.path.join(self.checkpoint_dir, name)
        if os.path.exists(dest):
            log.info("Using cached checkpoint for %s", url)
            return dest
        log.info("Downloading checkpoint from url: %s", url)
        tmp = dest + ".tmp"
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            f.write(r.read())
        os.replace(tmp, dest)
        return dest

    def load(self, filename: str, resume_scheduler: bool = True) -> Dict[str, Any]:
        """Load; updates registered pytrees in-place (returns the new values in
        ``self.module_dict``) and returns the scalar dict.

        ``filename`` may be an http(s) URL (reference io_checkpoint.py:78-88
        ``load_url``): the file is downloaded into the checkpoint dir (cached
        by basename) and loaded from there.
        """
        if filename and filename.startswith(("http://", "https://")):
            filename = self._download_url(filename)
        if not filename or not os.path.exists(filename):
            raise FileNotFoundError(f"Checkpoint file {filename} not found.")
        log.info("Loading checkpoint from local file...")
        with open(filename, "rb") as f:
            payload = fser.msgpack_restore(f.read())
        scalars = dict(payload.get("scalars", {}))
        pytrees = payload.get("pytrees", {})
        for k, v in list(self.module_dict.items()):
            if v is None:
                continue
            if k == "scheduler" and not resume_scheduler:
                log.info("Skip loading scheduler from checkpoint.")
                scalars.pop(k, None)
                continue
            try:
                if hasattr(v, "load_state_dict"):
                    v.load_state_dict(scalars.pop(k))
                elif k in pytrees:
                    self.module_dict[k] = fser.from_bytes(v, pytrees[k])
                else:
                    log.warning("Warning: Could not find %s in checkpoint!", k)
            except KeyError:
                log.warning("Warning: Could not find %s in checkpoint!", k)
            except Exception:  # shape/type mismatch — mirror reference leniency
                log.warning("Warning: Could not load %s in checkpoint!", k)
        return {k: v for k, v in scalars.items() if k not in self.module_dict}
