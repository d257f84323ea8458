"""Generic VQA trainer — the "serious" configurable trainer.

Counterpart of src/pipeline/trainer/vqa_trainer.py:77-1279 in the
reference: YAML-driven config merge, gradient checkpointing
(jax.checkpoint rematerialization instead of torch's
checkpoint_sequential), bf16 policy (replaces AMP fp16 + GradScaler),
early stopping, TensorBoard writer, SIGINT interrupt checkpoint, resume,
per-step/epoch logging, training strategies per epoch, resource-manager
integration, and a master `train()` loop.

Works with any model exposing the classification contract
(pixel_values, input_ids, attention_mask) -> {"logits", "aux_loss"}.
"""

from __future__ import annotations

import dataclasses
import signal
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.config.base import ConfigBase
from vivqa_tpu.data import device_prefetch
from vivqa_tpu.pipelines.common import EarlyStopping, StepTimer
from vivqa_tpu.train.checkpoint import CheckpointConfig, CheckpointManager
from vivqa_tpu.train.losses import cross_entropy_loss
from vivqa_tpu.train.optimizers import (OptimizerConfig, SchedulerConfig,
                                        create_optimizer)
from vivqa_tpu.train.state import (ShardedStep, TrainState, make_eval_step,
                                   make_train_step, place_state,
                                   settled_call, settled_host_read,
                                   settled_params_view)
from vivqa_tpu.train.strategies import trainable_mask
from vivqa_tpu.utils import get_pipeline_logger


@dataclasses.dataclass(frozen=True)
class TrainerConfig(ConfigBase):
    num_epochs: int = 10
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = dataclasses.field(
        default_factory=SchedulerConfig)
    label_smoothing: float = 0.0
    moe_aux_weight: float = 0.01
    strategy: str = "full"                 # per-epoch strategies applied
    gradient_checkpointing: bool = False   # remat the model forward
    early_stopping_patience: int = 5
    metric_for_best: str = "accuracy"
    checkpoint_dir: str = "checkpoints/trainer"
    max_checkpoints: int = 3
    resume: bool = True
    log_every: int = 10
    tensorboard_dir: str = ""              # "" = disabled
    wandb_project: str = ""                # "" = disabled (needs wandb pkg)
    profile_steps: tuple = ()              # (start, stop) step to trace
    profile_dir: str = "profiles"
    seed: int = 42


class VQATrainer:
    def __init__(self, config: TrainerConfig, model, params, mesh,
                 logger=None, resource_manager=None):
        self.config = config
        self.model = model
        self.mesh = mesh
        self.log = logger or get_pipeline_logger()
        self.rm = resource_manager
        self._interrupted = False
        self._params0 = params
        self._tb = None
        if config.tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(config.tensorboard_dir)
            except ImportError:
                self.log.warning("tensorboard unavailable; writer disabled")
        self._wandb = None
        if config.wandb_project:
            try:
                import wandb
                self._wandb = wandb.init(project=config.wandb_project,
                                         config=config.to_dict())
            except ImportError:
                self.log.warning("wandb unavailable; writer disabled")

    # -- building blocks ---------------------------------------------------
    def _loss_fn(self):
        cfg = self.config
        apply_base = self.model.apply

        def fwd(params, px, ids, mask, rng):
            return apply_base({"params": params}, px, ids, mask,
                              deterministic=False,
                              rngs={"dropout": rng, "router": rng})
        if cfg.gradient_checkpointing:
            # rematerialize the forward to trade FLOPs for HBM
            fwd = jax.checkpoint(fwd)

        def loss_fn(params, batch, rng, _apply):
            out = fwd(params, batch["pixel_values"], batch["input_ids"],
                      batch["attention_mask"], rng)
            ce = cross_entropy_loss(out["logits"], batch["labels"],
                                    label_smoothing=cfg.label_smoothing)
            loss = ce + cfg.moe_aux_weight * out["aux_loss"]
            acc = (jnp.argmax(out["logits"], -1) == batch["labels"]).mean()
            return loss, {"accuracy": acc, "aux_loss": out["aux_loss"]}
        return loss_fn

    def _eval_fn(self, params, batch, apply_fn):
        out = apply_fn({"params": params}, batch["pixel_values"],
                       batch["input_ids"], batch["attention_mask"],
                       deterministic=True)
        correct = (jnp.argmax(out["logits"], -1) == batch["labels"]).astype(
            jnp.float32)
        logp = jax.nn.log_softmax(out["logits"].astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, batch["labels"][:, None], -1)[:, 0]
        # per-row vectors so the host can TRIM padded rows (pad_last
        # repeats the last real item; rescaling sums would bias metrics
        # toward it — see CLAUDE.md / TrainingPipeline._validate)
        return {"correct": correct, "nll": nll}

    def _build_state(self, steps_per_epoch: int, epoch: int = 0) -> TrainState:
        cfg = self.config
        sched = cfg.scheduler.replace(
            total_steps=max(1, steps_per_epoch * cfg.num_epochs))
        freeze = None
        if cfg.strategy != "full":
            freeze = trainable_mask(self._params0, cfg.strategy, epoch,
                                    cfg.num_epochs)
        tx = create_optimizer(cfg.optimizer, sched, self._params0, freeze)
        state = TrainState.create(self.model.apply, self._params0, tx,
                                  jax.random.PRNGKey(cfg.seed))
        return place_state(state, self.mesh)

    # -- logging -------------------------------------------------------------
    def _log_step(self, step: int, metrics: Dict[str, float]) -> None:
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"train/{k}", float(v), step)
        if self._wandb is not None:
            self._wandb.log({f"train/{k}": float(v)
                             for k, v in metrics.items()}, step=step)

    def _log_epoch(self, epoch: int, metrics: Dict[str, float]) -> None:
        self.log.log_metrics(metrics, prefix=f"epoch{epoch}/")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"epoch/{k}", float(v), epoch)
        if self._wandb is not None:
            self._wandb.log({f"epoch/{k}": float(v)
                             for k, v in metrics.items()})

    # -- interrupt handling -----------------------------------------------------
    def _install_sigint(self):
        try:
            prev = signal.getsignal(signal.SIGINT)

            def handler(signum, frame):
                self._interrupted = True
                self.log.warning("SIGINT — finishing step then "
                                 "checkpointing")
            signal.signal(signal.SIGINT, handler)
            return prev
        except ValueError:
            return None

    # -- checkpoint plumbing -------------------------------------------------
    @staticmethod
    def _state_dict(state) -> Dict:
        """Full resumable train state — params AND opt_state (Adam
        moments, Lookahead slow weights), step (so the LR schedule and
        Orbax step numbering continue where they left off) and rng."""
        return settled_host_read({"params": state.params,
                                  "opt_state": state.opt_state,
                                  "step": state.step, "rng": state.rng})

    def _restore_full(self, ckpt, state):
        """Restore the full train state without letting one mismatched
        leaf degrade the rest:

        - a raw restore first (inspection only: layout + the
          checkpoint's rng key shape)
        - then a targeted restore against an ABSTRACT target built with
          ShapeDtypeStructs — no device_get of the live state, and the
          rng slot is shaped like the CHECKPOINT's key, so a PRNG-impl
          change ((2,) threefry vs (4,) unsafe_rbg) cannot fail the
          whole restore and silently reset the optimizer
        - rng adopts only when its shape matches the live key; otherwise
          the fresh seed-derived key stays and a warning says so
        - params-only fallback (partial_load shape filtering) when the
          optimizer tree itself changed or predates full-state saves
        - step always continues (Orbax save raises on duplicate steps)
        """
        restored_raw, meta = ckpt.restore()   # structure inspection only

        if isinstance(restored_raw, dict) and "params" in restored_raw:
            parts = restored_raw
        else:                             # very old layout: bare params
            parts = {"params": restored_raw}

        def abstract(tree):
            return jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), tree)

        def put(tree, like):
            return jax.device_put(
                tree, jax.tree.map(lambda x: x.sharding, like))

        rng_ok = "rng" in parts and \
            jnp.shape(parts["rng"]) == jnp.shape(state.rng)

        full = None
        if "opt_state" in parts:
            # targeted restore with an ABSTRACT target (no device_get of
            # the live state): Orbax maps by tree path, handling the
            # namedtuple/tuple <-> dict round-trip exactly. The rng slot
            # uses the CHECKPOINT's key shape so a PRNG-impl change
            # ((2,) threefry vs (4,) unsafe_rbg) can't fail the whole
            # restore and silently reset the optimizer.
            target = {"params": abstract(state.params),
                      "opt_state": abstract(state.opt_state),
                      "step": jax.ShapeDtypeStruct((), jnp.int32)}
            if "rng" in parts:
                target["rng"] = jax.ShapeDtypeStruct(
                    jnp.shape(parts["rng"]), jnp.uint32)
            try:
                full, meta = ckpt.restore(target=target)
            except Exception:
                full = None

        if full is not None:
            state = state.replace(
                params=put(full["params"], state.params),
                opt_state=put(full["opt_state"], state.opt_state))
            if rng_ok:
                state = state.replace(rng=put(
                    jnp.asarray(full["rng"], state.rng.dtype), state.rng))
            else:
                self.log.warning("checkpoint rng has a different PRNG-impl "
                                 "key shape; keeping the seed-derived key")
            parts["step"] = full.get("step", parts.get("step"))
        else:
            from vivqa_tpu.train.checkpoint import partial_load
            merged, skipped = partial_load(parts["params"], state.params,
                                           self.log)
            state = state.replace(params=put(merged, state.params))
            self.log.warning("optimizer state not restorable (absent or "
                             "tree/shape changed) — optimizer reset")

        step = parts.get("step", None)
        if step is None:
            step = ckpt.latest_step() or 0
        state = state.replace(step=jax.device_put(
            jnp.asarray(step, jnp.int32), state.step.sharding))
        return state, meta

    # -- master loop -----------------------------------------------------------
    def _unfreeze_stage(self, epoch: int) -> int:
        """gradual_unfreeze has 3 stages (head-only / +text / +visual,
        reference training_utils.py:430-456); other strategies have 1."""
        if self.config.strategy != "gradual_unfreeze":
            return 0
        frac = epoch / max(1, self.config.num_epochs)
        return (2 if frac >= 2 / 3 else 1 if frac >= 1 / 3 else 0)

    def train(self, train_loader, val_loader=None) -> Dict:
        cfg = self.config
        log = self.log
        state = self._build_state(len(train_loader))
        builder = ShardedStep(self.mesh, make_train_step(self._loss_fn()),
                              make_eval_step(self._eval_fn))
        jit_train, jit_eval, state_sh, batch_sh = builder.compile(state)
        current_stage = self._unfreeze_stage(0)

        ckpt = CheckpointManager(CheckpointConfig(
            directory=cfg.checkpoint_dir, max_to_keep=cfg.max_checkpoints,
            best_metric=cfg.metric_for_best))
        start_epoch = 0
        if cfg.resume and ckpt.latest_step() is not None:
            state, meta = self._restore_full(ckpt, state)
            start_epoch = int(meta.get("epoch", -1)) + 1
            log.success(f"resumed from step {int(state.step)} "
                        f"(epoch {start_epoch})")

        stopper = EarlyStopping(patience=cfg.early_stopping_patience,
                                mode="max")
        prev_sigint = self._install_sigint()
        history = []
        timer = StepTimer()
        if self.rm is not None:
            self.rm.start_training(cfg.num_epochs, len(train_loader))
            self.rm.register_model(
                "trainer_state", lambda: settled_host_read(state.params))

        try:
            for epoch in range(start_epoch, cfg.num_epochs):
                # gradual_unfreeze: rebuild the optimizer when a new stage
                # unlocks (params carry over; moments reset for the newly
                # trainable modules — reference applies the strategy per
                # epoch, vqa_trainer.py:894-900)
                stage = self._unfreeze_stage(epoch)
                if stage != current_stage:
                    current_stage = stage
                    self._params0 = settled_host_read(state.params)
                    state = self._build_state(len(train_loader), epoch)
                    jit_train, jit_eval, state_sh, batch_sh = \
                        builder.compile(state)
                    log.success(f"gradual unfreeze: stage {stage} "
                                f"(epoch {epoch})")
                if self.rm is not None:
                    self.rm.start_epoch(epoch)
                losses = []
                timer.reset()
                for i, batch in enumerate(
                        device_prefetch(iter(train_loader),
                                        sharding=batch_sh)):
                    dev = {k: v for k, v in batch.items()
                           if hasattr(v, "shape")}
                    step = int(state.step)
                    if cfg.profile_steps and step == cfg.profile_steps[0]:
                        jax.profiler.start_trace(cfg.profile_dir)
                    timer.tic()
                    state, metrics = jit_train(state, dev)
                    losses.append(metrics["loss"])   # stays on device
                    timer.toc(dev["labels"].shape[0])
                    if cfg.profile_steps and step == cfg.profile_steps[1]:
                        jax.profiler.stop_trace()
                        log.success(f"profile trace in {cfg.profile_dir}")
                    if i % cfg.log_every == 0:
                        loss = float(metrics["loss"])
                        log.info("epoch %d step %d loss=%.4f", epoch, i, loss)
                        self._log_step(step, {"loss": loss,
                                              "accuracy": float(
                                                  metrics["accuracy"])})
                        if self.rm is not None:
                            self.rm.update_training_step(epoch, i, loss=loss)
                    if self.rm is not None and self.rm.should_shutdown():
                        self._interrupted = True
                    if self._interrupted:
                        break

                epoch_metrics = {
                    "train_loss": float(np.mean([float(x) for x in losses]))
                    if losses else 0.0,
                    "qa_pairs_per_sec": timer.items_per_sec}
                if val_loader is not None:
                    # verified snapshot: jit_eval must not read the live
                    # donated chain (see settled_params_view)
                    p_view, _ = settled_params_view(state.params)
                    epoch_metrics.update(self.evaluate(
                        state.replace(params=p_view), jit_eval,
                        val_loader, batch_sh))
                history.append({"epoch": epoch, **epoch_metrics})
                self._log_epoch(epoch, epoch_metrics)
                if self.rm is not None:
                    self.rm.end_epoch(epoch,
                                      epoch_metrics.get(cfg.metric_for_best))

                metric = epoch_metrics.get(cfg.metric_for_best, 0.0)
                if stopper.update(metric) or self._interrupted:
                    ckpt.save(int(state.step), self._state_dict(state),
                              metadata={"epoch": epoch,
                                        "interrupted": self._interrupted},
                              metrics={cfg.metric_for_best: metric})
                if self._interrupted:
                    log.warning("interrupt checkpoint saved; stopping")
                    break
                if stopper.should_stop:
                    log.warning(f"early stopping at epoch {epoch}")
                    break
        finally:
            if prev_sigint is not None:
                signal.signal(signal.SIGINT, prev_sigint)
            if self._tb is not None:
                self._tb.flush()
            if self._wandb is not None:
                self._wandb.finish()
            if self.rm is not None:
                if self._interrupted:
                    self.rm.fail_training("interrupted")
                else:
                    self.rm.complete_training()
            ckpt.close()

        return {"state": state, "history": history,
                "best_metric": stopper.best,
                "interrupted": self._interrupted}

    def evaluate(self, state, jit_eval, loader, batch_sh) -> Dict[str, float]:
        total, correct, loss_sum = 0, 0.0, 0.0
        for batch in device_prefetch(iter(loader), sharding=batch_sh):
            dev = {k: v for k, v in batch.items() if hasattr(v, "shape")}
            out = settled_call(jit_eval, state, dev)
            rows = np.asarray(out["correct"])
            nv = int(batch.get("_num_valid", rows.shape[0]))
            total += nv
            correct += float(rows[:nv].sum())
            loss_sum += float(np.asarray(out["nll"])[:nv].sum())
        return {"accuracy": correct / max(total, 1),
                "val_loss": loss_sum / max(total, 1)}
