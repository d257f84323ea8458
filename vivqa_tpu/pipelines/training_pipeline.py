"""Classification training pipeline.

Counterpart of src/core/training_pipeline.py:84-870 in the reference:
seeding, optimizer/schedule with no-decay groups, epoch loop with
gradient accumulation + clipping, per-epoch validation computing the full
metric dict (VQA soft accuracy + exact match + BLEU/METEOR/ROUGE/CIDEr/
P-R-F1 over decoded answer strings, reference :536-741), sample
prediction display, best-metric checkpointing (params + config + vocab +
num_answers), early stopping, and a final evaluation that reloads the
best checkpoint.

TPU re-design: one jitted sharded train step (bf16, no GradScaler),
double-buffered device prefetch, metrics on host from streamed outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.config.base import ConfigBase
from vivqa_tpu.data import device_prefetch
from vivqa_tpu.metrics import (BLEUScore, CIDErScore, ExactMatchAccuracy,
                               F1Score, METEORScore, PrecisionRecallF1,
                               ROUGEScore, TopKAccuracy, VQAAccuracy, WUPS)
from vivqa_tpu.pipelines.common import EarlyStopping, StepTimer
from vivqa_tpu.train import (OptimizerConfig, SchedulerConfig, ShardedStep,
                             TrainState, create_optimizer,
                             cross_entropy_loss, make_train_step,
                             place_state, settled_call,
                             settled_host_read, settled_params_view,
                             trainable_mask)
from vivqa_tpu.train.checkpoint import CheckpointConfig, CheckpointManager
from vivqa_tpu.utils import get_pipeline_logger


@dataclasses.dataclass(frozen=True)
class TrainingPipelineConfig(ConfigBase):
    num_epochs: int = 10
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = dataclasses.field(
        default_factory=SchedulerConfig)
    label_smoothing: float = 0.0
    # device-side batch-mix augmentation (reference augmentation.py:219-348
    # MixUp/CutMix, re-designed as jitted in-step ops — ops/batch_mix.py)
    mix_mode: str = "none"              # none | mixup | cutmix | both
    mix_alpha: float = 0.4              # Beta(alpha, alpha) mixing ratio
    # scheduled dropout (reference augmentation.py:475-562 DropoutScheduler);
    # "" = off. Epoch-granular: each rate change rebuilds the module from
    # a rate-substituted config and lets jit retrace (rates are static
    # under XLA) — same stage-re-jit pattern as gradual_unfreeze.
    dropout_schedule: str = ""          # "" | linear | cosine
    initial_dropout: float = 0.1
    final_dropout: float = 0.3
    dropout_warmup_epochs: int = 0
    moe_aux_weight: float = 0.01
    strategy: str = "full"
    early_stopping_patience: int = 5
    metric_for_best: str = "vqa_accuracy"
    checkpoint_dir: str = "checkpoints/vqa"
    max_checkpoints: int = 3
    log_every: int = 10
    num_display_samples: int = 3
    seed: int = 42
    # ablation: per-expert multiplier, () = no masking (see
    # vivqa_tpu/ablation — functional equivalent of the reference's
    # router monkey-patch, ablation_trainer.py:150-197)
    expert_mask: tuple = ()
    # resume from checkpoint_dir when checkpoints exist there: restore
    # the best params and continue at the saved epoch + 1 with a FRESH
    # optimizer (same chunked-resume semantics as the generative
    # pipeline). Lets interrupted runs — e.g. ablation experiments cut
    # by the <10-min TPU chunk cap — continue instead of restarting.
    resume: bool = False


@dataclasses.dataclass
class TrainingPipelineOutput:
    state: TrainState
    history: list
    best_metric: float
    best_step: Optional[int]
    final_metrics: Dict[str, float]


class TrainingPipeline:
    def __init__(self, config: TrainingPipelineConfig, logger=None):
        self.config = config
        self.log = logger or get_pipeline_logger()

    # ----- setup ----------------------------------------------------------
    def _build_state(self, model, params, mesh, steps_per_epoch):
        cfg = self.config
        total = max(1, steps_per_epoch * cfg.num_epochs //
                    max(1, cfg.optimizer.accumulate_steps))
        sched = cfg.scheduler.replace(total_steps=total)
        freeze = None
        if cfg.strategy != "full":
            freeze = trainable_mask(params, cfg.strategy, 0, cfg.num_epochs)
        tx = create_optimizer(cfg.optimizer, sched, params, freeze)
        rng = jax.random.PRNGKey(cfg.seed)
        state = TrainState.create(model.apply, params, tx, rng)
        return place_state(state, mesh)

    def _loss_fn(self):
        cfg = self.config
        import jax.numpy as jnp
        mask = jnp.asarray(cfg.expert_mask) if cfg.expert_mask else None

        def loss_fn(params, batch, rng, apply_fn):
            # knowledge arrays ride the batch when a KnowledgeProvider
            # wraps the loader (key presence is static at trace time)
            know = {k: batch[k] for k in ("knowledge_embeddings",
                                          "knowledge_mask") if k in batch}
            pixels, labels = batch["pixel_values"], batch["labels"]
            if cfg.mix_mode != "none":
                from vivqa_tpu.ops.batch_mix import mix_batch
                rng, k_mix = jax.random.split(rng)
                pixels, perm, lam = mix_batch(k_mix, pixels, cfg.mix_mode,
                                              cfg.mix_alpha)
            out = apply_fn({"params": params}, pixels,
                           batch["input_ids"], batch["attention_mask"],
                           expert_mask=mask, **know,
                           deterministic=False,
                           rngs={"dropout": rng, "router": rng})
            if cfg.mix_mode != "none":
                from vivqa_tpu.ops.batch_mix import mixed_cross_entropy
                labels_b = labels[perm]
                ce = mixed_cross_entropy(out["logits"], labels, labels_b,
                                         lam, cfg.label_smoothing)
                preds = jnp.argmax(out["logits"], -1)
                acc = (lam * (preds == labels).mean()
                       + (1 - lam) * (preds == labels_b).mean())
            else:
                ce = cross_entropy_loss(out["logits"], labels,
                                        label_smoothing=cfg.label_smoothing)
                acc = (jnp.argmax(out["logits"], -1) == labels).mean()
            total = ce + cfg.moe_aux_weight * out["aux_loss"]
            return total, {"ce": ce, "aux_loss": out["aux_loss"],
                           "accuracy": acc}
        return loss_fn

    def _eval_fn(self, params, batch, apply_fn):
        import jax.numpy as jnp
        mask = (jnp.asarray(self.config.expert_mask)
                if self.config.expert_mask else None)
        know = {k: batch[k] for k in ("knowledge_embeddings",
                                      "knowledge_mask") if k in batch}
        out = apply_fn({"params": params}, batch["pixel_values"],
                       batch["input_ids"], batch["attention_mask"],
                       expert_mask=mask, **know, deterministic=True)
        return {"logits": out["logits"], "moe_metrics": out["moe_metrics"]}

    # ----- run ------------------------------------------------------------
    def run(self, model, params, mesh, train_loader, val_loader,
            id2answer: Dict[int, str]) -> TrainingPipelineOutput:
        cfg = self.config
        log = self.log
        log.start_stage("training_pipeline")

        state = self._build_state(model, params, mesh, len(train_loader))
        from vivqa_tpu.train import make_eval_step
        step_builder = ShardedStep(mesh, make_train_step(self._loss_fn()),
                                   make_eval_step(self._eval_fn))
        jit_train, jit_eval, _, batch_sh = step_builder.compile(state)

        ckpt = CheckpointManager(CheckpointConfig(
            directory=cfg.checkpoint_dir, max_to_keep=cfg.max_checkpoints,
            best_metric=cfg.metric_for_best))
        stopper = EarlyStopping(patience=cfg.early_stopping_patience)
        history = []
        timer = StepTimer()

        start_epoch = 0
        if cfg.resume and ckpt.latest_step() is not None:
            restored, meta = ckpt.restore_best()
            state = state.replace(params=jax.device_put(
                restored["params"],
                jax.tree.map(lambda s: s.sharding, state.params)))
            start_epoch = int((meta or {}).get("epoch", -1)) + 1
            log.info("resumed best checkpoint from %s — continuing at "
                     "epoch %d (fresh optimizer)", cfg.checkpoint_dir,
                     start_epoch)

        drop_sched = None
        if cfg.dropout_schedule:
            from vivqa_tpu.data.augmentation import DropoutScheduler
            # ramp over num_epochs-1: epochs are queried 0..E-1, so the
            # LAST epoch must hit progress 1.0 and train at final_dropout
            drop_sched = DropoutScheduler(
                cfg.initial_dropout, cfg.final_dropout,
                total_steps=max(cfg.num_epochs - 1, 1),
                warmup_steps=cfg.dropout_warmup_epochs,
                schedule=cfg.dropout_schedule)
        cur_rate = None

        for epoch in range(start_epoch, cfg.num_epochs):
            if drop_sched is not None:
                rate = drop_sched.get_dropout(epoch)
                if rate != cur_rate:
                    # rebuild the module with every dropout field set to
                    # the scheduled rate; apply_fn rides the state as a
                    # static field, so the steps are re-jitted against
                    # the updated state (params/opt_state untouched —
                    # dropout is parameterless)
                    model = type(model)(config=DropoutScheduler.
                                        apply_to_config(model.config, rate))
                    state = state.replace(apply_fn=model.apply)
                    if epoch > 0:
                        # the re-jitted executables must not read the
                        # donated train-step chain (axon corrupted-first-
                        # read bug — see settled_host_read): settle the
                        # live state to host and re-place fresh buffers
                        state = place_state(settled_host_read(state), mesh)
                    jit_train, jit_eval, _, batch_sh = \
                        step_builder.compile(state)
                    log.info("dropout schedule: rate=%.3f at epoch %d "
                             "(re-jit)", rate, epoch)
                    cur_rate = rate
            # -- train epoch -----------------------------------------------
            losses = []
            timer.reset()
            for i, batch in enumerate(device_prefetch(iter(train_loader),
                                                      sharding=batch_sh)):
                dev = {k: v for k, v in batch.items() if hasattr(v, "shape")}
                timer.tic()
                state, metrics = jit_train(state, dev)
                # keep the loss ON DEVICE: a float() here would block
                # dispatch every step (expensive over remote tunnels);
                # host conversion happens on log steps + at epoch end
                losses.append(metrics["loss"])
                if i % cfg.log_every == 0:
                    log.info("epoch %d step %d loss=%.4f acc=%.3f",
                             epoch, i, float(metrics["loss"]),
                             float(metrics["accuracy"]))
                timer.toc(dev["labels"].shape[0])
            losses = [float(x) for x in losses]
            train_loss = float(np.mean(losses)) if losses else 0.0

            # -- validate epoch ---------------------------------------------
            # jit_eval is a DIFFERENT executable than the donated train
            # step: reading the live state chain is unstable on the axon
            # runtime (see settled_params_view) — validate and checkpoint
            # from the verified snapshot
            p_view, p_host = settled_params_view(state.params)
            val = self._validate(state.replace(params=p_view), jit_eval,
                                 val_loader, id2answer, batch_sh)
            val["train_loss"] = train_loss
            val["epoch"] = epoch
            val["qa_pairs_per_sec"] = timer.items_per_sec
            history.append(val)
            log.log_metrics(val, prefix=f"epoch{epoch}/")

            # -- checkpoint best --------------------------------------------
            metric = val.get(cfg.metric_for_best, 0.0)
            improved = stopper.update(metric)
            if improved:
                ckpt.save(int(state.step),
                          {"params": p_host},
                          metadata={"num_answers": len(id2answer),
                                    "vocabulary": {str(k): v for k, v
                                                   in id2answer.items()},
                                    "epoch": epoch},
                          metrics={cfg.metric_for_best: metric})
                log.log_checkpoint(cfg.checkpoint_dir, int(state.step), metric)
            if stopper.should_stop:
                log.warning(f"early stopping at epoch {epoch} "
                            f"(best {stopper.best:.4f})")
                break

        # -- final evaluation on best checkpoint ---------------------------
        final = history[-1] if history else {}
        best_step = ckpt.best_step()
        if best_step is not None:
            restored, _ = ckpt.restore_best()
            state = state.replace(params=jax.device_put(
                restored["params"],
                jax.tree.map(lambda s: s.sharding, state.params)))
            final = self._validate(state, jit_eval, val_loader, id2answer,
                                   batch_sh)
            log.log_metrics(final, prefix="final/")
        ckpt.close()
        log.end_stage("training_pipeline")
        return TrainingPipelineOutput(state, history,
                                      stopper.best or 0.0, best_step, final)

    # ----- validation ------------------------------------------------------
    def _validate(self, state, jit_eval, val_loader, id2answer,
                  batch_sh) -> Dict[str, float]:
        """Full metric dict over the validation set (reference :536-741)."""
        cfg = self.config
        vqa_acc, top5 = VQAAccuracy(), TopKAccuracy(5)
        em, f1 = ExactMatchAccuracy(), F1Score("macro")
        bleu, meteor = BLEUScore(), METEORScore()
        rouge, cider = ROUGEScore(), CIDErScore()
        prf, wups9 = PrecisionRecallF1(), WUPS(0.9)
        losses = []
        shown = 0
        for batch in device_prefetch(iter(val_loader), sharding=batch_sh):
            dev = {k: v for k, v in batch.items() if hasattr(v, "shape")}
            # settled_call: first post-training eval execution can be
            # corrupted on the axon runtime — re-run until stable
            out = settled_call(jit_eval, state, dev)
            nv = batch.get("_num_valid", len(batch["labels"]))
            logits = np.asarray(out["logits"], np.float32)[:nv]
            labels = np.asarray(batch["labels"])[:nv]
            losses.append(float(cross_entropy_loss(
                jnp.asarray(logits), jnp.asarray(labels))))
            preds = logits.argmax(-1)
            pred_strs = [id2answer.get(int(p), "<unk>") for p in preds]
            refs = batch.get("all_answers",
                             [[id2answer.get(int(l), "<unk>")] for l in labels])
            refs = refs[:nv]
            vqa_acc.update(preds, batch.get(
                "answer_counts", [{int(l): 10} for l in labels])[:nv])
            top5.update(logits, labels)
            f1.update(preds, labels)
            em.update(pred_strs, refs)
            bleu.update(pred_strs, refs)
            meteor.update(pred_strs, refs)
            rouge.update(pred_strs, refs)
            cider.update(pred_strs, refs)
            prf.update(pred_strs, refs)
            wups9.update(pred_strs, refs)
            # sample display (reference :771)
            if shown < cfg.num_display_samples and "question" in batch:
                q = batch["question"][0]
                self.log.info("  sample: Q='%s' pred='%s' gold=%s",
                              q, pred_strs[0], refs[0][:3])
                shown += 1
        rouge_r = rouge.compute()
        prf_r = prf.compute()
        return {
            "val_loss": float(np.mean(losses)) if losses else 0.0,
            "vqa_accuracy": vqa_acc.compute().value,
            "top5_accuracy": top5.compute().value,
            "exact_match": em.compute().value,
            "f1_macro": f1.compute().value,
            "bleu": bleu.compute().value,
            "meteor": meteor.compute().value,
            "rouge_l": rouge_r.value,
            "cider": cider.compute().value,
            "precision": prf_r.metadata["precision"],
            "recall": prf_r.metadata["recall"],
            "token_f1": prf_r.value,
            "wups_0.9": wups9.compute().value,
        }
