"""Generative (seq2seq) training pipeline.

Counterpart of src/core/generative_training_pipeline.py:26-635 in the
reference: AdamW with no-decay groups, OneCycle schedule, teacher-forcing
loss with -100 label masking and token counting, validation that
GENERATES answers then computes NLG metrics, perplexity exp(min(loss,100)),
BLEU-selected best checkpoint.

TPU re-design: the validation generate is the KV-cached jitted decode
(greedy by default, beam configurable) instead of the reference's
token-by-token Python loop re-running the full decoder
(generative_vqa_model.py:656-701).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from vivqa_tpu.config.base import ConfigBase
from vivqa_tpu.data import IGNORE_INDEX, device_prefetch
from vivqa_tpu.metrics import (BLEUScore, CIDErScore, ExactMatchAccuracy,
                               METEORScore, PrecisionRecallF1, ROUGEScore)
from vivqa_tpu.models.decoding import DecodeConfig, build_generate_fn
from vivqa_tpu.pipelines.common import EarlyStopping, StepTimer
from vivqa_tpu.train import (OptimizerConfig, SchedulerConfig, ShardedStep,
                             TrainState, create_optimizer,
                             cross_entropy_loss, make_train_step, perplexity,
                             place_state, settled_call,
                             settled_params_view)
from vivqa_tpu.train.checkpoint import CheckpointConfig, CheckpointManager
from vivqa_tpu.utils import get_pipeline_logger


@dataclasses.dataclass(frozen=True)
class GenerativeTrainingConfig(ConfigBase):
    num_epochs: int = 10
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=lambda: OptimizerConfig(learning_rate=3e-5))
    scheduler: SchedulerConfig = dataclasses.field(
        default_factory=lambda: SchedulerConfig(name="onecycle"))
    label_smoothing: float = 0.1
    moe_aux_weight: float = 0.01
    early_stopping_patience: int = 5
    metric_for_best: str = "bleu"
    checkpoint_dir: str = "checkpoints/generative"
    max_checkpoints: int = 3
    log_every: int = 10
    # freezing strategy (full / freeze_visual / freeze_text /
    # linear_probe / gradual_unfreeze — train/strategies.py; the
    # question_encoder counts as the text tower)
    strategy: str = "full"
    decode_strategy: str = "greedy"
    num_beams: int = 4
    # sampling knobs for decode_strategy top_k / top_p (reference
    # --temperature/--top-k/--top-p/--do-sample flags)
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 0.9
    max_generate_length: int = 0       # 0 = model.max_answer_length
    max_eval_batches: int = 0          # 0 = all
    seed: int = 42
    expert_mask: tuple = ()            # ablation masking, () = off
    # resume from checkpoint_dir when checkpoints exist there: restore
    # best params, continue at saved epoch + 1 with a fresh optimizer
    # (chunked-resume semantics; see TrainingPipelineConfig.resume)
    resume: bool = False


@dataclasses.dataclass
class GenerativeTrainingOutput:
    state: TrainState
    history: list
    best_metric: float
    final_metrics: Dict[str, float]


class GenerativeTrainingPipeline:
    def __init__(self, config: GenerativeTrainingConfig, logger=None):
        self.config = config
        self.log = logger or get_pipeline_logger()

    def _loss_fn(self):
        cfg = self.config
        mask = jnp.asarray(cfg.expert_mask) if cfg.expert_mask else None

        def loss_fn(params, batch, rng, apply_fn):
            know = {k: batch[k] for k in ("knowledge_embeddings",
                                          "knowledge_mask") if k in batch}
            out = apply_fn({"params": params}, batch["pixel_values"],
                           batch["question_ids"], batch["decoder_input_ids"],
                           batch["question_mask"], batch["decoder_mask"],
                           expert_mask=mask, **know,
                           deterministic=False,
                           rngs={"dropout": rng, "router": rng})
            ce = cross_entropy_loss(out["logits"], batch["labels"],
                                    label_smoothing=cfg.label_smoothing,
                                    ignore_index=IGNORE_INDEX)
            total = ce + cfg.moe_aux_weight * out["aux_loss"]
            n_tokens = (batch["labels"] != IGNORE_INDEX).sum()
            return total, {"ce": ce, "aux_loss": out["aux_loss"],
                           "n_tokens": n_tokens}
        return loss_fn

    def run(self, model, params, mesh, train_loader, val_loader,
            tokenizer) -> GenerativeTrainingOutput:
        cfg = self.config
        log = self.log
        log.start_stage("generative_training")

        total = max(1, len(train_loader) * cfg.num_epochs)
        freeze = None
        if cfg.strategy != "full":
            from vivqa_tpu.train.strategies import trainable_mask
            freeze = trainable_mask(params, cfg.strategy, 0, cfg.num_epochs)
        tx = create_optimizer(cfg.optimizer,
                              cfg.scheduler.replace(total_steps=total),
                              params, freeze)
        state = place_state(
            TrainState.create(model.apply, params, tx,
                              jax.random.PRNGKey(cfg.seed)), mesh)
        jit_train, _, _, batch_sh = ShardedStep(
            mesh, make_train_step(self._loss_fn())).compile(state)

        mcfg = model.config
        gen_fn = jax.jit(build_generate_fn(model, DecodeConfig(
            max_length=cfg.max_generate_length or mcfg.max_answer_length,
            bos_token_id=mcfg.bos_token_id, eos_token_id=mcfg.eos_token_id,
            pad_token_id=mcfg.pad_token_id, strategy=cfg.decode_strategy,
            num_beams=cfg.num_beams, temperature=cfg.temperature,
            top_k=cfg.top_k, top_p=cfg.top_p)))

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

        for epoch in range(start_epoch, cfg.num_epochs):
            losses = []
            timer.reset()
            for i, batch in enumerate(device_prefetch(iter(train_loader),
                                                      sharding=batch_sh)):
                dev = {k: v for k, v in batch.items() if hasattr(v, "shape")}
                timer.tic()
                state, metrics = jit_train(state, dev)
                losses.append(metrics["loss"])     # stays on device
                n_tok = int(metrics["n_tokens"]) if i == 0 else n_tok
                if i % cfg.log_every == 0:
                    loss = float(metrics["loss"])
                    log.info("epoch %d step %d loss=%.4f ppl=%.2f",
                             epoch, i, loss,
                             float(perplexity(jnp.asarray(loss))))
                timer.toc(n_tok)
            losses = [float(x) for x in losses]
            train_loss = float(np.mean(losses)) if losses else 0.0

            # the decode executable must NOT read the donated train-state
            # chain directly (unstable on the axon runtime — see
            # settled_params_view); validation and checkpointing both use
            # the verified snapshot
            p_view, p_host = settled_params_view(state.params)
            val = self._validate(p_view, gen_fn, val_loader, tokenizer,
                                 batch_sh)
            val.update(train_loss=train_loss, epoch=epoch,
                       perplexity=float(perplexity(jnp.asarray(train_loss))),
                       tokens_per_sec=timer.items_per_sec)
            history.append(val)
            log.log_metrics(val, prefix=f"epoch{epoch}/")

            metric = val.get(cfg.metric_for_best, 0.0)
            if stopper.update(metric):
                ckpt.save(int(state.step),
                          {"params": p_host},
                          metadata={"epoch": epoch,
                                    "config": mcfg.to_dict()},
                          metrics={cfg.metric_for_best: metric})
                log.log_checkpoint(cfg.checkpoint_dir, int(state.step), metric)
            if stopper.should_stop:
                log.warning(f"early stopping at epoch {epoch}")
                break

        final = history[-1] if history else {}
        ckpt.close()
        log.end_stage("generative_training")
        return GenerativeTrainingOutput(state, history,
                                        stopper.best or 0.0, final)

    def _validate(self, params, gen_fn, val_loader, tokenizer,
                  batch_sh) -> Dict[str, float]:
        cfg = self.config
        bleu, meteor, rouge = BLEUScore(), METEORScore(), ROUGEScore()
        cider, em, prf = CIDErScore(), ExactMatchAccuracy(), PrecisionRecallF1()
        # decode with the SAME expert composition the model was trained
        # with (ablation masks)
        mask = jnp.asarray(cfg.expert_mask) if cfg.expert_mask else None
        n = 0
        for batch in device_prefetch(iter(val_loader), sharding=batch_sh):
            if cfg.max_eval_batches and n >= cfg.max_eval_batches:
                break
            n += 1
            know = {k: batch[k] for k in ("knowledge_embeddings",
                                          "knowledge_mask") if k in batch}
            # settled_call: the first post-training run of a different
            # executable can return corrupted outputs on the axon
            # runtime — re-run until two executions agree
            seqs, _ = settled_call(gen_fn, params, batch["pixel_values"],
                                   batch["question_ids"],
                                   batch["question_mask"],
                                   expert_mask=mask, **know)
            nv = batch.get("_num_valid", len(seqs))
            preds = [tokenizer.decode(s) for s in np.asarray(seqs)[:nv]]
            refs = batch.get("all_answers", [[t] for t in
                                             batch.get("answer_text", [])])[:nv]
            bleu.update(preds, refs)
            meteor.update(preds, refs)
            rouge.update(preds, refs)
            cider.update(preds, refs)
            em.update(preds, refs)
            prf.update(preds, refs)
        prf_r = prf.compute()
        return {"bleu": bleu.compute().value,
                "meteor": meteor.compute().value,
                "rouge_l": rouge.compute().value,
                "cider": cider.compute().value,
                "exact_match": em.compute().value,
                "token_f1": prf_r.value}
