"""Per-experiment training with modification, persistence, OOM retry.

Counterpart of src/ablation/ablation_trainer.py:313-876 in the reference:
`run_experiment` applies the expert/router modifications, builds the
classification or generative training pipeline, runs it, persists
per-epoch CSV/JSON (`epoch_results/<id>/{train,val}_history.csv`,
`epoch_summary.json`), retries once on device OOM with doubled gradient
accumulation (reference :691-720), and returns an ExperimentResult.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import time
import traceback
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from vivqa_tpu.ablation.config import AblationConfig, ExperimentConfig
from vivqa_tpu.ablation.modifier import (apply_expert_ablation,
                                         apply_router_ablation,
                                         build_expert_mask)
from vivqa_tpu.utils import get_pipeline_logger


@dataclasses.dataclass
class ExperimentResult:
    experiment_id: str
    status: str                       # completed | failed | interrupted
    metrics: Dict[str, float]
    history: list
    wall_seconds: float
    error: str = ""
    moe_metrics: Optional[Dict] = None
    # per-val-sample 0/1 exact-match correctness with the best params —
    # enables paired (McNemar) comparisons between experiments, which
    # are far more sensitive than independent binomial bounds
    correct_mask: Optional[list] = None


class AblationTrainer:
    """Runs one experiment end-to-end against pre-built data loaders."""

    def __init__(self, config: AblationConfig, base_model_config,
                 data_out, mesh, logger=None):
        """data_out: DataPipelineOutput (loaders + vocab + tokenizer)."""
        self.config = config
        self.base_model_config = base_model_config
        self.data = data_out
        self.mesh = mesh
        self.log = logger or get_pipeline_logger()

    def _epoch_dir(self, experiment_id: str) -> Path:
        d = Path(self.config.output_dir) / "epoch_results" / experiment_id
        d.mkdir(parents=True, exist_ok=True)
        return d

    def _save_epoch_results(self, experiment_id: str, history: list) -> None:
        """train/val history CSVs + epoch summary JSON (reference
        _save_epoch_results, :582-643)."""
        d = self._epoch_dir(experiment_id)
        if not history:
            return
        keys = sorted({k for h in history for k in h})
        with open(d / "val_history.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            for h in history:
                w.writerow({k: h.get(k) for k in keys})
        train_keys = [k for k in keys if "train" in k or k == "epoch"]
        with open(d / "train_history.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=train_keys)
            w.writeheader()
            for h in history:
                w.writerow({k: h.get(k) for k in train_keys})
        (d / "epoch_summary.json").write_text(
            json.dumps(history, indent=2, default=str))

    def _modified_model(self, experiment: ExperimentConfig):
        cfg = self.base_model_config
        cfg = apply_expert_ablation(cfg, experiment.expert)
        if cfg.moe.use_moe:
            cfg = apply_router_ablation(cfg, experiment.router)
        mask = None
        if cfg.moe.use_moe:
            num_experts = cfg.moe.num_experts
            if cfg.moe.moe_type == "vqa":
                num_experts = (cfg.moe.num_vision_experts +
                               cfg.moe.num_text_experts +
                               cfg.moe.num_multimodal_experts +
                               cfg.moe.num_specialized_experts)
            mask = build_expert_mask(experiment.expert, num_experts)
        return cfg, mask

    def _build_and_run(self, experiment: ExperimentConfig, accumulate: int):
        cfg = self.config
        model_cfg, mask = self._modified_model(experiment)
        from vivqa_tpu.train import OptimizerConfig
        opt = OptimizerConfig(learning_rate=cfg.learning_rate,
                              accumulate_steps=accumulate)
        ckpt_dir = str(Path(cfg.output_dir) / "checkpoints" /
                       experiment.experiment_id)
        if cfg.model_type == "generative":
            from vivqa_tpu.models.generative import GenerativeVQAModel
            from vivqa_tpu.pipelines.generative_training_pipeline import (
                GenerativeTrainingConfig, GenerativeTrainingPipeline)
            model = GenerativeVQAModel(model_cfg)
            rng = jax.random.PRNGKey(cfg.seed)
            import jax.numpy as jnp
            b = next(iter(self.data.train_loader))
            # jit the init: eager init dispatches one tiny program per
            # primitive, which is minutes over the TPU tunnel
            params = jax.jit(model.init)(
                {"params": rng, "router": rng},
                jnp.asarray(b["pixel_values"][:2]),
                jnp.asarray(b["question_ids"][:2]),
                jnp.asarray(b["decoder_input_ids"][:2]))["params"]
            tp = GenerativeTrainingPipeline(GenerativeTrainingConfig(
                num_epochs=cfg.num_epochs, optimizer=opt,
                checkpoint_dir=ckpt_dir, log_every=1000,
                expert_mask=mask or (), seed=cfg.seed,
                resume=True), self.log)
            out = tp.run(model, params, self.mesh, self.data.train_loader,
                         self.data.val_loader, self.data.tokenizer)
        else:
            from vivqa_tpu.models.vqa_model import VietnameseVQAModel
            from vivqa_tpu.pipelines.training_pipeline import (
                TrainingPipeline, TrainingPipelineConfig)
            mc = model_cfg.replace(num_answers=len(self.data.answer2id))
            model = VietnameseVQAModel(mc)
            rng = jax.random.PRNGKey(cfg.seed)
            import jax.numpy as jnp
            b = next(iter(self.data.train_loader))
            params = jax.jit(model.init)(
                {"params": rng, "router": rng},
                jnp.asarray(b["pixel_values"][:2]),
                jnp.asarray(b["input_ids"][:2]))["params"]
            tp = TrainingPipeline(TrainingPipelineConfig(
                num_epochs=cfg.num_epochs, optimizer=opt,
                checkpoint_dir=ckpt_dir, log_every=1000,
                metric_for_best=cfg.primary_metric,
                expert_mask=mask or (), seed=cfg.seed,
                # interrupted experiments (10-min TPU chunk cap) resume
                # from their best epoch instead of restarting
                resume=True), self.log)
            out = tp.run(model, params, self.mesh, self.data.train_loader,
                         self.data.val_loader, self.data.id2answer)
        moe_metrics = self._collect_moe_metrics(model, out, mask)
        correct_mask = self._collect_correct_mask(model, out, mask)
        return out, moe_metrics, correct_mask

    def _collect_moe_metrics(self, model, out, mask):
        """Router telemetry on one val batch with the trained params
        (reference collect_moe_metrics, ablation_trainer.py:252-305)."""
        from vivqa_tpu.ablation.modifier import collect_moe_metrics
        try:
            import jax
            import jax.numpy as jnp
            batch = next(iter(self.data.val_loader))
            from vivqa_tpu.train.state import settled_host_read
            params = settled_host_read(out.state.params)
            m = jnp.asarray(mask) if mask else None
            if self.config.model_type == "generative":
                fwd = jax.jit(lambda p, px, q, d, em: model.apply(
                    {"params": p}, px, q, d, expert_mask=em,
                    deterministic=True))
                res = fwd(params,
                          jnp.asarray(batch["pixel_values"]),
                          jnp.asarray(batch["question_ids"]),
                          jnp.asarray(batch["decoder_input_ids"]), m)
            else:
                fwd = jax.jit(lambda p, px, q, em: model.apply(
                    {"params": p}, px, q, expert_mask=em,
                    deterministic=True))
                res = fwd(params,
                          jnp.asarray(batch["pixel_values"]),
                          jnp.asarray(batch["input_ids"]), m)
            return collect_moe_metrics(
                jax.tree.map(lambda x: np.asarray(x)
                             if hasattr(x, "shape") else x,
                             res.get("moe_metrics", {})))
        except Exception:
            return None

    def _correct_mask_from_params(self, model, params, mask):
        import jax
        import jax.numpy as jnp
        # params arrive as host numpy (settled read / checkpoint);
        # upload once, not once per val batch
        params = jax.device_put(params)
        m = jnp.asarray(mask) if mask else None
        # attention_mask MUST ride along: without it padded question
        # tokens attend and predictions diverge from the reported eval
        # (observed: mask mean 0.29-0.44 vs exact_match 0.82 before this
        # was caught by the consistency check below)
        fwd = jax.jit(lambda p, px, q, am, em: model.apply(
            {"params": p}, px, q, am, expert_mask=em,
            deterministic=True)["logits"])
        bits = []
        for batch in self.data.val_loader:
            logits = fwd(params, jnp.asarray(batch["pixel_values"]),
                         jnp.asarray(batch["input_ids"]),
                         jnp.asarray(batch["attention_mask"]), m)
            nv = batch.get("_num_valid", len(batch["labels"]))
            preds = np.asarray(logits).argmax(-1)[:nv]
            labels = np.asarray(batch["labels"])[:nv]
            bits.extend((preds == labels).astype(int).tolist())
        return bits

    def check_mask_consistency(self, correct_mask, exact_match,
                               experiment_id=""):
        """The per-sample mask and the reported exact_match describe the
        SAME params on the SAME val set — their means must agree. A gap
        means the mask was computed through a different code path than
        the metric (paired tests built on it would be garbage)."""
        if not correct_mask or exact_match is None:
            return True
        gap = abs(sum(correct_mask) / len(correct_mask) - exact_match)
        if gap > 0.02:
            self.log.warning(
                f"correct_mask mean {sum(correct_mask)/len(correct_mask):.4f} "
                f"disagrees with exact_match {exact_match:.4f} "
                f"({experiment_id}) — DISCARDING the mask (paired tests "
                f"must not run on inconsistent data)")
            return False
        return True

    def _generative_mask_from_params(self, model, params, mask):
        """Per-sample exact match of the greedy KV-cached decode against
        the reference answers — the same ExactMatchAccuracy the reported
        metrics use, read out per sample."""
        import jax
        import jax.numpy as jnp

        from vivqa_tpu.metrics import ExactMatchAccuracy
        from vivqa_tpu.models.decoding import DecodeConfig, build_generate_fn
        params = jax.device_put(params)
        cfg = model.config
        gen = jax.jit(build_generate_fn(model, DecodeConfig(
            max_length=cfg.max_answer_length, strategy="greedy",
            bos_token_id=cfg.bos_token_id, eos_token_id=cfg.eos_token_id,
            pad_token_id=cfg.pad_token_id)))
        m = jnp.asarray(mask) if mask else None
        em = ExactMatchAccuracy()
        tok = self.data.tokenizer
        for batch in self.data.val_loader:
            seqs, _ = gen(params, jnp.asarray(batch["pixel_values"]),
                          jnp.asarray(batch["question_ids"]),
                          jnp.asarray(batch["question_mask"]),
                          expert_mask=m)
            nv = batch.get("_num_valid", len(seqs))
            preds = [tok.decode(s) for s in np.asarray(seqs)[:nv]]
            refs = batch.get("all_answers",
                             [[t] for t in batch.get("answer_text", [])])[:nv]
            em.update(preds, refs)
        return [int(x) for x in em.compute().per_sample]

    def _collect_correct_mask(self, model, out, mask):
        """Per-sample exact-match correctness on the full val set with
        the final params. Classification: argmax==label (with one gold
        answer per sample that IS per-sample exact match: pred string ==
        reference iff pred id == label id). Generative: greedy-decode
        string exact match. Val loaders pad the last batch, so rows are
        trimmed with ``_num_valid``."""
        try:
            from vivqa_tpu.train.state import settled_host_read
            params = settled_host_read(out.state.params)
            if self.config.model_type == "generative":
                return self._generative_mask_from_params(model, params,
                                                         mask)
            return self._correct_mask_from_params(model, params, mask)
        except Exception:
            return None

    def _baseline_checkpoint_dir(self) -> Path:
        """Checkpoint dir of the trained FULL baseline (priority-0 row of
        the matrix) — the model post-hoc ablations are applied to."""
        matrix = self.config.generate_experiment_matrix()
        base = next((e for e in matrix
                     if e.expert.mode == "full" and not e.expert.post_hoc),
                    None)
        if base is None:
            raise RuntimeError("post-hoc ablation needs a 'full' baseline "
                               "in the experiment matrix (include_full)")
        return Path(self.config.output_dir) / "checkpoints" / \
            base.experiment_id

    def _moe_metrics_from_params(self, model, params, mask):
        """Router telemetry on one val batch from explicit params (the
        post-hoc path has no TrainingPipeline output object)."""
        from vivqa_tpu.ablation.modifier import collect_moe_metrics
        try:
            import jax.numpy as jnp
            batch = next(iter(self.data.val_loader))
            p = jax.device_put(params)
            m = jnp.asarray(mask) if mask else None
            fwd = jax.jit(lambda p, px, q, em: model.apply(
                {"params": p}, px, q, expert_mask=em, deterministic=True))
            res = fwd(p, jnp.asarray(batch["pixel_values"]),
                      jnp.asarray(batch["input_ids"]), m)
            return collect_moe_metrics(
                jax.tree.map(lambda x: np.asarray(x)
                             if hasattr(x, "shape") else x,
                             res.get("moe_metrics", {})))
        except Exception:
            return None

    def _run_post_hoc_experiment(self,
                                 experiment: ExperimentConfig
                                 ) -> ExperimentResult:
        """Evaluate the trained FULL baseline with the experiment's
        expert mask applied at eval time — no retraining. Measures
        whether the trained router actually routes through (and the
        model depends on) the masked experts; retrained ablations can't
        see this because retraining re-learns around the mask. Serves as
        the instrument's positive control: a mask that 'silently fails
        to bite' would leave these rows identical to the baseline."""
        eid = experiment.experiment_id
        self.log.section(f"EXPERIMENT {eid} (post-hoc)")
        t0 = time.time()
        from vivqa_tpu.train.checkpoint import (CheckpointConfig,
                                                CheckpointManager)
        # full architecture + the masked modes' mask; the router config
        # must stay the baseline's (the matrix gives post-hoc rows the
        # default router)
        model_cfg, mask = self._modified_model(experiment)
        if self.config.model_type == "generative":
            from vivqa_tpu.models.generative import GenerativeVQAModel
            model = GenerativeVQAModel(model_cfg)
        else:
            from vivqa_tpu.models.vqa_model import VietnameseVQAModel
            mc = model_cfg.replace(num_answers=len(self.data.answer2id))
            model = VietnameseVQAModel(mc)
        ckpt = CheckpointManager(CheckpointConfig(
            directory=str(self._baseline_checkpoint_dir()),
            best_metric=self.config.primary_metric))
        try:
            restored, _ = ckpt.restore_best()
        finally:
            ckpt.close()
        params = restored["params"]
        if self.config.model_type == "generative":
            correct_mask = self._generative_mask_from_params(model, params,
                                                             mask)
        else:
            correct_mask = self._correct_mask_from_params(model, params,
                                                          mask)
        metrics = {"exact_match": (sum(correct_mask) / len(correct_mask)
                                   if correct_mask else 0.0),
                   "n_eval": len(correct_mask)}
        moe_metrics = None
        if self.config.model_type != "generative":
            moe_metrics = self._moe_metrics_from_params(model, params, mask)
        return ExperimentResult(
            experiment_id=eid, status="completed", metrics=metrics,
            history=[], wall_seconds=time.time() - t0,
            moe_metrics=moe_metrics, correct_mask=correct_mask)

    def backfill_correct_mask(self, experiment: ExperimentConfig):
        """Compute ``correct_mask`` for an already-trained experiment
        from its saved best checkpoint — lets older studies gain paired
        McNemar tests without retraining."""
        from vivqa_tpu.train.checkpoint import (CheckpointConfig,
                                                CheckpointManager)
        model_cfg, mask = self._modified_model(experiment)
        if self.config.model_type == "generative":
            from vivqa_tpu.models.generative import GenerativeVQAModel
            model = GenerativeVQAModel(model_cfg)
        else:
            from vivqa_tpu.models.vqa_model import VietnameseVQAModel
            mc = model_cfg.replace(num_answers=len(self.data.answer2id))
            model = VietnameseVQAModel(mc)
        ckpt = CheckpointManager(CheckpointConfig(
            directory=str(Path(self.config.output_dir) / "checkpoints" /
                          experiment.experiment_id),
            best_metric=self.config.primary_metric))
        try:
            restored, _ = ckpt.restore_best()
        finally:
            ckpt.close()
        if self.config.model_type == "generative":
            return self._generative_mask_from_params(
                model, restored["params"], mask)
        return self._correct_mask_from_params(model, restored["params"],
                                              mask)

    def run_experiment(self, experiment: ExperimentConfig) -> ExperimentResult:
        eid = experiment.experiment_id
        log = self.log
        t0 = time.time()
        if experiment.expert.post_hoc:
            try:
                return self._run_post_hoc_experiment(experiment)
            except KeyboardInterrupt:
                return ExperimentResult(
                    experiment_id=eid, status="interrupted", metrics={},
                    history=[], wall_seconds=time.time() - t0,
                    error="KeyboardInterrupt")
            except Exception:  # noqa: BLE001
                log.failure(f"post-hoc experiment {eid} failed")
                return ExperimentResult(
                    experiment_id=eid, status="failed", metrics={},
                    history=[], wall_seconds=time.time() - t0,
                    error=traceback.format_exc(limit=5))
        log.section(f"EXPERIMENT {eid}")
        accumulate = 1
        for attempt in range(2):
            try:
                out, moe_metrics, correct_mask = self._build_and_run(
                    experiment, accumulate)
                history = out.history
                final = dict(history[-1]) if history else {}
                # the classification pipeline restores the BEST checkpoint
                # into out.state and re-validates it into final_metrics;
                # the reported metrics must describe those same params
                # (correct_mask and moe telemetry are computed from them)
                if getattr(out, "final_metrics", None):
                    final.update(out.final_metrics)
                try:
                    # val-set size: lets the evaluator bound the binomial
                    # noise floor on accuracy-like metrics
                    final["n_eval"] = len(self.data.val_loader.dataset)
                except (AttributeError, TypeError):
                    pass
                self._save_epoch_results(eid, history)
                if not self.check_mask_consistency(
                        correct_mask, final.get("exact_match"), eid):
                    correct_mask = None
                return ExperimentResult(
                    experiment_id=eid, status="completed", metrics=final,
                    history=history, wall_seconds=time.time() - t0,
                    moe_metrics=moe_metrics, correct_mask=correct_mask)
            except KeyboardInterrupt:
                return ExperimentResult(
                    experiment_id=eid, status="interrupted", metrics={},
                    history=[], wall_seconds=time.time() - t0,
                    error="KeyboardInterrupt")
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                oom = "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()
                if oom and attempt == 0:
                    accumulate *= 2
                    log.warning(f"OOM in {eid}; retrying with gradient "
                                f"accumulation x{accumulate}")
                    continue
                log.failure(f"experiment {eid} failed: {msg.splitlines()[0]}")
                return ExperimentResult(
                    experiment_id=eid, status="failed", metrics={},
                    history=[], wall_seconds=time.time() - t0,
                    error=traceback.format_exc(limit=5))
        return ExperimentResult(eid, "failed", {}, [], time.time() - t0,
                                "unreachable")
