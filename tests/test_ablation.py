"""Ablation subsystem tests: matrix generation, masks, evaluator/analyzer/
reporter on synthetic results, and one real end-to-end mini-experiment."""

import json

import numpy as np
import pytest

from vivqa_tpu.ablation import (AblationAnalyzer, AblationConfig,
                                AblationEvaluator, AblationReporter,
                                AblationRunner, AblationSearchSpace,
                                AblationTrainer, ExperimentResult,
                                ExpertAblationConfig, RouterAblationConfig,
                                build_expert_mask,
                                compute_expert_index_ranges)
from vivqa_tpu.ablation.run_ablation import parse_experiment_ranges


def test_experiment_matrix_structure():
    cfg = AblationConfig(search=AblationSearchSpace(
        num_experts=4, subset_sizes=(2,), max_subsets_per_size=3,
        router_types=("noisy_topk", "soft", "topk"),
        top_k_values=(1, 2), load_balance_weights=(0.01,)))
    matrix = cfg.generate_experiment_matrix()
    ids = [e.experiment_id for e in matrix]
    assert ids[0].startswith("full__")                 # baseline first
    assert any(i.startswith("no_moe__") for i in ids)
    assert sum(1 for i in ids if i.startswith("single_expert")) == 4
    assert sum(1 for i in ids if i.startswith("leave_one_out")) == 4
    assert sum(1 for i in ids if i.startswith("subset_")) == 3
    # soft router: top_k redundancy skipped -> only one soft entry
    soft = [i for i in ids if "soft" in i]
    assert len(soft) == 1
    # ids unique
    assert len(ids) == len(set(ids))


def test_expert_masks():
    assert build_expert_mask(ExpertAblationConfig("full"), 4) is None
    m = build_expert_mask(ExpertAblationConfig("single_expert", (2,)), 4)
    assert m == (0.0, 0.0, 1.0, 0.0)
    m = build_expert_mask(ExpertAblationConfig("leave_one_out", (1,)), 4)
    assert m == (1.0, 0.0, 1.0, 1.0)
    m = build_expert_mask(ExpertAblationConfig("subset", (0, 3)), 4)
    assert m == (1.0, 0.0, 0.0, 1.0)
    with pytest.raises(ValueError):
        build_expert_mask(ExpertAblationConfig("subset", ()), 4)


def test_index_ranges():
    r = compute_expert_index_ranges(2, 2, 1, 3)
    assert r == {"vision": (0, 2), "text": (2, 4), "multimodal": (4, 5),
                 "specialized": (5, 8)}


def test_parse_ranges():
    assert parse_experiment_ranges("1,3,5-7") == [1, 3, 5, 6, 7]
    assert parse_experiment_ranges("0") == [0]
    assert parse_experiment_ranges("2-2,2") == [2]


def _fake_results():
    def r(eid, metric):
        return ExperimentResult(experiment_id=eid, status="completed",
                                metrics={"vqa_accuracy": metric,
                                         "val_loss": 1 - metric},
                                history=[], wall_seconds=1.0)
    return [
        r("full__noisy_topk_k2_lb0.01", 0.60),
        r("no_moe__noisy_topk_k2_lb0.01", 0.50),
        r("leave_one_out_0__noisy_topk_k2_lb0.01", 0.52),  # expert 0 matters
        r("leave_one_out_1__noisy_topk_k2_lb0.01", 0.61),  # expert 1 redundant
        r("single_expert_0__noisy_topk_k2_lb0.01", 0.40),
        r("single_expert_1__noisy_topk_k2_lb0.01", 0.30),
        r("subset_0-1__noisy_topk_k2_lb0.01", 0.45),
        r("full__soft_k0_lb0.01", 0.55),
        ExperimentResult("broken__x", "failed", {}, [], 0.1, "boom"),
    ]


def test_evaluator_and_analyzer():
    ev = AblationEvaluator(_fake_results(), "vqa_accuracy")
    assert ev.baseline().metrics["vqa_accuracy"] == 0.60
    assert len(ev.results) == 8                      # failed filtered
    rank = ev.ranking()
    assert rank[0].experiment_id.startswith("leave_one_out_1")
    imp = ev.expert_importance()
    assert imp[0].expert_index == 0 and imp[0].importance > 0
    deltas = ev.deltas_from_baseline()
    assert np.isclose(deltas["no_moe__noisy_topk_k2_lb0.01"], -0.10)

    an = AblationAnalyzer(ev)
    contribs = {c.expert_index: c.classification
                for c in an.expert_contributions()}
    assert contribs[0] == "essential"
    assert contribs[1] == "redundant"
    syn = an.pairwise_synergies()
    assert syn and syn[0].experts == (0, 1)
    findings = an.generate_key_findings()
    assert any("Baseline" in f for f in findings)
    assert any("improves" in f for f in findings)
    rec = an.recommendation()
    assert 0 in rec.keep_experts and 1 in rec.drop_experts


def test_noise_floor_and_significance():
    # no n_eval anywhere -> no floor, significance unknown (None)
    ev = AblationEvaluator(_fake_results(), "vqa_accuracy")
    assert ev.noise_floor() is None
    an = AblationAnalyzer(ev)
    assert all(c.significant is None for c in an.expert_contributions())

    # explicit n_eval: binomial floor at the baseline p
    ev = AblationEvaluator(_fake_results(), "vqa_accuracy", n_eval=200)
    floor = ev.noise_floor()
    assert floor["n_eval"] == 200
    sigma = np.sqrt(0.6 * 0.4 / 200)
    assert np.isclose(floor["sigma"], sigma)
    assert np.isclose(floor["ci95_diff"], 1.96 * np.sqrt(2) * sigma)
    # ci95_diff ~= 0.096: expert-0 importance 0.08 is within noise,
    # and with n_eval=20000 (bound ~0.0096) it becomes significant
    an = AblationAnalyzer(ev)
    sig = {c.expert_index: c.significant for c in an.expert_contributions()}
    assert sig[0] is False
    ev_big = AblationEvaluator(_fake_results(), "vqa_accuracy", n_eval=20000)
    sig_big = {c.expert_index: c.significant
               for c in AblationAnalyzer(ev_big).expert_contributions()}
    assert sig_big[0] is True
    findings = AblationAnalyzer(ev).generate_key_findings()
    assert any("Noise floor" in f for f in findings)
    assert any("noise bound" in f for f in findings)

    # metric fallback: an n_eval recorded in any result's metrics
    res = _fake_results()
    res[0].metrics["n_eval"] = 100
    ev = AblationEvaluator(res, "vqa_accuracy")
    assert ev.noise_floor()["n_eval"] == 100

    # non-[0,1] primary metric -> no floor
    ev = AblationEvaluator(_fake_results(), "val_loss", n_eval=200)
    for r in ev.results:
        r.metrics["val_loss"] = 1.7
    assert ev.noise_floor() is None


def test_mcnemar_exact_p():
    from vivqa_tpu.ablation.evaluator import mcnemar_exact_p
    assert mcnemar_exact_p(0, 0) == 1.0
    assert mcnemar_exact_p(3, 3) == 1.0                  # symmetric
    # b=10, c=0: 2 * C(10,0) * 0.5^10 = 2/1024
    assert np.isclose(mcnemar_exact_p(10, 0), 2 / 1024)
    assert mcnemar_exact_p(10, 0) < 0.05
    assert mcnemar_exact_p(4, 1) > 0.05                  # too few discordant
    assert mcnemar_exact_p(1, 4) == mcnemar_exact_p(4, 1)  # two-sided


def test_paired_comparisons_and_significance():
    res = _fake_results()
    n = 100
    base_mask = [1] * 60 + [0] * 40
    # LOO-0: 12 baseline-only-correct, 0 ablated-only -> p ~ 2*0.5^12, sig
    loo0_mask = [1] * 48 + [0] * 12 + [0] * 40
    # LOO-1: 2 vs 3 discordant -> not significant
    loo1_mask = ([1] * 58 + [0] * 2) + ([1] * 3 + [0] * 37)
    for r in res:
        if r.experiment_id.startswith("full__noisy"):
            r.correct_mask = base_mask
        elif r.experiment_id.startswith("leave_one_out_0"):
            r.correct_mask = loo0_mask
        elif r.experiment_id.startswith("leave_one_out_1"):
            r.correct_mask = loo1_mask
    ev = AblationEvaluator(res, "vqa_accuracy", n_eval=n)
    paired = ev.paired_comparisons()
    by_id = {p["experiment_id"]: p for p in paired}
    p0 = by_id["leave_one_out_0__noisy_topk_k2_lb0.01"]
    assert p0["baseline_only_correct"] == 12
    assert p0["ablated_only_correct"] == 0
    assert p0["significant"] and p0["p_value"] < 0.001
    assert np.isclose(p0["delta"], 0.12)
    p1 = by_id["leave_one_out_1__noisy_topk_k2_lb0.01"]
    assert not p1["significant"]
    assert paired[0] is p0                               # sorted by p

    # analyzer prefers the paired verdict over the binomial bound:
    # expert 0 significant despite |imp|=0.08 < ci95_diff~0.136 at n=100
    an = AblationAnalyzer(ev)
    sig = {c.expert_index: c.significant for c in an.expert_contributions()}
    assert sig[0] is True and sig[1] is False
    findings = an.generate_key_findings()
    assert any("McNemar" in f for f in findings)

    # masks of mismatched length are skipped, absent masks -> no tests
    res[2].correct_mask = [1, 0]
    ev = AblationEvaluator(res, "vqa_accuracy")
    assert all(p["experiment_id"] != "leave_one_out_0__noisy_topk_k2_lb0.01"
               for p in ev.paired_comparisons())
    for r in res:
        r.correct_mask = None
    assert AblationEvaluator(res, "vqa_accuracy").paired_comparisons() == []


def test_recommendation_respects_significance():
    # With a noise floor present and NO significant importances, the
    # keep/drop lists must be empty and the rationale must say why —
    # the recommendation can never contradict the findings (r3 weak #2).
    ev = AblationEvaluator(_fake_results(), "vqa_accuracy", n_eval=200)
    an = AblationAnalyzer(ev)
    assert all(c.significant is False for c in an.expert_contributions()
               if c.significant is not None)
    rec = an.recommendation()
    assert rec.keep_experts == [] and rec.drop_experts == []
    assert "NOT significant" in rec.rationale
    assert "no expert's importance passes" in rec.rationale
    # ... and the trends are still named, clearly labeled
    assert "[0]" in rec.rationale          # nominally helpful: expert 0

    # With n_eval large enough that both importances separate, the
    # significant experts enter the lists.
    ev_big = AblationEvaluator(_fake_results(), "vqa_accuracy",
                               n_eval=20000)
    rec_big = AblationAnalyzer(ev_big).recommendation()
    assert 0 in rec_big.keep_experts and 1 in rec_big.drop_experts
    assert "significantly" in rec_big.rationale

    # No noise floor at all -> legacy raw-classification behavior,
    # flagged as such.
    rec_raw = AblationAnalyzer(
        AblationEvaluator(_fake_results(), "vqa_accuracy")).recommendation()
    assert 0 in rec_raw.keep_experts and 1 in rec_raw.drop_experts
    assert "no noise floor" in rec_raw.rationale


def test_ranking_tiebreak_deterministic():
    def r(eid, acc, loss):
        return ExperimentResult(eid, "completed",
                                {"vqa_accuracy": acc, "val_loss": loss},
                                [], 1.0)
    # exact primary-metric tie: val_loss breaks it, then experiment_id
    results = [r("b_exp", 0.8, 0.5), r("a_exp", 0.8, 0.3),
               r("c_exp", 0.8, 0.3), r("d_exp", 0.7, 0.1)]
    for perm in (results, results[::-1]):
        rank = AblationEvaluator(perm, "vqa_accuracy").ranking()
        assert [x.experiment_id for x in rank] == \
            ["a_exp", "c_exp", "b_exp", "d_exp"]
    # findings report a tie as a tie, not a single winner
    ev = AblationEvaluator(results, "vqa_accuracy")
    findings = AblationAnalyzer(ev).generate_key_findings()
    tie = [f for f in findings if "Best configuration" in f]
    assert tie and "TIE" in tie[0] and "a_exp" in tie[0]
    # distinct best -> named normally
    ev2 = AblationEvaluator([r("x", 0.9, 0.1), r("y", 0.8, 0.1)],
                            "vqa_accuracy")
    f2 = [f for f in AblationAnalyzer(ev2).generate_key_findings()
          if "Best configuration" in f]
    assert f2 and "TIE" not in f2[0] and "x" in f2[0]


def test_saturated_vqa_accuracy_note():
    def r(eid, em):
        return ExperimentResult(
            eid, "completed",
            {"exact_match": em, "vqa_accuracy": em / 3.0,
             "val_loss": 1 - em}, [], 1.0)
    res = [r("full__noisy_topk_k2_lb0.01", 0.82),
           r("no_moe__noisy_topk_k2_lb0.01", 0.81)]
    ev = AblationEvaluator(res, "exact_match")
    rep = AblationReporter(ev, AblationAnalyzer(ev))
    md = rep.generate_markdown_report()
    assert "SATURATED" in md and "min(count/3, 1)" in md
    # not saturated (vqa_accuracy != exact_match/3) -> no note
    res[0].metrics["vqa_accuracy"] = 0.9
    md2 = AblationReporter(ev, AblationAnalyzer(ev)) \
        .generate_markdown_report()
    assert "SATURATED" not in md2
    # primary IS vqa_accuracy -> ranking is BY the column, keep it clean
    res[0].metrics["vqa_accuracy"] = res[0].metrics["exact_match"] / 3.0
    ev3 = AblationEvaluator(res, "vqa_accuracy")
    md3 = AblationReporter(ev3, AblationAnalyzer(ev3)) \
        .generate_markdown_report()
    assert "SATURATED" not in md3


def test_reporter_outputs(tmp_path):
    ev = AblationEvaluator(_fake_results(), "vqa_accuracy")
    rep = AblationReporter(ev, AblationAnalyzer(ev))
    md = rep.generate_markdown_report()
    assert "# MoE Ablation Study Report" in md
    assert "## Ranking" in md and "## Expert importance" in md
    tex = rep.generate_latex_table()
    assert "\\begin{table}" in tex and "full\\_\\_" in tex
    files = rep.save_all_reports(tmp_path)
    for f in files.values():
        assert len(open(f).read()) > 0


@pytest.mark.slow
def test_mini_ablation_end_to_end(tmp_path, mesh8):
    """Three real experiments (full / no_moe / single_expert) on tiny
    synthetic data, exercising the runner resume machinery."""
    from vivqa_tpu.data import generate_synthetic_vivqa
    from vivqa_tpu.models.config import (FusionConfig, MoEModelConfig,
                                         TextEncoderConfig,
                                         VisualEncoderConfig, VQAModelConfig)
    from vivqa_tpu.pipelines.data_pipeline import (DataPipeline,
                                                   DataPipelineConfig)
    csv, imgs = generate_synthetic_vivqa(tmp_path / "d", n=24, image_size=16)
    data_out = DataPipeline(DataPipelineConfig(
        csv_path=str(csv), image_dir=str(imgs), image_size=16,
        max_question_length=8, batch_size=8,
        augmentation_strength="light")).run()
    base = VQAModelConfig(
        visual=VisualEncoderConfig(image_size=16, patch_size=8,
                                   hidden_dim=32, num_layers=1, num_heads=2),
        text=TextEncoderConfig(vocab_size=data_out.tokenizer.vocab_size,
                               hidden_dim=32, num_layers=1, num_heads=2,
                               max_length=8),
        fusion=FusionConfig(fusion_type="concat", hidden_dim=32,
                            num_heads=2, num_layers=1),
        moe=MoEModelConfig(use_moe=True, num_experts=2, top_k=1,
                           expert_hidden_dim=32))
    cfg = AblationConfig(
        search=AblationSearchSpace(num_experts=2, include_leave_one_out=False,
                                   include_single_expert=True),
        num_epochs=1, batch_size=8, learning_rate=5e-3,
        output_dir=str(tmp_path / "abl"))
    trainer = AblationTrainer(cfg, base, data_out, mesh8)
    runner = AblationRunner(cfg, trainer)
    results = runner.run(selected=[0, 1, 2])
    statuses = {r.experiment_id: r.status for r in results}
    assert all(s == "completed" for s in statuses.values()), statuses
    # router telemetry collected for MoE experiments
    full = next(r for r in results if r.experiment_id.startswith("full__"))
    assert full.moe_metrics and "expert_usage" in full.moe_metrics
    assert (tmp_path / "abl" / "reports" / "report.md").exists()
    assert (tmp_path / "abl" / "manifest.json").exists()
    assert (tmp_path / "abl" / "progress.json").exists()
    # per-epoch CSVs written
    eid = results[0].experiment_id
    assert (tmp_path / "abl" / "epoch_results" / eid /
            "val_history.csv").exists()

    # resume: re-running skips everything
    results2 = runner.run(selected=[0, 1, 2])
    assert len(results2) == len(results)


def test_baseline_prefers_default_router():
    def r(eid, acc):
        return ExperimentResult(eid, "completed", {"vqa_accuracy": acc},
                                [], 1.0)
    # full__soft loaded FIRST: baseline must still be the default-router
    # full run (the suffix most experiments share), not load order
    res = [r("full__soft_k0_lb0.01", 0.55),
           r("full__noisy_topk_k2_lb0.01", 0.60),
           r("leave_one_out_0__noisy_topk_k2_lb0.01", 0.52),
           r("leave_one_out_1__noisy_topk_k2_lb0.01", 0.61),
           r("no_moe__noisy_topk_k2_lb0.01", 0.50)]
    for perm in (res, res[::-1]):
        ev = AblationEvaluator(perm, "vqa_accuracy")
        assert ev.baseline().experiment_id == "full__noisy_topk_k2_lb0.01"
    # single full run: returned regardless of suffix
    ev1 = AblationEvaluator([r("full__soft_k0_lb0.01", 0.5)],
                            "vqa_accuracy")
    assert ev1.baseline().experiment_id == "full__soft_k0_lb0.01"


def test_mask_consistency_check():
    """A correct_mask whose mean disagrees with the reported exact_match
    must be discarded (it was computed through a different code path
    than the metric — McNemar on it would be garbage)."""
    from vivqa_tpu.ablation.trainer import AblationTrainer

    class _Log:
        def __init__(self):
            self.warned = []

        def warning(self, msg, *a):
            self.warned.append(msg % a if a else msg)

    t = AblationTrainer.__new__(AblationTrainer)
    t.log = _Log()
    good = [1] * 82 + [0] * 18
    assert t.check_mask_consistency(good, 0.82, "x") is True
    assert not t.log.warned
    bad = [1] * 44 + [0] * 56
    assert t.check_mask_consistency(bad, 0.82, "x") is False
    assert t.log.warned and "DISCARDING" in t.log.warned[0]
    # absent mask / metric -> vacuously consistent
    assert t.check_mask_consistency(None, 0.82) is True
    assert t.check_mask_consistency(good, None) is True


def test_clopper_pearson_and_delta_ci():
    from vivqa_tpu.ablation.evaluator import (clopper_pearson,
                                              discordant_delta_ci)
    # textbook values: k=0 -> lower 0, upper 1-(alpha/2)^(1/n)
    lo, hi = clopper_pearson(0, 10)
    assert lo == 0.0
    assert np.isclose(hi, 1 - 0.025 ** (1 / 10), atol=1e-6)
    # k=n -> symmetric
    lo2, hi2 = clopper_pearson(10, 10)
    assert hi2 == 1.0 and np.isclose(lo2, 1 - hi, atol=1e-6)
    # coverage sanity: k=5, n=10 is symmetric around 0.5
    lo3, hi3 = clopper_pearson(5, 10)
    assert np.isclose(lo3 + hi3, 1.0, atol=1e-6)
    assert lo3 < 0.5 < hi3

    # delta CI: zero discordant -> rule-of-three bound, symmetric
    lo, hi = discordant_delta_ci(0, 0, 204)
    assert np.isclose(hi, 1 - 0.05 ** (1 / 204), atol=1e-6)
    assert lo == -hi
    # b=c -> CI straddles zero symmetrically
    lo, hi = discordant_delta_ci(3, 3, 204)
    assert lo < 0 < hi and np.isclose(lo, -hi, atol=1e-9)
    # extreme asymmetry -> CI excludes zero
    lo, hi = discordant_delta_ci(12, 0, 100)
    assert lo > 0
    # evaluator threads it through paired_comparisons
    res = _fake_results()
    res[0].correct_mask = [1] * 60 + [0] * 40
    res[2].correct_mask = [1] * 48 + [0] * 12 + [0] * 40
    ev = AblationEvaluator(res, "vqa_accuracy")
    p = ev.paired_comparisons()[0]
    assert p["delta_ci95"][0] > 0          # significant effect: CI > 0


def test_post_hoc_matrix_generation():
    """post_hoc_masks emits an eval-time twin (ph_ prefix) for every
    masked ablation, never for full/no_moe."""
    cfg = AblationConfig(search=AblationSearchSpace(
        num_experts=3, include_single_expert=True,
        include_leave_one_out=True, post_hoc_masks=True))
    ids = [e.experiment_id for e in cfg.generate_experiment_matrix()]
    assert sum(1 for i in ids if i.startswith("ph_single_expert")) == 3
    assert sum(1 for i in ids if i.startswith("ph_leave_one_out")) == 3
    assert not any(i.startswith("ph_full") or i.startswith("ph_no_moe")
                   for i in ids)
    assert len(ids) == len(set(ids))
    # ph rows don't leak into the retrained importance regexes
    import re
    assert not any(re.match(r"leave_one_out_(\d+)__", i)
                   for i in ids if i.startswith("ph_"))


def test_post_hoc_experiment_end_to_end(tmp_path, mesh8):
    """A post-hoc row evaluates the trained FULL baseline's checkpoint
    with the mask applied at eval time — no retraining, mask-consistent
    metrics, and a single-expert mask that demonstrably changes the
    mask relative to the baseline's."""
    from vivqa_tpu.data import generate_synthetic_vivqa
    from vivqa_tpu.models.config import (FusionConfig, MoEModelConfig,
                                         TextEncoderConfig,
                                         VisualEncoderConfig, VQAModelConfig)
    from vivqa_tpu.pipelines.data_pipeline import (DataPipeline,
                                                   DataPipelineConfig)
    csv, imgs = generate_synthetic_vivqa(tmp_path / "d", n=24, image_size=16)
    data_out = DataPipeline(DataPipelineConfig(
        csv_path=str(csv), image_dir=str(imgs), image_size=16,
        max_question_length=8, batch_size=8,
        augmentation_strength="light")).run()
    base = VQAModelConfig(
        visual=VisualEncoderConfig(image_size=16, patch_size=8,
                                   hidden_dim=32, num_layers=1, num_heads=2),
        text=TextEncoderConfig(vocab_size=data_out.tokenizer.vocab_size,
                               hidden_dim=32, num_layers=1, num_heads=2,
                               max_length=8),
        fusion=FusionConfig(fusion_type="concat", hidden_dim=32,
                            num_heads=2, num_layers=1),
        moe=MoEModelConfig(use_moe=True, num_experts=2, top_k=1,
                           expert_hidden_dim=32))
    cfg = AblationConfig(
        search=AblationSearchSpace(num_experts=2, include_no_moe=False,
                                   include_leave_one_out=False,
                                   include_single_expert=True,
                                   post_hoc_masks=True),
        num_epochs=1, batch_size=8, learning_rate=5e-3,
        output_dir=str(tmp_path / "abl"))
    matrix = cfg.generate_experiment_matrix()
    ids = [e.experiment_id for e in matrix]
    i_full = next(i for i, x in enumerate(ids) if x.startswith("full__"))
    i_ph = next(i for i, x in enumerate(ids)
                if x.startswith("ph_single_expert_0"))
    trainer = AblationTrainer(cfg, base, data_out, mesh8)
    runner = AblationRunner(cfg, trainer)
    results = runner.run(selected=[i_full, i_ph])
    by_id = {r.experiment_id: r for r in results}
    ph = by_id[ids[i_ph]]
    full = by_id[ids[i_full]]
    assert ph.status == "completed", ph.error
    assert ph.history == []                      # no training happened
    assert not (tmp_path / "abl" / "checkpoints" / ids[i_ph]).exists()
    n_val = len(data_out.val_loader.dataset)
    assert ph.correct_mask is not None and len(ph.correct_mask) == n_val
    # metrics are derived from the mask -> consistent by construction
    assert abs(ph.metrics["exact_match"]
               - sum(ph.correct_mask) / n_val) < 1e-9
    # the masked model routes everything through expert 0 only
    assert ph.moe_metrics is not None
    assert ph.moe_metrics["num_active_experts"] <= 1
    # paired machinery picks the ph row up against the baseline
    ev = AblationEvaluator(list(by_id.values()), "exact_match",
                           "classification", n_eval=n_val)
    paired = ev.paired_comparisons()
    assert any(p["experiment_id"] == ids[i_ph] for p in paired) \
        or full.correct_mask is None
    # resume: second run skips both
    results2 = runner.run(selected=[i_full, i_ph])
    assert {r.experiment_id for r in results2} == set(by_id)
