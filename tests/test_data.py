"""Data layer tests: CSV loading, splitting, vocab quirks, tokenizers,
augmentation, datasets, loader + device prefetch."""

import numpy as np
import pytest

from vivqa_tpu.data import (BatchLoader, GenerativeVQADataset,
                            ImageAugmentation, OneSample, VQADataset,
                            WhitespaceTokenizer, build_answer_vocab,
                            data_statistics, device_prefetch,
                            encode_answer_counts, generate_synthetic_vivqa,
                            generative_collate, load_raw_data,
                            majority_answer, parse_answers, split_data,
                            synthetic_samples, validate_samples, vqa_collate,
                            IGNORE_INDEX)


def test_parse_answers_forms():
    assert parse_answers("['a', 'b']") == ["a", "b"]
    assert parse_answers("mèo") == ["mèo"]
    assert parse_answers(["x"]) == ["x"]
    assert parse_answers("[broken") == ["[broken"]


def test_synthetic_csv_roundtrip(tmp_path):
    csv_path, img_dir = generate_synthetic_vivqa(tmp_path, n=12, image_size=16)
    samples = load_raw_data(csv_path, img_dir)
    assert len(samples) == 12
    assert all(s.answers for s in samples)
    # image paths resolved through the index
    assert all(str(img_dir) in s.image_path for s in samples)
    stats = data_statistics(samples)
    assert stats["num_samples"] == 12 and stats["num_unique_answers"] > 0


def test_ensure_synthetic_vivqa_manifest(tmp_path):
    """Corpus-cache reuse is manifest-validated (advisor r4 medium): a
    cached corpus generated with different params must raise, not be
    silently resized and reused."""
    from vivqa_tpu.data import ensure_synthetic_vivqa

    d = tmp_path / "corpus"
    csv1, imgs1 = ensure_synthetic_vivqa(d, n=6, image_size=16)
    assert (d / "manifest.json").exists()
    # matching params -> reuse (same paths, no error)
    csv2, _ = ensure_synthetic_vivqa(d, n=6, image_size=16)
    assert csv2 == csv1
    # mismatched params -> explicit error
    with pytest.raises(ValueError, match="generated with"):
        ensure_synthetic_vivqa(d, n=6, image_size=32)
    with pytest.raises(ValueError, match="generated with"):
        ensure_synthetic_vivqa(d, n=12, image_size=16)
    # pre-manifest cache: verified via cheap invariants, then stamped
    (d / "manifest.json").unlink()
    csv3, _ = ensure_synthetic_vivqa(d, n=6, image_size=16)
    assert csv3 == csv1 and (d / "manifest.json").exists()
    (d / "manifest.json").unlink()
    with pytest.raises(ValueError, match="no manifest"):
        ensure_synthetic_vivqa(d, n=7, image_size=16)


def test_validate_samples_drops_bad():
    good = OneSample("a.jpg", "q?", ["a"])
    bad = OneSample("", "", [])
    kept, problems = validate_samples([good, bad])
    assert kept == [good] and len(problems) == 1


def test_split_data_deterministic():
    samples = synthetic_samples(20)
    t1, v1, e1 = split_data(samples, 0.7, 0.2, seed=1)
    t2, v2, e2 = split_data(samples, 0.7, 0.2, seed=1)
    assert [s.question for s in t1] == [s.question for s in t2]
    assert len(t1) == 14 and len(v1) == 4 and len(e1) == 2


def test_answer_vocab_unk_is_zero():
    samples = [OneSample("x", "q", ["mèo", "mèo", "chó"]),
               OneSample("x", "q", ["chó"]),
               OneSample("x", "q", ["gà"])]
    a2i, i2a = build_answer_vocab(samples, min_freq=1)
    assert a2i["<unk>"] == 0
    assert set(a2i) == {"<unk>", "mèo", "chó", "gà"}
    assert i2a[a2i["mèo"]] == "mèo"
    # min_freq filters
    a2i2, _ = build_answer_vocab(samples, min_freq=2)
    assert set(a2i2) == {"<unk>"}  # each majority answer appears once


def test_majority_and_counts():
    assert majority_answer(["a", "b", "a"]) == "a"
    counts = encode_answer_counts(["a", "a", "zzz"], {"<unk>": 0, "a": 1})
    assert counts == {1: 2, 0: 1}


def test_whitespace_tokenizer_roundtrip(tmp_path):
    tok = WhitespaceTokenizer(max_length=8)
    tok.build_vocab(["con mèo đen", "con chó trắng"])
    ids = tok.encode("con mèo trắng")
    assert ids.shape == (8,)
    assert tok.decode(ids) == "con mèo trắng"
    # unknown word -> <unk> dropped at decode
    ids2 = tok.encode("con voi")
    assert tok.decode(ids2) == "con"
    enc = tok.encode_batch(["con mèo", "chó"])
    assert enc["input_ids"].shape == (2, 8)
    assert enc["attention_mask"].sum() == 3
    tok.save(tmp_path / "tok.json")
    tok2 = WhitespaceTokenizer.load(tmp_path / "tok.json")
    assert tok2.vocab == tok.vocab


def test_augmentation_shapes_and_placeholder():
    aug = ImageAugmentation(image_size=32, mode="eval")
    out = aug("definitely_missing_file.jpg")     # placeholder path
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    aug_t = ImageAugmentation(image_size=32, mode="train", strength="strong",
                              seed=0)
    arr = np.random.rand(48, 48, 3).astype(np.float32)
    out2 = aug_t(arr)
    assert out2.shape == (32, 32, 3)
    with pytest.raises(ValueError):
        ImageAugmentation(strength="nope")


def _toy_setup(n=10):
    samples = synthetic_samples(n)
    tok = WhitespaceTokenizer(max_length=8)
    tok.build_vocab([s.question for s in samples] +
                    [a for s in samples for a in s.answers])
    a2i, _ = build_answer_vocab(samples)
    aug = ImageAugmentation(image_size=16, mode="eval")
    return samples, tok, a2i, aug


def test_vqa_dataset_and_collate():
    samples, tok, a2i, aug = _toy_setup()
    ds = VQADataset(samples, tok, a2i, aug, max_question_length=8)
    item = ds[0]
    assert item["pixel_values"].shape == (16, 16, 3)
    assert item["input_ids"].shape == (8,)
    assert 0 <= item["labels"] < len(a2i)
    batch = vqa_collate([ds[i] for i in range(4)])
    assert batch["pixel_values"].shape == (4, 16, 16, 3)
    assert batch["labels"].shape == (4,)
    assert len(batch["answer_counts"]) == 4


def test_generative_dataset_teacher_forcing():
    samples, tok, a2i, aug = _toy_setup()
    ds = GenerativeVQADataset(samples, tok, aug, max_question_length=8,
                              max_answer_length=6)
    item = ds[0]
    dec, lab = item["decoder_input_ids"], item["labels"]
    assert dec[0] == tok.bos_token_id
    # labels are dec shifted left, ending with EOS then IGNORE padding
    n_real = int(item["decoder_mask"].sum())
    assert lab[n_real - 1] == tok.eos_token_id
    assert (lab[n_real:] == IGNORE_INDEX).all()
    np.testing.assert_array_equal(dec[1:n_real], lab[:n_real - 1])
    batch = generative_collate([ds[i] for i in range(3)])
    assert batch["decoder_input_ids"].shape == (3, 6)


def test_batch_loader_static_shapes_and_prefetch(mesh8):
    from vivqa_tpu.parallel import batch_sharding
    samples, tok, a2i, aug = _toy_setup(n=20)
    ds = VQADataset(samples, tok, a2i, aug, max_question_length=8)
    loader = BatchLoader(ds, batch_size=8, collate=vqa_collate, seed=3)
    assert len(loader) == 2          # drop_last
    batches = list(device_prefetch(iter(loader),
                                   sharding=batch_sharding(mesh8)))
    assert len(batches) == 2
    b = batches[0]
    assert b["pixel_values"].shape == (8, 16, 16, 3)
    from jax.sharding import PartitionSpec as P
    assert b["pixel_values"].sharding.spec == P("data")
    assert isinstance(b["question"], list)      # host fields ride along
    # reshuffles across epochs
    e1 = [s for s in loader][0]["labels"]
    e2 = [s for s in loader][0]["labels"]
    assert not np.array_equal(e1, e2)


def test_save_and_load_data_split(tmp_path):
    from vivqa_tpu.data.actions import load_data_split, save_data
    samples = synthetic_samples(6)
    written = save_data({"train": samples[:4], "val": samples[4:]},
                        tmp_path)
    assert set(written) == {"train", "val"}
    back = load_data_split(tmp_path, "train")
    assert len(back) == 4
    assert back[0].question == samples[0].question
    ranged = load_data_split(tmp_path, "train", start=1, end=3)
    assert len(ranged) == 2


def test_text_augmentation_semantics():
    """Reference augmentation.py:350-473 parity: deletion keeps >=1 word,
    swap preserves the word multiset, p=0 is identity."""
    from vivqa_tpu.data import TextAugmentation, create_text_augmentation
    text = "con mèo đang ngồi trên bàn gỗ"
    ident = TextAugmentation(augmentation_probability=0.0, seed=0)
    assert ident(text) == text
    aug = create_text_augmentation(1.0, seed=0)
    changed = False
    for _ in range(50):
        out = aug(text)
        words, orig = out.split(), text.split()
        assert 1 <= len(words) <= len(orig)
        if len(words) == len(orig):          # swap: same multiset
            assert sorted(words) == sorted(orig)
        else:                                # deletion: subset
            assert all(w in orig for w in words)
        changed = changed or out != text
    assert changed
    # degenerate inputs pass through
    assert aug("mèo") == "mèo"
    assert aug("") == ""
    # deletion never empties
    only_del = TextAugmentation(1.0, enable_random_swap=False, seed=1)
    assert all(len(only_del.random_deletion(["a", "b"], p=1.0)) >= 1
               for _ in range(10))


def test_dropout_scheduler_schedules():
    """Warmup flat, linear endpoint, cosine midpoint, step() counter
    (reference augmentation.py:475-562)."""
    from vivqa_tpu.data import DropoutScheduler
    s = DropoutScheduler(0.1, 0.3, total_steps=100, warmup_steps=20,
                         schedule="linear")
    assert s.get_dropout(0) == 0.1 and s.get_dropout(19) == 0.1
    assert s.get_dropout(100) == pytest.approx(0.3)
    assert s.get_dropout(60) == pytest.approx(0.2)
    assert s.get_dropout(10_000) == pytest.approx(0.3)  # clamped
    c = DropoutScheduler(0.0, 0.4, total_steps=100, warmup_steps=0,
                         schedule="cosine")
    assert c.get_dropout(50) == pytest.approx(0.2)      # cos midpoint
    assert c.get_dropout(100) == pytest.approx(0.4)
    assert s.step() == s.get_dropout(1) and s.current_step == 1
    with pytest.raises(ValueError):
        DropoutScheduler(schedule="step")


def test_dropout_scheduler_apply_to_config():
    """apply_to_config rewrites every nested `dropout` field and nothing
    else; frozen configs stay frozen."""
    from vivqa_tpu.data import DropoutScheduler
    from vivqa_tpu.models.config import VQAModelConfig
    cfg = VQAModelConfig()
    new = DropoutScheduler.apply_to_config(cfg, 0.25)
    for sub in (new.visual, new.text, new.fusion, new.head):
        assert sub.dropout == 0.25
    assert new.text.hidden_dim == cfg.text.hidden_dim
    assert cfg.text.dropout == 0.1          # original untouched
    # idempotent / no-change fast path returns the same object
    assert DropoutScheduler.apply_to_config(new, 0.25) is new


def test_u8_wire_format(tmp_path):
    """normalize=False emits raw uint8 (4x less wire traffic); the
    device-side half reproduces the normalized float path bit-closely,
    and both the PIL and native batch paths agree on dtype/range."""
    import jax.numpy as jnp
    from PIL import Image
    from vivqa_tpu.data import normalize_pixels_on_device
    from vivqa_tpu.data.augmentation import CLIP_STD
    img = (np.random.RandomState(0).rand(40, 40, 3) * 255).astype(np.uint8)
    p = tmp_path / "a.jpg"
    Image.fromarray(img).save(p, quality=95)

    f32 = ImageAugmentation(image_size=32, mode="eval")
    u8 = ImageAugmentation(image_size=32, mode="eval", normalize=False)
    a = f32(str(p))
    b = u8(str(p))
    assert b.dtype == np.uint8 and b.shape == (32, 32, 3)
    assert b.nbytes * 4 == a.astype(np.float32).nbytes
    # device-side normalize of the u8 wire ~= the host-normalized path
    # (only quantization to the 1/255 grid separates them)
    bn = np.asarray(normalize_pixels_on_device(jnp.asarray(b)))
    assert np.abs(bn - a).max() < (1.0 / 255.0) / CLIP_STD.min() + 1e-5
    # float inputs pass through normalize_pixels_on_device unchanged
    assert np.array_equal(
        np.asarray(normalize_pixels_on_device(jnp.asarray(a))), a)
    # native batch path (when built): uint8 out, missing file -> black
    nb = u8.batch([str(p), str(tmp_path / "missing.jpg")])
    if nb is not None:
        assert nb.dtype == np.uint8
        assert nb.shape == (2, 32, 32, 3)
        assert nb[1].max() == 0                  # black placeholder
        # wire value agrees with the PIL u8 path within jpeg/resample tol
        assert np.abs(nb[0].astype(np.int16)
                      - b.astype(np.int16)).mean() < 8
