"""Native fast loader, memory guard, downloaders (offline behavior)."""

import numpy as np
import pytest

from vivqa_tpu.utils.memory_guard import (MemoryGuard,
                                          MemoryOverflowException)


def test_memory_guard_thresholds():
    g = MemoryGuard(warn_percent=0.0, kill_percent=200.0, check_every=1)
    pct = g.check()
    assert pct is not None and g._warned            # warns at 0%
    g2 = MemoryGuard(warn_percent=0.0, kill_percent=0.1, check_every=1)
    with pytest.raises(MemoryOverflowException):
        g2.check()


def test_memory_guard_sampling_interval():
    g = MemoryGuard(check_every=10)
    assert g.check() is None                         # call 1: skipped
    vals = [g.check() for _ in range(9)]
    assert sum(v is not None for v in vals) == 1     # only the 10th samples


def test_fastloader_roundtrip(tmp_path):
    fl = pytest.importorskip("vivqa_tpu.data.fastloader")
    if not fl.is_available():
        pytest.skip("native library not built")
    from PIL import Image
    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        arr = (rng.rand(50, 40, 3) * 255).astype(np.uint8)
        p = tmp_path / f"i{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    out, status = fl.batch_load(paths, 32)
    assert out.shape == (4, 32, 32, 3) and (status == 0).all()
    assert np.isfinite(out).all()
    # failure path: missing file -> zero placeholder + nonzero status
    out2, st2 = fl.batch_load([str(tmp_path / "nope.jpg")] + paths[:1], 16)
    assert st2[0] != 0 and st2[1] == 0
    assert float(np.abs(out2[0]).sum()) == 0.0
    # corrupt jpeg -> flagged
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg at all")
    _, st3 = fl.batch_load([str(bad)], 16)
    assert st3[0] != 0


def _write_jpegs(tmp_path, n=4, size=(50, 40), smooth=False):
    from PIL import Image
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        if smooth:
            # smooth gradients: bilinear and antialiased-bicubic resampling
            # agree on these (noise images alias differently per kernel)
            y = np.linspace(0, 1, size[0])[:, None, None]
            x = np.linspace(0, 1, size[1])[None, :, None]
            c = np.linspace(0.2, 0.8, 3)[None, None, :]
            arr = ((0.3 * y + 0.4 * x + 0.3 * c + 0.05 * i) * 255
                   ).astype(np.uint8)
        else:
            arr = (rng.rand(*size, 3) * 255).astype(np.uint8)
        p = tmp_path / f"t{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_fastloader_train_deterministic_and_augmenting(tmp_path):
    fl = pytest.importorskip("vivqa_tpu.data.fastloader")
    if not fl.is_available():
        pytest.skip("native library not built")
    paths = _write_jpegs(tmp_path)
    preset = dict(flip_p=0.5, jitter=0.2, gray_p=0.5, rot_deg=10,
                  trans=0.05, erase_p=0.5)
    a, st = fl.batch_load_train(paths, 32, preset, seed=7)
    b, _ = fl.batch_load_train(paths, 32, preset, seed=7)
    c, _ = fl.batch_load_train(paths, 32, preset, seed=8)
    assert a.shape == (4, 32, 32, 3) and (st == 0).all()
    assert np.array_equal(a, b)                  # same seed -> identical
    assert not np.array_equal(a, c)              # different seed -> differs
    # augmentation actually perturbs relative to the eval path
    ev, _ = fl.batch_load(paths, 32)
    assert float(np.abs(a - ev).max()) > 0.05
    # zero-strength preset = eval path up to the resampling kernel
    zero = dict(flip_p=0.0, jitter=0.0, gray_p=0.0, rot_deg=0.0,
                trans=0.0, erase_p=0.0)
    z, _ = fl.batch_load_train(paths, 32, zero, seed=3)
    assert float(np.abs(z - ev).max()) < 0.15    # same bilinear grid


def test_fastloader_train_grayscale_semantics(tmp_path):
    fl = pytest.importorskip("vivqa_tpu.data.fastloader")
    if not fl.is_available():
        pytest.skip("native library not built")
    from vivqa_tpu.data.augmentation import CLIP_MEAN, CLIP_STD
    paths = _write_jpegs(tmp_path, n=2)
    gray = dict(flip_p=0.0, jitter=0.0, gray_p=1.0, rot_deg=0.0,
                trans=0.0, erase_p=0.0)
    out, _ = fl.batch_load_train(paths, 16, gray, seed=1)
    # un-normalize: all three channels must be equal after grayscale
    rgb = out * CLIP_STD + CLIP_MEAN
    assert float(np.abs(rgb[..., 0] - rgb[..., 1]).max()) < 1e-5
    assert float(np.abs(rgb[..., 1] - rgb[..., 2]).max()) < 1e-5


def test_dataset_native_batch_path(tmp_path):
    """VQADataset.load_batch (native) must agree with the per-item PIL
    path on metadata and produce valid pixels; the BatchLoader must pick
    it up transparently."""
    fl = pytest.importorskip("vivqa_tpu.data.fastloader")
    if not fl.is_available():
        pytest.skip("native library not built")
    from vivqa_tpu.data import (BatchLoader, ImageAugmentation,
                                WhitespaceTokenizer, vqa_collate)
    from vivqa_tpu.data.dataset import VQADataset
    from vivqa_tpu.data.schema import OneSample
    paths = _write_jpegs(tmp_path, n=6, smooth=True)
    samples = [OneSample(image_path=p, question=f"câu hỏi {i}",
                         answers=["đáp án"]) for i, p in enumerate(paths)]
    tok = WhitespaceTokenizer(max_length=8)
    tok.build_vocab([s.question for s in samples])
    ds = VQADataset(samples, tok, {"<unk>": 0, "đáp án": 1},
                    ImageAugmentation(16, mode="eval"),
                    max_question_length=8)
    native = ds.load_batch([0, 1, 2])
    assert native is not None
    assert native["pixel_values"].shape == (3, 16, 16, 3)
    ref = vqa_collate([ds[i] for i in range(3)])
    np.testing.assert_array_equal(native["input_ids"], ref["input_ids"])
    np.testing.assert_array_equal(native["labels"], ref["labels"])
    # eval-mode native pixels match PIL within resampling tolerance
    assert float(np.abs(native["pixel_values"]
                        - ref["pixel_values"]).mean()) < 0.1
    loader = BatchLoader(ds, batch_size=4, collate=vqa_collate,
                         shuffle=False, drop_last=False)
    batches = list(loader)
    assert batches[0]["pixel_values"].shape == (4, 16, 16, 3)
    assert batches[-1]["_num_valid"] == 2


def test_downloaders_offline_errors():
    from vivqa_tpu.data.downloaders import (DownloadUnavailableError,
                                            download_hf_model)
    with pytest.raises(DownloadUnavailableError):
        download_hf_model("definitely/not-a-cached-model-xyz")


def test_coco_downloader_handles_failures(tmp_path, monkeypatch):
    from vivqa_tpu.data import downloaders

    def fail(url, dest):
        raise OSError("no network")
    monkeypatch.setattr(downloaders.urllib.request, "urlretrieve", fail)
    out = downloaders.download_coco_images([123], tmp_path, retries=1,
                                           delay=0.0)
    assert out["failed"] == [123] and out["ok"] == []


def test_show_sample_and_batch(tmp_path):
    """Headless sample visualization writes PNGs (reference
    dataset_visualization.py show_sample)."""
    import numpy as np
    from vivqa_tpu.utils import show_batch, show_sample

    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    out = show_sample(img, "màu gì?", "đỏ", save_path=tmp_path / "s.png")
    assert out.exists() and out.stat().st_size > 0
    # float images and answer lists render too
    out2 = show_batch([img / 255.0, img], ["q1", "q2"],
                      [["a", "b"], "c"], tmp_path / "g.png", ncols=2)
    assert out2.exists() and out2.stat().st_size > 0
