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
