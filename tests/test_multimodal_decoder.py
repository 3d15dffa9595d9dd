"""Import-gated real decoder for multimodal features: Pillow when available,
deterministic stub otherwise, per-row fallback on corrupt payloads."""

from __future__ import annotations

import contextlib
import sys
import types

import pytest

from s3bigdatasync_spark.operators import multimodal


def test_gate_falls_back_without_pillow(monkeypatch):
    """No Pillow (this container) → make_decoder returns the stub itself."""
    monkeypatch.setitem(sys.modules, "PIL", None)  # force ImportError
    assert multimodal.make_decoder() is multimodal.decode_stub


def _fake_pil(width: int, height: int, fail: bool = False):
    """Minimal PIL.Image stand-in: Image.open returns a context manager."""
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    class _Img:
        def __init__(self):
            self.width, self.height = width, height

    @contextlib.contextmanager
    def _open(_buf):
        if fail:
            raise OSError("cannot identify image file")
        yield _Img()

    image_mod.open = _open
    pil.Image = image_mod
    return pil, image_mod


def test_real_decoder_path(monkeypatch):
    pil, image_mod = _fake_pil(640, 480)
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    decode = multimodal.make_decoder()
    assert decode is not multimodal.decode_stub
    assert decode(b"fake-png-bytes", "image") == (640, 480, 1)
    # non-image media still routes to the stub
    assert decode(b"payload", "audio") == multimodal.decode_stub(b"payload", "audio")


def test_real_decoder_per_row_fallback(monkeypatch):
    """A corrupt payload degrades to the stub for that row, not a task error."""
    pil, image_mod = _fake_pil(0, 0, fail=True)
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    decode = multimodal.make_decoder()
    payload = b"corrupt"
    assert decode(payload, "image") == multimodal.decode_stub(payload, "image")


@pytest.mark.usefixtures("spark")
def test_production_matches_stub_in_this_container(spark, sf_dir):
    """End-to-end: without Pillow the production kernel reproduces the stub
    query exactly (same rows, same features)."""
    a = sorted(map(tuple, multimodal.media_features(spark, sf_dir).collect()))
    b = sorted(map(tuple, multimodal.media_features_production(spark, sf_dir).collect()))
    assert a == b
